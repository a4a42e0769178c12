"""Device Theil-Sen (bitwise selection) vs host numpy/native oracle."""
import numpy as np
import jax.numpy as jnp

from tombo_tpu import native
from tombo_tpu.ops import rescale


def _host_ts(ev, mod, max_slope=1000.0):
    n = ev.shape[0]
    i, j = np.triu_indices(n, 1)
    de = ev[i] - ev[j]
    dm = mod[i] - mod[j]
    slopes = np.where(de == 0, max_slope, dm / np.where(de == 0, 1, de))
    slope = np.median(slopes)
    inter = np.median(mod - slope * ev)
    return slope, inter


def test_key_roundtrip_order():
    rng = np.random.default_rng(0)
    for dtype in (np.float32, np.float64):
        x = np.concatenate([
            rng.normal(0, 1e3, 300), [0.0, -0.0, np.inf, -np.inf],
            rng.normal(0, 1e-30, 50)]).astype(dtype)
        k = np.asarray(rescale._float_to_key(jnp.asarray(x)))
        back = np.asarray(rescale._key_to_float(
            jnp.asarray(k), jnp.dtype(dtype)))
        # exact bit round-trip
        assert (back.view(k.dtype) == x.view(k.dtype)).all()
        # key order == float order (keys of float-sorted values ascend;
        # -0.0 < +0.0 in key space, which is fine for selection)
        xs = x[np.argsort(k)]
        assert (np.diff(xs) >= 0).all()


def test_pairwise_median_matches_host():
    rng = np.random.default_rng(5)
    B, N = 4, 120
    ev = rng.normal(0, 1, (B, N))
    mod = 0.8 * ev + 0.1 + rng.normal(0, 0.3, (B, N))
    ev[1, 5] = ev[1, 6]  # equal event means -> max_slope pair
    n_pts = np.array([N, N, 77, 10])
    for dtype in (np.float64, np.float32):
        e = jnp.asarray(ev.astype(dtype))
        m = jnp.asarray(mod.astype(dtype))
        slope, inter = rescale.theil_sen_device(
            e, m, jnp.asarray(n_pts), max_slope=1000.0)
        for b in range(B):
            n = n_pts[b]
            s_ref, i_ref = _host_ts(ev[b, :n].astype(dtype),
                                    mod[b, :n].astype(dtype))
            tol = 1e-12 if dtype == np.float64 else 1e-5
            assert abs(float(slope[b]) - s_ref) <= tol * max(
                1, abs(s_ref)), (dtype, b)
            assert abs(float(inter[b]) - i_ref) <= tol * max(
                1, abs(i_ref)), (dtype, b)


def test_matches_native_batch():
    rng = np.random.default_rng(9)
    B, N = 3, 400
    ev = rng.normal(0, 1, (B, N))
    mod = 1.1 * ev - 0.2 + rng.normal(0, 0.2, (B, N))
    n_pts = np.full(B, N, np.int64)
    s_host, i_host = native.theil_sen_batch(ev, mod, n_pts)
    s_dev, i_dev = rescale.theil_sen_device(
        jnp.asarray(ev), jnp.asarray(mod), jnp.asarray(n_pts))
    np.testing.assert_allclose(np.asarray(s_dev), s_host, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(i_dev), i_host, rtol=1e-12)


def test_pallas_slope_median_matches_xla():
    """Pallas streaming-count selection == XLA selection == host median
    (interpret mode; f32)."""
    import jax.numpy as jnp

    from tombo_tpu.ops import rescale

    rng = np.random.default_rng(21)
    B, N = 5, 64
    ev = rng.normal(0, 1, (B, N)).astype(np.float32)
    mod = (ev * 1.1 + 0.2 + rng.normal(0, 0.2, (B, N))).astype(np.float32)
    # include duplicate event means (max_slope pairs) and short reads
    ev[0, 3] = ev[0, 7]
    n_pts = np.array([N, N - 1, 5, 2, N], np.int32)
    s_pal = np.asarray(rescale.pairwise_slope_median_pallas(
        jnp.asarray(ev), jnp.asarray(mod), jnp.asarray(n_pts),
        1000.0, interpret=True))
    s_xla = np.asarray(rescale.pairwise_slope_median(
        jnp.asarray(ev), jnp.asarray(mod), jnp.asarray(n_pts), 1000.0))
    np.testing.assert_array_equal(s_pal, s_xla)
    for b in range(B):
        s, _ = _host_ts(ev[b, :n_pts[b]].astype(np.float64),
                        mod[b, :n_pts[b]].astype(np.float64))
        assert abs(float(s_pal[b]) - s) < 5e-6 * max(abs(s), 1e-3)
