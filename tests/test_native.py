"""Native greedy changepoint selection vs the numpy oracle."""
import numpy as np

from tombo_tpu import native
from tombo_tpu.ops import ref_impl as ri


def test_native_matches_oracle_capped():
    rng = np.random.default_rng(7)
    B = 8
    lens = rng.integers(500, 3000, B)
    C = int(lens.max())
    scores = np.full((B, C), -1.0)
    n_cands = np.zeros(B, dtype=np.int64)
    num_cpts = np.zeros(B, dtype=np.int64)
    for b in range(B):
        n = int(lens[b])
        scores[b, :n] = rng.random(n) * 100
        n_cands[b] = n
        num_cpts[b] = n // 12

    out, status = native.greedy_cpts_batch(
        scores, n_cands, num_cpts, shift=5, min_base_obs=3)
    assert np.all(status == 0)
    for b in range(B):
        oracle = np.sort(ri.greedy_select_cpts(
            scores[b, :n_cands[b]], 3, int(num_cpts[b]))) + 5
        np.testing.assert_array_equal(out[b, :num_cpts[b]], oracle)


def test_native_status_on_too_few():
    scores = np.array([[5.0, 4.0, 3.0, 2.0, 1.0]])
    out, status = native.greedy_cpts_batch(
        scores, np.array([5]), np.array([4]), shift=0, min_base_obs=3)
    assert status[0] == 1


def test_full_valid_cpts_w_cap_pipeline():
    """ref_impl.valid_cpts_w_cap == device scores + native greedy."""
    from tombo_tpu.ops import segment as seg
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    sig = np.repeat(rng.normal(0, 1, 300), rng.integers(3, 9, 300)).astype(
        np.float64)
    sig += rng.normal(0, 0.1, sig.shape[0])
    w, min_obs, num_cpts = 5, 3, sig.shape[0] // 7

    oracle = ri.valid_cpts_w_cap(sig, min_obs, w, num_cpts)

    d_scores = np.asarray(seg.cpt_scores_diff_batch(
        jnp.asarray(sig[None]), jnp.asarray(np.array([sig.shape[0]])), w))
    out, status = native.greedy_cpts_batch(
        d_scores, np.array([sig.shape[0] - 2 * w]), np.array([num_cpts]),
        shift=w, min_base_obs=min_obs)
    assert status[0] == 0
    np.testing.assert_array_equal(out[0], oracle)


def test_theil_sen_batch_parity():
    """Native batched Theil-Sen == numpy oracle (median slope/intercept)."""
    rng = np.random.default_rng(17)
    B, max_n = 5, 200
    ev = np.zeros((B, max_n))
    mod = np.zeros((B, max_n))
    n_pts = rng.integers(10, max_n + 1, B)
    for b in range(B):
        n = n_pts[b]
        ev[b, :n] = rng.normal(0, 1, n)
        mod[b, :n] = 0.8 * ev[b, :n] + 0.1 + rng.normal(0, 0.2, n)
        if n > 4:  # force equal-event-mean pairs -> max_slope branch
            ev[b, 2] = ev[b, 1]
    slopes, inters = native.theil_sen_batch(ev, mod, n_pts)
    for b in range(B):
        n = n_pts[b]
        sl = float(np.median(ri.compute_slopes(ev[b, :n], mod[b, :n])))
        inter = float(np.median(mod[b, :n] - sl * ev[b, :n]))
        assert abs(slopes[b] - sl) < 1e-12
        assert abs(inters[b] - inter) < 1e-12


def test_raw_windows_dp_batch_parity():
    """Native deletion-window DP == numpy oracle path."""
    rng = np.random.default_rng(23)
    windows = []
    oracle = []
    min_obs, mhz = 4, 20.0
    for w in range(12):
        n_ev = int(rng.integers(3, 12))
        sig_len = int(rng.integers(n_ev * (min_obs + 2) + 5, n_ev * 15))
        sig = rng.normal(0, 1, sig_len)
        means = rng.normal(0, 1, n_ev)
        sds = np.abs(rng.normal(1, 0.1, n_ev))
        ps = np.linspace(0, sig_len, n_ev + 1).astype(np.int64)
        windows.append((sig, means, sds, ps))
        reg_zs = ri.reg_z_scores(sig, means, sds, ps, 0, n_ev, n_ev,
                                 min_obs, max_half_z_score=mhz)
        reg_fwd = ri.raw_forward_pass(reg_zs, min_obs)
        oracle.append(ri.raw_traceback(reg_fwd, min_obs))
    out = native.raw_windows_dp_batch(windows, min_obs, mhz)
    assert out is not None, "native library missing"
    segs_list, status = out
    assert (status == 0).all()
    for w in range(12):
        np.testing.assert_array_equal(segs_list[w], oracle[w], str(w))


def test_static_base_assignment_parity():
    """Native static-band DP is bit-identical to the numpy oracle path
    (z construction + banded_forward_pass + banded_traceback)."""
    from tombo_tpu import config

    rng = np.random.default_rng(23)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    for seq_len, events_len in [(40, 120), (150, 420), (220, 300),
                                (333, 901)]:
        ev = rng.normal(0, 1, events_len)
        rm = rng.normal(0, 1, seq_len)
        rs = rng.uniform(0.2, 0.6, seq_len)

        # numpy oracle path (copied shape of find_static_base_assignment)
        mask_len = min(seq_len, events_len) // 4
        starts = np.concatenate([
            np.zeros(seq_len - mask_len * 2),
            np.linspace(0, mask_len, mask_len * 2)]).astype(np.int64)
        bw = events_len - mask_len
        sz = np.empty((seq_len, bw))
        for row, start in enumerate(starts):
            z = np.abs((ev[start:start + bw] - rm[row]) / rs[row])
            if params.max_half_z_score is not None:
                z = np.minimum(z, params.max_half_z_score)
            sz[row] = params.z_shift - z
        fwd, tb = ri.banded_forward_pass(
            sz, starts, params.skip_pen, params.stay_pen)
        want = ri.banded_traceback(tb, starts, int(np.argmax(fwd[-1])))

        got = native.static_base_assignment(
            ev, rm, rs, params.z_shift, params.skip_pen, params.stay_pen,
            params.max_half_z_score)
        assert got is not None
        np.testing.assert_array_equal(got, want)


def test_theil_sen_fast_selection_matches_exact():
    """The O(n log n) slope-selection variant must reproduce the exact
    O(n^2) pair-enumeration median, including tie-heavy and duplicate
    event-mean inputs (csrc ts_fast)."""
    rng = np.random.default_rng(3)
    for trial in range(6):
        B, N = 8, int(rng.integers(80, 700))
        ev = rng.normal(0, 1, (B, N))
        mod = ev * rng.uniform(0.5, 2) + rng.normal(0, 0.5, (B, N))
        if trial % 2:
            ev = np.round(ev, 2)
            mod = np.round(mod, 2)
        if trial % 3 == 2:
            ev[:, ::5] = ev[:, 0:1]
        n_pts = rng.integers(64, N + 1, B).astype(np.int64)
        s1, i1 = native.theil_sen_batch(ev, mod, n_pts)
        s2, i2 = native.theil_sen_batch(ev, mod, n_pts, use_fast=True)
        np.testing.assert_allclose(s2, s1, rtol=0, atol=1e-12)
        np.testing.assert_allclose(i2, i1, rtol=0, atol=1e-12)
