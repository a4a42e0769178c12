"""Production batched lane over a device mesh: results must be
numerically identical to the 1-device run (the TPU-mesh analog of the
reference's guarantee that results are independent of process count,
reference: tombo/docs/modified_base_detection.rst:151-153)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tombo_tpu import config
from tombo_tpu.parallel import mesh as pmesh
from tombo_tpu.pipeline.batch import BatchedResquiggler

from test_batch_parity import _prep_reads


@pytest.fixture(scope="module")
def dna_reads():
    return _prep_reads(12, config.DNA_SAMP_TYPE, seed=31, read_len=650)


def _run(map_results, model, params, sst, mesh):
    br = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                            dtype=jnp.float64, mesh=mesh)
    return br.resquiggle_batch(map_results)


def test_mesh_matches_single_device(dna_reads):
    model, params, sst, map_results, _ = dna_reads
    mesh = pmesh.make_mesh(jax.devices()[:8])
    out_m = _run(map_results, model, params, sst, mesh)
    out_1 = _run(map_results, model, params, sst, None)
    for i, ((rm, em), (r1, e1)) in enumerate(zip(out_m, out_1)):
        assert em is None and e1 is None, (i, em, e1)
        assert np.array_equal(rm.segs, r1.segs), i
        assert rm.read_start_rel_to_raw == r1.read_start_rel_to_raw, i
        assert rm.scale_values.shift == r1.scale_values.shift, i
        assert rm.scale_values.scale == r1.scale_values.scale, i
        assert rm.sig_match_score == r1.sig_match_score, i


def test_mesh_sizes_shard_evenly(dna_reads):
    """2- and 4-device meshes produce the same results too (shard count
    must not leak into numerics)."""
    model, params, sst, map_results, _ = dna_reads
    out_1 = _run(map_results[:5], model, params, sst, None)
    for n in (2, 4):
        mesh = pmesh.make_mesh(jax.devices()[:n])
        out_m = _run(map_results[:5], model, params, sst, mesh)
        for i, ((rm, em), (r1, e1)) in enumerate(zip(out_m, out_1)):
            assert em is None and e1 is None
            assert np.array_equal(rm.segs, r1.segs), (n, i)
            assert rm.scale_values.scale == r1.scale_values.scale, (n, i)


def test_production_lane_dryrun_runs():
    mesh = pmesh.make_mesh(jax.devices()[:8])
    pmesh.production_lane_dryrun(mesh, n_reads=8)


def test_sharded_pallas_dp_interpret(dna_reads):
    """The shard_map-wrapped Pallas DP (interpret mode on CPU) agrees
    with the scan engine on a tiny sharded problem."""
    from tombo_tpu.ops import dp as dpo
    from tombo_tpu.ops import pallas_dp as pdp

    B, bw, L, P = 8, 16, 64, 4
    E = L * 4
    rng = np.random.default_rng(3)
    em = rng.normal(0, 1, (B, E)).astype(np.float32)
    nev = np.full(B, E, np.int32)
    rm = rng.normal(0, 1, (B, L)).astype(np.float32)
    rs = np.full((B, L), 0.35, np.float32)
    sl = np.full(B, L, np.int32)
    ps = np.tile(np.arange(P, dtype=np.int32) * 2, (B, 1))
    pv = np.zeros(B, np.int32)
    pe = np.full((B, P), 2 ** 31 - 1, np.int64)
    sr = np.full(B, P, np.int32)
    params = dpo.DpParams(
        z_shift=5.0, skip_pen=4.2, stay_pen=4.2, mask_fill_z_score=-15.0,
        max_half_z_score=20.0, bandwidth=bw)
    dp_args = (em, nev, rm, rs, sl, ps, pv, pe, sr)

    mesh = pmesh.make_mesh(jax.devices()[:2])
    segs_sh, band_err, bound_err, _ = pdp.adaptive_banded_dp_tb_sharded(
        mesh, "reads", dp_args, params, L, P, -1, ("fused", 4),
        interpret=True)

    tb, band_starts, final_fwd, _ = dpo.adaptive_banded_dp(
        *dp_args, params, L, P)
    top = jnp.argmax(final_fwd, axis=1).astype(jnp.int32)
    segs_ref, _ = dpo.banded_traceback(
        tb, band_starts, jnp.asarray(sl), top, -1, bw, L)
    assert np.array_equal(np.asarray(segs_sh), np.asarray(segs_ref))
    assert not np.any(np.asarray(band_err))


def test_dev_fit_under_mesh_matches_host_fit(dna_reads, monkeypatch):
    """The fused device rescale fit composes with the mesh (round-4
    task 6: the round-3 flagship silently fell back to the host
    Theil-Sen lane under a mesh).  Forced-on device fit over a 4-device
    mesh must match the host-fit f32 lane within fit tolerance."""
    model, params, sst, map_results, _ = dna_reads
    mesh = pmesh.make_mesh(jax.devices()[:4])

    def run(fit_flag, use_mesh):
        monkeypatch.setenv("TOMBO_TPU_DEV_FIT", fit_flag)
        br = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                                dtype=jnp.float32,
                                mesh=mesh if use_mesh else None)
        return br.resquiggle_batch(map_results[:6])

    out_dev = run("1", True)
    out_host = run("0", False)
    n_ok = 0
    for i, ((rd, ed), (rh, eh)) in enumerate(zip(out_dev, out_host)):
        assert (ed is None) == (eh is None), (i, ed, eh)
        if ed is not None:
            continue
        # device fit applies only to reads without deletion windows; all
        # reads must still complete with near-identical scales
        np.testing.assert_allclose(
            rd.scale_values.scale, rh.scale_values.scale, rtol=5e-3)
        np.testing.assert_allclose(
            rd.scale_values.shift, rh.scale_values.shift, atol=5e-3)
        n_ok += 1
    assert n_ok >= 5
