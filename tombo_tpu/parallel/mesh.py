"""Multi-chip sharding of the re-squiggle compute path.

The workload is read-level data parallel (the reference's process pool,
SURVEY.md §2.3, re-expressed as a device mesh): padded read batches shard on
the batch axis over a 1-D ``reads`` mesh; the k-mer model tables replicate;
per-reference-site statistic accumulators merge with ``psum`` over the mesh
(the collective rides ICI within a slice).

``full_sharded_step`` stitches the device stages into a single jittable
function used by the driver's multi-chip dry-run and by multi-chip
benchmarks; per-stage entry points remain available for the production
pipeline (which interleaves host work between stages).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import dp as dpo
from ..ops import normalize as nrm
from ..ops import segment as seg

READS_AXIS = "reads"


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (READS_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(READS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with the batch axis sharded over the reads mesh."""
    sh = batch_sharding(mesh)
    return tuple(jax.device_put(a, sh) for a in arrays)


def full_sharded_step(mesh: Mesh, dp_params: dpo.DpParams,
                      outlier_thresh: float, running_stat_width: int,
                      n_rows: int, prefix_rows: int):
    """One full device pass over a sharded read batch: normalization,
    changepoint scores, event means (from given segment boundaries),
    adaptive banded DP, traceback, and a psum'd per-batch coverage/stat
    accumulator as the collective merge exemplar.

    Returns a jitted function(raw, sig_lens, segs, n_segs, ref_means,
    ref_sds, seq_lens, prefix_starts, prefix_valid, prefix_end, start_rows,
    site_bins) -> (scores, segs_tb, site_cov).
    """
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)

    def step(raw, sig_lens, segs, n_segs, ref_means, ref_sds, seq_lens,
             prefix_starts, prefix_valid, prefix_end, start_rows, site_bins):
        norm, shift, scale, lower, upper = nrm.normalize_median_batch(
            raw, sig_lens, outlier_thresh)
        scores = seg.cpt_scores_diff_batch(norm, sig_lens,
                                           running_stat_width)
        event_means = nrm.compute_base_means_batch(norm, segs, n_segs)
        tb, band_starts, final_fwd, band_err = dpo.adaptive_banded_dp(
            event_means, n_segs, ref_means, ref_sds, seq_lens,
            prefix_starts, prefix_valid, prefix_end, start_rows,
            dp_params, n_rows, prefix_rows)
        top = jnp.argmax(final_fwd, axis=1).astype(jnp.int32)
        segs_tb, bound_err = dpo.banded_traceback(
            tb, band_starts, seq_lens, top, -1, dp_params.bandwidth, n_rows)
        # per-site accumulator merge: coverage histogram over genome bins,
        # summed across the mesh (ICI psum via jnp.sum on a sharded axis is
        # inserted by the partitioner; make it explicit for determinism)
        n_bins = site_bins.shape[1]
        site_cov = jnp.sum(site_bins, axis=0)
        return scores, segs_tb, site_cov

    in_shardings = (bsh, bsh, bsh, bsh, bsh, bsh, bsh, bsh, bsh, bsh, bsh,
                    bsh)
    out_shardings = (bsh, bsh, rep)
    return jax.jit(step, in_shardings=in_shardings,
                   out_shardings=out_shardings)


def sharded_production_step(mesh: Mesh, n_reads_per_device: int = 2,
                            sig_len: int = 1024, n_rows: int = 64,
                            bandwidth: int = 32) -> None:
    """Run the PRODUCTION device stages (the same jitted functions the
    batched lane uses: fused stage-A normalize/select/event-means/start-DP
    and the adaptive DP + traceback) over a batch sharded on the reads
    axis of ``mesh``.  XLA propagates the batch sharding through every
    stage; all ops are read-parallel so no resharding collectives are
    required, and the per-site coverage accumulator reduces across the
    mesh."""
    from ..pipeline import batch as pb

    n_dev = len(mesh.devices.ravel())
    B = n_dev * n_reads_per_device
    rng = np.random.default_rng(0)
    bsh = batch_sharding(mesh)

    raw = rng.normal(450.0, 60.0, (B, sig_len)).astype(np.float32)
    sig_lens = np.full(B, sig_len, np.int64)
    num_cpts = np.full(B, n_rows * 4, np.int64)
    nb, ne = 8, bandwidth
    rm_start = rng.normal(0, 1, (B, nb)).astype(np.float32)
    rs_start = np.full((B, nb), 0.35, np.float32)
    sp = dpo.StartDpParams(
        z_shift=5.0, skip_pen=4.2, stay_pen=4.2, max_half_z_score=20.0,
        num_bases=nb, num_events=ne)
    args = shard_batch(
        mesh, raw, sig_lens, np.zeros(B, bool), np.zeros(B, np.float32),
        np.ones(B, np.float32), np.full(B, -1e30, np.float32),
        np.full(B, 1e30, np.float32), num_cpts, rm_start, rs_start)
    out = pb._stage_a_dna(*args, 5.0, 5, 3, n_rows * 4 + 1, sp, False)
    (norm, em, cpts, status, shift, scale, lower, upper,
     start_segs, start_score) = jax.block_until_ready(out)
    assert em.shape[0] == B

    # adaptive DP + traceback over the sharded event means
    E = em.shape[1]
    L, P = n_rows, 8
    dp_params = dpo.DpParams(
        z_shift=5.0, skip_pen=4.2, stay_pen=4.2, mask_fill_z_score=-15.0,
        max_half_z_score=20.0, bandwidth=bandwidth)
    rm = rng.normal(0, 1, (B, L)).astype(np.float32)
    rs = np.full((B, L), 0.35, np.float32)
    dp_args = shard_batch(
        mesh, np.asarray(em), np.full(B, E, np.int32), rm, rs,
        np.full(B, L, np.int32),
        np.tile(np.arange(P, dtype=np.int32) * 2, (B, 1)),
        np.zeros(B, np.int32), np.full((B, P), 2 ** 31 - 1, np.int64),
        np.full(B, P, np.int32))
    tb, band_starts, final_fwd, band_err = jax.block_until_ready(
        dpo.adaptive_banded_dp(*dp_args, dp_params, L, P))
    top = jnp.argmax(final_fwd, axis=1).astype(jnp.int32)
    segs, bound_err = jax.block_until_ready(dpo.banded_traceback(
        tb, band_starts, dp_args[4], top, -1, bandwidth, L))
    assert segs.shape == (B, L + 1)

    # per-site accumulator merge across the mesh (coverage psum exemplar)
    cov = jax.jit(
        lambda s: jnp.sum(jax.nn.one_hot(jnp.clip(s, 0, E), E + 1), (0, 1)),
        out_shardings=replicated(mesh))(segs)
    assert jax.block_until_ready(cov).shape == (E + 1,)


def production_lane_dryrun(mesh: Mesh, n_reads: int = 0,
                           read_len: int = 650) -> None:
    """Run THE production batched resquiggle lane
    (pipeline.batch.BatchedResquiggler.resquiggle_batch) over a mesh:
    simulated DNA reads, batch sharded on the reads axis, full stage
    pipeline (fused stage A -> start discovery -> adaptive DP under
    shard_map on TPU / partitioned scan elsewhere -> host finalize).
    Asserts every read resquiggles and that results match a 1-device run
    read-for-read."""
    import jax.numpy as jnp
    from .. import config
    from ..io.model_io import KmerModel
    from ..pipeline import resquiggle as rsq
    from ..pipeline.aligner import ExactAligner
    from ..pipeline.batch import BatchedResquiggler
    from ..testing import random_reference, simulate_read
    from ..types import SeqSampleType, SequenceData

    n_dev = int(np.prod(mesh.devices.shape))
    n_reads = n_reads or 2 * n_dev
    rng = np.random.default_rng(11)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    fasta = random_reference(np.random.default_rng(12), 30000)
    aligner = ExactAligner(fasta)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    map_results = []
    for i in range(n_reads):
        read = simulate_read(rng, fasta, model, read_id="dry_%03d" % i,
                             read_len=read_len)
        mr = rsq.map_read(SequenceData(read.seq, read.read_id, 12.0),
                          aligner, model, sst)
        mr = rsq.adjust_map_res(
            mr.replace(raw_signal=read.raw_signal), sst, params)
        map_results.append(mr)

    br = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                            dtype=jnp.float64, mesh=mesh)
    out = br.resquiggle_batch(map_results)
    assert len(out) == n_reads
    for i, (res, err) in enumerate(out):
        assert err is None, (i, err)
        assert res.segs.shape[0] == len(res.genome_seq) + 1

    br1 = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                             dtype=jnp.float64)
    out1 = br1.resquiggle_batch(map_results)
    for i, ((res_m, _), (res_1, _)) in enumerate(zip(out, out1)):
        assert np.array_equal(res_m.segs, res_1.segs), i
        assert res_m.scale_values.shift == res_1.scale_values.shift, i


def dryrun(n_devices: int, bandwidth: int = 16, n_rows: int = 32,
           prefix_rows: int = 4, sig_len: int = 256) -> None:
    """Compile and execute one full sharded step on tiny shapes across an
    ``n_devices`` mesh (driver contract: __graft_entry__.dryrun_multichip),
    then the production stage functions over the same mesh."""
    devices = jax.devices()
    assert len(devices) >= n_devices, (
        "need %d devices, have %d" % (n_devices, len(devices)))
    mesh = make_mesh(devices[:n_devices])

    B = max(2 * n_devices, n_devices)  # at least 2 reads per device
    rng = np.random.default_rng(0)
    E = n_rows * 4
    raw = rng.normal(450.0, 60.0, (B, sig_len)).astype(np.float32)
    sig_lens = np.full(B, sig_len, np.int32)
    # evenly spaced segment boundaries (E segments)
    segs = np.tile(np.linspace(0, sig_len, E + 1).astype(np.int32), (B, 1))
    n_segs = np.full(B, E, np.int32)
    ref_means = rng.normal(0, 1, (B, n_rows)).astype(np.float32)
    ref_sds = np.full((B, n_rows), 0.35, np.float32)
    seq_lens = np.full(B, n_rows, np.int32)
    prefix_starts = np.tile(
        np.arange(prefix_rows, dtype=np.int32) * 2, (B, 1))
    prefix_valid = np.zeros(B, np.int32)
    prefix_end = np.full((B, prefix_rows), 2 ** 31 - 1, np.int64)
    start_rows = np.full(B, prefix_rows, np.int32)
    site_bins = rng.integers(0, 3, (B, 64)).astype(np.int32)

    dp_params = dpo.DpParams(
        z_shift=5.0, skip_pen=4.2, stay_pen=4.2, mask_fill_z_score=-15.0,
        max_half_z_score=20.0, bandwidth=bandwidth)

    step = full_sharded_step(mesh, dp_params, 5.0, 5, n_rows, prefix_rows)
    args = shard_batch(mesh, raw, sig_lens, segs, n_segs, ref_means,
                       ref_sds, seq_lens, prefix_starts, prefix_valid,
                       prefix_end, start_rows, site_bins)
    scores, segs_tb, site_cov = step(*args)
    jax.block_until_ready((scores, segs_tb, site_cov))
    assert segs_tb.shape == (B, n_rows + 1)
    assert site_cov.shape == (64,)

    sharded_production_step(mesh)
    production_lane_dryrun(mesh)

    # production cross-host merge program (device collective; SURVEY
    # §5.8): same jitted reduction psum_hosts runs multi-process
    from .distributed import psum_collective_dryrun
    psum_collective_dryrun(devices[:n_devices])
