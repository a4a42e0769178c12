"""Multi-host detection: per-site statistics must be identical regardless
of host count (the cross-host form of the reference's process-count
invariance, reference: docs/modified_base_detection.rst:151-153).

The integration test runs a REAL 2-process ``jax.distributed`` CPU
cluster (two subprocesses joining a localhost coordinator), sharding
reads by hash for the de-novo (per-read) method and regions for the KS
(level) method, and compares the merged stats files bit-for-bit against
a single-host run.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tombo_tpu import config
from tombo_tpu.io.index import ReadsIndex
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.parallel.distributed import (DistContext, psum_hosts,
                                            read_key, read_shard)
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
from tombo_tpu.stats import LevelStats, ModelStats
from tombo_tpu.stats import detect as dt
from tombo_tpu.stats.files import DE_NOVO_TXT, KS_TEST_TXT
from tombo_tpu.testing import make_synthetic_dataset
from tombo_tpu.types import ReadData, SeqSampleType


def test_read_shard_stable_and_balanced():
    assert read_shard("read-abc", 4) == read_shard("read-abc", 4)
    assert read_shard("anything", 1) == 0
    shards = [read_shard("r%d" % i, 4) for i in range(200)]
    counts = np.bincount(shards, minlength=4)
    assert (counts > 20).all()


def test_read_key_fallback():
    rd = ReadData(start=17, end=40, filtered=False, read_start_rel_to_raw=0,
                  strand="+", fn="a.fast5", corr_group="g", rna=False)
    assert read_key(rd) == "a.fast5:17"
    rd2 = ReadData(start=17, end=40, filtered=False, read_start_rel_to_raw=0,
                   strand="+", fn="a.fast5", corr_group="g", rna=False,
                   read_id="rid")
    assert read_key(rd2) == "rid"


def test_psum_single_host_noop():
    a = np.arange(5)
    (out,) = psum_hosts(DistContext(), a)
    assert out is a


def test_accumulators_match_collate():
    """site_accumulators + region_stats_from_accumulators reproduce
    collate_reg_stats exactly on one shard (the single-host identity)."""
    from tombo_tpu.stats.region import RegionData
    rng = np.random.default_rng(3)
    reg = RegionData("c", "+", 1000, 2000)
    params = dt.TestParams(stat_type=DE_NOVO_TXT, single_read_thresh=0.8,
                           lower_thresh=0.2, region_size=1000)
    stats_l, locs_l, ids = [], [], []
    for r in range(5):
        n = rng.integers(50, 200)
        locs = np.sort(rng.integers(1000 - 3, 2000 + 3, n))
        stats = rng.random(n)
        stats[rng.random(n) < 0.05] = np.nan
        stats_l.append(stats)
        locs_l.append(locs.astype(np.int64))
        ids.append(("r%d" % r, n))
    reg_stats, _ = dt.collate_reg_stats(
        [s.copy() for s in stats_l], [l.copy() for l in locs_l], ids, None,
        reg, 0.8, 0.2, DE_NOVO_TXT, DE_NOVO_TXT, None)
    span_lo, span_n = dt._accum_span(reg, params)
    cov, valid, above = dt.site_accumulators(
        stats_l, locs_l, span_lo, span_n, 0.8, 0.2, DE_NOVO_TXT)
    acc_stats = dt.region_stats_from_accumulators(
        reg, span_lo, cov, valid, above, None, DE_NOVO_TXT)
    np.testing.assert_array_equal(acc_stats.reg_poss, reg_stats.reg_poss)
    np.testing.assert_array_equal(acc_stats.reg_cov, reg_stats.reg_cov)
    np.testing.assert_array_equal(acc_stats.valid_cov, reg_stats.valid_cov)
    np.testing.assert_array_equal(acc_stats.reg_frac_standard_base,
                                  reg_stats.reg_frac_standard_base)


@pytest.fixture(scope="module")
def dist_dataset(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("dist_ds"))
    fasta, reads, fast5_dir = make_synthetic_dataset(
        tmp, n_reads=12, seed=44, read_len=400)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    aligner = ExactAligner(fasta)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    summary, _ = resquiggle_all_reads(
        fast5_dir, aligner, model, sst, params,
        RunConfig(overwrite=True, batch_size=6, num_io_threads=2))
    assert summary.n_success == 12
    return tmp, fasta, model, fast5_dir


def _model_blocks(fn, chrm):
    st = ModelStats(fn)
    out = {}
    for strand in "+-":
        blk = st.get_reg_stats(chrm, strand, 0, 10 ** 9)
        if blk is not None:
            out[strand] = np.sort(blk, order="pos")
    st.close()
    return out


def _level_blocks(fn, chrm):
    st = LevelStats(fn)
    out = {}
    for strand in "+-":
        blk = st.get_reg_stats(chrm, strand, 0, 10 ** 9)
        if blk is not None:
            out[strand] = np.sort(blk, order="pos")
    st.close()
    return out


def test_two_hosts_match_single(dist_dataset):
    tmp, fasta, model, fast5_dir = dist_dataset
    index = ReadsIndex([fast5_dir])
    chrm = fasta.iter_chrms()[0]

    # single-host references
    thresh = config.DE_NOVO_THRESH[config.DNA_SAMP_TYPE]
    params = dt.TestParams(
        stat_type=DE_NOVO_TXT, single_read_thresh=thresh[1],
        lower_thresh=thresh[0], region_size=1000, num_most_signif=500)
    single_dn = os.path.join(tmp, "single.denovo")
    dt.test_significance(index, params, single_dn, fasta=fasta,
                         std_ref=model, num_processes=2)
    ks_params = dt.TestParams(
        stat_type=KS_TEST_TXT, region_size=1000, min_test_reads=1,
        num_most_signif=500)
    single_ks = os.path.join(tmp, "single.ks")
    dt.test_significance(index, ks_params, single_ks,
                         ctrl_reads_index=index, num_processes=2)

    # 2-process jax.distributed cluster on localhost
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out_prefix = os.path.join(tmp, "dist")
    worker = os.path.join(os.path.dirname(__file__),
                          "_dist_detect_worker.py")
    fasta_fn = os.path.join(tmp, "reference.fasta")
    # clean PYTHONPATH: the axon sitecustomize initializes the jax backend
    # at interpreter start, which would freeze a single-process CPU view
    # before jax.distributed.initialize runs in the worker
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo_root)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), "2", fast5_dir,
         fasta_fn, out_prefix],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "worker %d failed:\n%s" % (pid, out)
        assert "WORKER_%d_DONE" % pid in out
        # the production cross-host merge must ride the device
        # collective (SURVEY §5.8); the host allgather is fallback-only
        assert "PSUM_PATH=device" in out, out

    # de novo (read-sharded + psum): identical per-site stats
    a = _model_blocks(single_dn, chrm)
    b = _model_blocks(out_prefix + ".denovo", chrm)
    assert set(a) == set(b) and a
    for strand in a:
        np.testing.assert_array_equal(a[strand]["pos"], b[strand]["pos"])
        np.testing.assert_array_equal(a[strand]["cov"], b[strand]["cov"])
        np.testing.assert_array_equal(a[strand]["valid_cov"],
                                      b[strand]["valid_cov"])
        np.testing.assert_allclose(a[strand]["frac"], b[strand]["frac"],
                                   rtol=0, atol=0)
        np.testing.assert_allclose(a[strand]["damp_frac"],
                                   b[strand]["damp_frac"], rtol=0, atol=0)

    # KS (region-sharded): identical level stats
    a = _level_blocks(single_ks, chrm)
    b = _level_blocks(out_prefix + ".ks", chrm)
    assert set(a) == set(b) and a
    for strand in a:
        np.testing.assert_array_equal(a[strand]["pos"], b[strand]["pos"])
        np.testing.assert_array_equal(a[strand]["cov"], b[strand]["cov"])
        np.testing.assert_allclose(a[strand]["stat"], b[strand]["stat"],
                                   rtol=0, atol=0)
