"""Fused resquiggle -> detect: device-resident event means serve the
packed detection lane with no sidecar read and no level upload
(stats/device_levels.py; reference being beaten: per-test FAST5/Events
re-reads, tombo/tombo_stats.py:3705,3803,4013)."""
import os
import tempfile

import numpy as np
import pytest

from tombo_tpu import config
from tombo_tpu.io.index import ReadsIndex
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline.aligner import MinimizerAligner
from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
from tombo_tpu.stats import detect as dt
from tombo_tpu.stats import device_levels
from tombo_tpu.testing import make_synthetic_dataset
from tombo_tpu.types import SeqSampleType


def _load_stats(fn):
    import h5py
    out = {}
    with h5py.File(fn, "r") as f:
        def walk(name, obj):
            if isinstance(obj, h5py.Dataset):
                out[name] = obj[...]
        f.visititems(walk)
    return out


@pytest.mark.parametrize("stat_type", ["de_novo"])
def test_fused_detect_matches_upload_lane(stat_type, tmp_path):
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    device_levels.clear()
    # reads must be long enough for the adaptive lane (>= start_bw +
    # start_n_bases events) — short reads take the static fallback,
    # which finalizes on host and registers nothing
    fasta, _, fast5_dir = make_synthetic_dataset(
        str(tmp_path), n_reads=40, seed=7, read_len=800, ref_len=30000)
    aligner = MinimizerAligner(fasta)
    cfg = RunConfig(overwrite=True, batch_size=32, num_io_threads=2)
    summary, _ = resquiggle_all_reads(fast5_dir, aligner, model, sst,
                                      params, cfg)
    assert summary.n_success >= 36
    # the resquiggle run left its device mean matrices registered
    assert device_levels.stats()["reads"] >= 36

    hits = [0]
    orig = device_levels.lookup

    def probe(rid, nb):
        out = orig(rid, nb)
        if out is not None:
            hits[0] += 1
        return out

    index = ReadsIndex([fast5_dir])
    th = config.DE_NOVO_THRESH[config.DNA_SAMP_TYPE]
    p = dt.TestParams(stat_type=stat_type, single_read_thresh=th[1],
                      lower_thresh=th[0])
    os.environ["TOMBO_TPU_STATS_DEVICE"] = "1"
    # the CPU harness runs x64; force the f32 device-levels path so the
    # fused lane is actually exercised
    os.environ["TOMBO_TPU_DEV_LEVELS_FORCE"] = "1"
    try:
        device_levels.lookup = probe
        fused_fn = str(tmp_path / "fused.stats")
        dt.test_significance(index, p, fused_fn, fasta=fasta,
                             std_ref=model, num_processes=2)
        assert hits[0] > 0          # the cache actually served
        device_levels.lookup = orig
        os.environ["TOMBO_TPU_DEV_LEVELS"] = "0"
        plain_fn = str(tmp_path / "plain.stats")
        dt.test_significance(index, p, plain_fn, fasta=fasta,
                             std_ref=model, num_processes=2)
    finally:
        device_levels.lookup = orig
        os.environ.pop("TOMBO_TPU_DEV_LEVELS", None)
        os.environ.pop("TOMBO_TPU_DEV_LEVELS_FORCE", None)
        os.environ.pop("TOMBO_TPU_STATS_DEVICE", None)

    a, b = _load_stats(fused_fn), _load_stats(plain_fn)
    assert set(a) == set(b)
    # the cached f32 means agree with the sidecar f64->f32 means to ulp;
    # identical accumulators on this dataset (threshold flips would be
    # the documented f32 tolerance class, docs/performance.md)
    n_diff = sum(int(np.sum(a[k] != b[k])) for k in a)
    n_tot = sum(a[k].size for k in a)
    assert n_diff <= max(1, n_tot // 10000), (n_diff, n_tot)


def test_device_levels_cache_eviction_and_validation():
    import jax.numpy as jnp
    device_levels.clear()
    arr1 = jnp.zeros((4, 8), jnp.float32)
    device_levels.register_batch(arr1, [("r1", 0, 8), ("r2", 1, 6)])
    assert device_levels.lookup("r1", 8) is not None
    # span-length mismatch (stale index row) never serves
    assert device_levels.lookup("r1", 7) is None
    # re-registration wins (rows may be renumbered by compaction;
    # check the served VALUES, not internal row ids)
    arr2 = jnp.ones((4, 8), jnp.float32)
    device_levels.register_batch(arr2, [("r1", 2, 8)])
    got = device_levels.lookup("r1", 8)
    assert got is not None
    assert float(np.asarray(got[0])[got[1]][0]) == 1.0
    device_levels.clear()
    assert device_levels.lookup("r1", 8) is None
