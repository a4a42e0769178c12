"""Levels sidecar built DURING resquiggle: first detection run reads no
FAST5s (round-4: cold-run detection io_frac)."""
import os

import numpy as np

from tombo_tpu import config
from tombo_tpu.io.index import ReadsIndex
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
from tombo_tpu.stats import detect as dt
from tombo_tpu.stats import levels_cache, region
from tombo_tpu.testing import make_synthetic_dataset
from tombo_tpu.types import SeqSampleType


def _resquiggle(tmp_path, num_write_procs):
    fasta, _, fast5_dir = make_synthetic_dataset(
        str(tmp_path), n_reads=40, seed=5, read_len=600, ref_len=30000)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    cfg = RunConfig(overwrite=True, batch_size=16, num_io_threads=2,
                    num_write_procs=num_write_procs)
    summary, _ = resquiggle_all_reads(fast5_dir, ExactAligner(fasta),
                                      model, sst, params, cfg)
    return fasta, fast5_dir, model, summary


def _sidecar_serves_all(fast5_dir, corr="RawGenomeCorrected_000"):
    index = ReadsIndex([fast5_dir])
    region.clear_levels_cache()
    n_total, n_hit = 0, 0
    for (chrm, strand), reads in index.reads_index.items():
        for r in reads:
            n_total += 1
            st = os.stat(r.fn)
            hit = levels_cache.lookup(r.fn, r.corr_group, st.st_mtime_ns,
                                      st.st_size)
            if hit is not None:
                means, seq, read_id = hit
                assert means.shape[0] == len(seq)
                n_hit += 1
    # registry reset so later tests reopen fresh shard sets
    with levels_cache.building(False):
        pass
    return n_total, n_hit


def test_inline_writeback_builds_sidecar(tmp_path):
    fasta, fast5_dir, model, summary = _resquiggle(tmp_path, 0)
    assert summary.n_success >= 35
    n_total, n_hit = _sidecar_serves_all(fast5_dir)
    assert n_hit == n_total and n_total >= 35


def test_writer_procs_build_sidecar(tmp_path):
    fasta, fast5_dir, model, summary = _resquiggle(tmp_path, 2)
    assert summary.n_success >= 35
    n_total, n_hit = _sidecar_serves_all(fast5_dir)
    assert n_hit == n_total and n_total >= 35


def test_sidecar_values_match_fast5(tmp_path):
    """Sidecar records equal the FAST5 Events table contents."""
    fasta, fast5_dir, model, summary = _resquiggle(tmp_path, 0)
    index = ReadsIndex([fast5_dir])
    region.clear_levels_cache()
    checked = 0
    for (chrm, strand), reads in index.reads_index.items():
        for r in reads[:5]:
            st = os.stat(r.fn)
            hit = levels_cache.lookup(r.fn, r.corr_group, st.st_mtime_ns,
                                      st.st_size)
            assert hit is not None
            raw = region._load_levels_raw(r)
            np.testing.assert_array_equal(hit[0], raw[0])
            assert hit[1] == raw[1]
            checked += 1
    with levels_cache.building(False):
        pass
    assert checked >= 5
