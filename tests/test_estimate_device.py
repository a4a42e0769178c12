"""Device k-mer level extraction (stats/estimate_device.py) vs the host
lane (reference: tombo/tombo_stats.py:1242-1452)."""
import os

import numpy as np

from tombo_tpu import config
from tombo_tpu.io.index import ReadsIndex
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
from tombo_tpu.stats import estimate as est
from tombo_tpu.stats.region import clear_levels_cache
from tombo_tpu.testing import make_synthetic_dataset
from tombo_tpu.types import SeqSampleType


def test_estimate_device_matches_host(tmp_path):
    fasta, _, fast5_dir = make_synthetic_dataset(
        str(tmp_path), n_reads=50, seed=13, read_len=1200, ref_len=20000)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    resquiggle_all_reads(
        fast5_dir, ExactAligner(fasta), model,
        SeqSampleType(config.DNA_SAMP_TYPE, False),
        config.load_resquiggle_parameters(config.DNA_SAMP_TYPE),
        RunConfig(overwrite=True, batch_size=32, num_io_threads=2))
    index = ReadsIndex([fast5_dir])
    kw = dict(region_size=config.DEFAULT_REGION_SIZE, cov_thresh=1,
              upstrm_bases=2, dnstrm_bases=3, cs_cov_thresh=None,
              est_mean=False, num_processes=2)
    try:
        os.environ["TOMBO_TPU_EST_DEVICE"] = "0"
        clear_levels_cache()
        host = est.extract_kmer_levels(index, fasta, **kw)
        os.environ["TOMBO_TPU_EST_DEVICE"] = "1"
        os.environ["TOMBO_TPU_DEV_LEVELS_FORCE"] = "1"
        clear_levels_cache()
        dev = est.extract_kmer_levels(index, fasta, **kw)
    finally:
        os.environ.pop("TOMBO_TPU_EST_DEVICE", None)
        os.environ.pop("TOMBO_TPU_DEV_LEVELS_FORCE", None)
    assert len(host) == len(dev) > 0
    max_dev = 0.0
    n_pairs = 0
    for hd, dd in zip(host, dev):
        assert set(hd) == set(dd)
        for km in hd:
            # identical site membership per k-mer, values in site order
            assert len(hd[km]) == len(dd[km]), km
            for (a, b), (c, d) in zip(hd[km], dd[km]):
                n_pairs += 1
                max_dev = max(max_dev, abs(a - c), abs(b - d))
    assert n_pairs > 1000
    # f32 per-site statistics vs the f64 host lane
    assert max_dev < 5e-3, max_dev


def test_estimate_device_est_mean_and_subsample(tmp_path):
    fasta, _, fast5_dir = make_synthetic_dataset(
        str(tmp_path), n_reads=50, seed=3, read_len=1200, ref_len=20000)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    resquiggle_all_reads(
        fast5_dir, ExactAligner(fasta), model,
        SeqSampleType(config.DNA_SAMP_TYPE, False),
        config.load_resquiggle_parameters(config.DNA_SAMP_TYPE),
        RunConfig(overwrite=True, batch_size=32, num_io_threads=2))
    index = ReadsIndex([fast5_dir])
    # cs_cov_thresh subsamples each region down to very few reads
    # (reference semantics), so accept single-read coverage here
    kw = dict(region_size=config.DEFAULT_REGION_SIZE, cov_thresh=0,
              upstrm_bases=2, dnstrm_bases=3, cs_cov_thresh=2,
              est_mean=True, num_processes=2)
    try:
        os.environ["TOMBO_TPU_EST_DEVICE"] = "0"
        clear_levels_cache()
        host = est.extract_kmer_levels(
            index, fasta, rng=np.random.default_rng(0), **kw)
        os.environ["TOMBO_TPU_EST_DEVICE"] = "1"
        clear_levels_cache()
        dev = est.extract_kmer_levels(
            index, fasta, rng=np.random.default_rng(0), **kw)
    finally:
        os.environ.pop("TOMBO_TPU_EST_DEVICE", None)
    assert len(host) == len(dev) > 0
    for hd, dd in zip(host, dev):
        for km in hd:
            assert len(hd[km]) == len(dd[km]), km
            for (a, b), (c, d) in zip(hd[km], dd[km]):
                assert abs(a - c) < 5e-3 and abs(b - d) < 5e-3
