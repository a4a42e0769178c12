"""Process-parallel FAST5 ingest (pipeline/ingest.py)."""
import os

import numpy as np
import pytest

from tombo_tpu import config
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline.aligner import ExactAligner, MinimizerAligner
from tombo_tpu.pipeline import ingest
from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
from tombo_tpu.testing import make_synthetic_dataset
from tombo_tpu.types import SeqSampleType


def _setup(tmp_path, n_reads=48):
    fasta, _, fast5_dir = make_synthetic_dataset(
        str(tmp_path), n_reads=n_reads, seed=3, read_len=600, ref_len=30000)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    return fasta, fast5_dir, model, sst, params


def test_aligner_specs_roundtrip(tmp_path):
    fasta, *_ = _setup(tmp_path, n_reads=1)
    for al in (ExactAligner(fasta), MinimizerAligner(fasta)):
        spec = ingest.aligner_spec(al)
        assert spec is not None
        rebuilt = ingest.build_aligner(spec)
        assert type(rebuilt) is type(al)


def test_process_ingest_matches_thread_ingest(tmp_path):
    """The spawned ingest pool produces the same mapped units (and the
    run the same results) as the thread fallback."""
    fasta, fast5_dir, model, sst, params = _setup(tmp_path)
    al = ExactAligner(fasta)
    cfg = RunConfig(overwrite=True, batch_size=16, num_io_threads=2,
                    skip_index=True)

    os.environ["TOMBO_TPU_INGEST_MIN"] = "1000000"      # force threads
    try:
        s_thr, _ = resquiggle_all_reads(fast5_dir, al, model, sst, params,
                                        cfg)
    finally:
        del os.environ["TOMBO_TPU_INGEST_MIN"]

    os.environ["TOMBO_TPU_INGEST_MIN"] = "1"            # force processes
    os.environ["TOMBO_TPU_INGEST_PROCS"] = "2"
    try:
        s_proc, _ = resquiggle_all_reads(fast5_dir, al, model, sst, params,
                                         cfg)
    finally:
        del os.environ["TOMBO_TPU_INGEST_MIN"]
        del os.environ["TOMBO_TPU_INGEST_PROCS"]
        if ingest._POOL is not None:
            ingest._POOL.shutdown()
            ingest._POOL = None

    assert s_proc.n_success == s_thr.n_success
    assert s_proc.n_failed == s_thr.n_failed


def test_int16_wire_preserves_raw(tmp_path):
    """The int16 raw wire format used by ingest workers is exact for
    FAST5 DAC signals (including post-adjust flips)."""
    raw = np.array([10, 11, 9, 30000, -30000, 0], np.float64)
    assert np.abs(raw).max() < 2 ** 15 and np.all(raw == np.trunc(raw))
    r16 = raw.astype(np.int16)
    assert np.array_equal(r16.astype(np.float64), raw)
