"""Sharded FAST5 writer processes produce byte-equivalent outputs to the
inline writeback lane (pipeline/runner.py _ShardedWriters)."""
import os
import tempfile

import h5py
import numpy as np

from tombo_tpu import config
from tombo_tpu.io.index import ReadsIndex
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
from tombo_tpu.testing import make_synthetic_dataset
from tombo_tpu.types import SeqSampleType


def test_writer_procs_match_inline(tmp_path):
    fasta, _, fast5_dir = make_synthetic_dataset(
        str(tmp_path), n_reads=24, seed=11, read_len=700, ref_len=20000)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    aligner = ExactAligner(fasta)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)

    s_proc, _ = resquiggle_all_reads(
        fast5_dir, aligner, model, sst, params,
        RunConfig(overwrite=True, batch_size=16, num_io_threads=2,
                  progress=False, num_write_procs=2))
    events_proc = _read_events(fast5_dir)
    idx_proc = _index_rows(fast5_dir)

    s_inline, _ = resquiggle_all_reads(
        fast5_dir, aligner, model, sst, params,
        RunConfig(overwrite=True, batch_size=16, num_io_threads=2,
                  progress=False, num_write_procs=0))
    events_inline = _read_events(fast5_dir)
    idx_inline = _index_rows(fast5_dir)

    assert s_proc.n_success == s_inline.n_success == 24
    assert set(events_proc) == set(events_inline)
    for fn in events_proc:
        a, b = events_proc[fn], events_inline[fn]
        for field in a.dtype.names:   # per-field: NaN-tolerant equality
            np.testing.assert_array_equal(a[field], b[field])
    assert idx_proc == idx_inline


def _read_events(fast5_dir):
    out = {}
    for fn in sorted(os.listdir(fast5_dir)):
        if not fn.endswith(".fast5"):
            continue
        with h5py.File(os.path.join(fast5_dir, fn), "r") as f:
            grp = f["/Analyses/%s/BaseCalled_template" %
                    config.DEFAULT_CORRECTED_GROUP]
            out[fn] = grp["Events"][:]
    return out


def _index_rows(fast5_dir):
    idx = ReadsIndex([fast5_dir])
    rows = []
    for (chrm, strand), reads in idx:
        for rd in reads:
            rows.append((chrm, strand, rd.start, rd.end, rd.read_id))
    return sorted(rows)
