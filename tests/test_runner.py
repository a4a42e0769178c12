"""Full directory run: FAST5s in, corrected groups + index out."""
import os

import h5py
import numpy as np

from tombo_tpu import config
from tombo_tpu.io.fast5 import read_corrected_events
from tombo_tpu.io.index import ReadsIndex
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
from tombo_tpu.io.fasta import Fasta
from tombo_tpu.testing import make_synthetic_dataset
from tombo_tpu.types import SeqSampleType


def test_directory_run(tmp_path):
    fasta, reads, fast5_dir = make_synthetic_dataset(
        str(tmp_path), n_reads=8, seed=21, read_len=500)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    aligner = ExactAligner(fasta)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)

    summary, idx = resquiggle_all_reads(
        fast5_dir, aligner, model, sst, params,
        RunConfig(overwrite=True, batch_size=4, num_io_threads=2))
    assert summary.n_success == 8, summary.as_dict()
    assert summary.n_failed == 0

    # corrected events written with reference-compatible layout
    fn = os.path.join(fast5_dir, reads[0].read_id + ".fast5")
    events, rsrtr, align_attrs, rna = read_corrected_events(
        fn, config.DEFAULT_CORRECTED_GROUP + "/" +
        config.DEFAULT_BASECALL_SUBGROUP)
    assert set(events.dtype.names) == {
        "norm_mean", "norm_stdev", "start", "length", "base"}
    assert events.shape[0] == reads[0].end - reads[0].start
    assert align_attrs["mapped_chrom"] == reads[0].chrm
    assert not rna
    bases = b"".join(events["base"]).decode()
    ref = fasta.get_seq(reads[0].chrm)
    expected = ref[reads[0].start:reads[0].end]
    if reads[0].strand == "-":
        from tombo_tpu.seq import rev_comp
        expected = rev_comp(expected)
    assert bases == expected

    # index round-trips through the pickle format
    loaded = ReadsIndex([fast5_dir])
    assert sum(len(v) for v in loaded.reads_index.values()) == 8
    cov = loaded.get_cs_coverage(reads[0].chrm, reads[0].strand)
    assert cov is not None and cov.max() >= 1

    # re-running without --overwrite fails all reads
    summary2, _ = resquiggle_all_reads(
        fast5_dir, aligner, model, sst, params,
        RunConfig(overwrite=False, batch_size=4, num_io_threads=2))
    assert summary2.n_success == 0
    assert summary2.n_failed == 8
