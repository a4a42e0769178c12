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


def test_all_basecall_subgroups_processed(tmp_path):
    """Every requested basecall subgroup yields its own corrected subgroup
    (reference behavior: tombo/resquiggle.py:1612-1656 iterates all
    subgroups per read)."""
    from tombo_tpu.testing import (random_reference, simulate_read,
                                   write_synthetic_fast5)

    rng = np.random.default_rng(7)
    fasta = random_reference(rng, 5000)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    fast5_dir = os.path.join(str(tmp_path), "fast5s")
    os.makedirs(fast5_dir)
    subgroups = ("BaseCalled_template", "BaseCalled_complement")
    n_reads = 4
    for i in range(n_reads):
        read = simulate_read(rng, fasta, model, read_len=300,
                             read_id="multi_%02d" % i)
        fn = os.path.join(fast5_dir, read.read_id + ".fast5")
        write_synthetic_fast5(fn, read, bc_subgrp=subgroups[0])
        with h5py.File(fn, "r+") as f:
            src = ("Analyses/" + config.DEFAULT_BASECALL_GROUP + "/" +
                   subgroups[0])
            f.copy(f[src], f[src].parent, name=subgroups[1])

    summary, idx = resquiggle_all_reads(
        fast5_dir, ExactAligner(fasta), model,
        SeqSampleType(config.DNA_SAMP_TYPE, False),
        config.load_resquiggle_parameters(config.DNA_SAMP_TYPE),
        RunConfig(overwrite=True, batch_size=4, num_io_threads=2,
                  basecall_subgroups=subgroups))
    assert summary.n_success == n_reads * len(subgroups), summary.as_dict()
    with h5py.File(os.path.join(fast5_dir, "multi_00.fast5")) as fp:
        corr = fp["/Analyses/" + config.DEFAULT_CORRECTED_GROUP]
        for sg in subgroups:
            assert corr[sg].attrs["status"] == "success"
            assert "Events" in corr[sg]
    # both subgroups land in the index
    assert sum(len(v) for v in idx.reads_index.values()) == \
        n_reads * len(subgroups)


def test_failure_taxonomy_and_retry(tmp_path):
    """Unmappable and truncated reads are recorded per failure mode and do
    not crash the run (reference behavior: tombo/resquiggle.py:1704-1806)."""
    import numpy as np
    from tombo_tpu.testing import (random_reference, simulate_read,
                                   write_synthetic_fast5)

    tmp = str(tmp_path)
    rng = np.random.default_rng(3)
    fasta = random_reference(rng, 4000)
    other = random_reference(np.random.default_rng(99), 4000, name="other")
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    fast5_dir = os.path.join(tmp, "fast5s")
    os.makedirs(fast5_dir)
    good = bad = 0
    for i in range(6):
        read = simulate_read(rng, fasta, model, read_len=300,
                             read_id="ok_%02d" % i)
        write_synthetic_fast5(
            os.path.join(fast5_dir, read.read_id + ".fast5"), read)
        good += 1
    for i in range(3):
        # reads from a different genome: alignment must fail cleanly
        read = simulate_read(rng, other, model, read_len=300,
                             read_id="bad_%02d" % i)
        read.chrm = "other"
        write_synthetic_fast5(
            os.path.join(fast5_dir, read.read_id + ".fast5"), read)
        bad += 1

    summary, idx = resquiggle_all_reads(
        fast5_dir, ExactAligner(fasta), model,
        SeqSampleType(config.DNA_SAMP_TYPE, False),
        config.load_resquiggle_parameters(config.DNA_SAMP_TYPE),
        RunConfig(overwrite=True, batch_size=4, num_io_threads=2))
    assert summary.n_success == good
    assert summary.n_failed == bad
    assert sum(summary.failure_modes.values()) == bad
    # failure status recorded into the FAST5 corrected group
    import h5py
    with h5py.File(os.path.join(fast5_dir, "bad_00.fast5")) as fp:
        grp = fp["/Analyses/" + config.DEFAULT_CORRECTED_GROUP + "/" +
                 config.DEFAULT_BASECALL_SUBGROUP]
        assert grp.attrs["status"] != "success"
