"""End-to-end CLI workflow: resquiggle -> detect -> output -> models."""
import os

import numpy as np
import pytest

from tombo_tpu.cli.main import main
from tombo_tpu.testing import make_synthetic_dataset


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("cli_ds"))
    fasta, reads, fast5_dir = make_synthetic_dataset(
        tmp, n_reads=14, seed=9, read_len=400, ref_len=2500)
    return tmp, os.path.join(tmp, "reference.fasta"), fast5_dir


def test_cli_full_workflow(ds, capsys):
    tmp, ref_fn, fast5_dir = ds

    # resquiggle
    assert main(["resquiggle", fast5_dir, ref_fn, "--overwrite", "--allow-exact-aligner",
                 "--dna", "--processes", "2"]) == 0
    out = capsys.readouterr().out
    assert "succeeded" in out

    # de novo detection with per-read stats
    stats_bn = os.path.join(tmp, "cli_test")
    assert main(["detect_modifications", "de_novo", fast5_dir,
                 "--statistics-file-basename", stats_bn,
                 "--per-read-statistics-basename", stats_bn,
                 "--reference", ref_fn, "--processes", "2"]) == 0
    assert os.path.exists(stats_bn + ".tombo.stats")
    assert os.path.exists(stats_bn + ".tombo.per_read_stats")

    # output provenance: every artifact records the resolved parameter set
    import glob
    import json
    import h5py
    f5 = sorted(glob.glob(os.path.join(fast5_dir, "*.fast5")))[0]
    with h5py.File(f5, "r") as fp:
        rp = fp["Analyses/RawGenomeCorrected_000/BaseCalled_template"].attrs[
            "resolved_params"]
        rp = json.loads(rp if isinstance(rp, str) else rp.decode())
        assert rp["resquiggle"]["bandwidth"] > 0
        assert rp["seq_sample_type"] == "DNA"
    with h5py.File(stats_bn + ".tombo.stats", "r") as fp:
        rp = json.loads(fp.attrs["resolved_params"])
        assert rp["test_params"]["stat_type"] == "de_novo"
    with h5py.File(stats_bn + ".tombo.per_read_stats", "r") as fp:
        rp = json.loads(fp.attrs["resolved_params"])
        assert rp["test_params"]["region_size"] > 0
    from tombo_tpu.stats.files import ModelStats
    assert ModelStats(stats_bn + ".tombo.stats").resolved_params is not None

    # aggregate per-read stats
    agg_bn = os.path.join(tmp, "cli_agg")
    assert main(["detect_modifications", "aggregate_per_read_stats",
                 "--per-read-statistics-filename",
                 stats_bn + ".tombo.per_read_stats",
                 "--statistics-file-basename", agg_bn,
                 "--single-read-threshold", "0.15", "0.5"]) == 0
    assert os.path.exists(agg_bn + ".tombo.stats")

    # browser files
    browser_bn = os.path.join(tmp, "browser")
    assert main(["text_output", "browser_files",
                 "--fast5-basedirs", fast5_dir,
                 "--statistics-filename", stats_bn + ".tombo.stats",
                 "--browser-file-basename", browser_bn,
                 "--file-types", "coverage", "fraction"]) == 0
    assert os.path.exists(browser_bn + ".coverage.plus.bedgraph")
    assert os.path.exists(
        browser_bn + ".fraction_modified_reads.plus.wig")

    # significant-region FASTA
    seqs_fn = os.path.join(tmp, "signif.fasta")
    assert main(["text_output", "signif_sequence_context",
                 "--statistics-filename", stats_bn + ".tombo.stats",
                 "--genome-fasta", ref_fn,
                 "--sequences-filename", seqs_fn]) == 0
    assert os.path.exists(seqs_fn)

    # filters
    assert main(["filter", "raw_signal_matching", fast5_dir,
                 "--signal-matching-score", "100.0", "-q"]) == 0
    assert main(["filter", "clear_filters", fast5_dir]) == 0

    # model estimation
    model_fn = os.path.join(tmp, "est.tombo.model")
    assert main(["build_model", "estimate_reference", fast5_dir,
                 "--reference", ref_fn,
                 "--tombo-model-filename", model_fn,
                 "--upstream-bases", "1", "--downstream-bases", "1",
                 "--minimum-test-reads", "1",
                 "--minimum-kmer-observations", "1",
                 "--multiprocess-region-size", "1000"]) == 0
    assert os.path.exists(model_fn)

    # estimate_scale
    assert main(["build_model", "estimate_scale", fast5_dir]) == 0
    assert "Global scaling estimate" in capsys.readouterr().out


def test_reference_style_fast5_basedirs_option(ds, tmp_path):
    """The reference passes FAST5 dirs as a --fast5-basedirs OPTION on
    detect/filter/plot commands (reference README examples); both forms
    must work."""
    tmp, ref_fn, fast5_dir = ds
    bn = str(tmp_path / "optform")
    assert main(["detect_modifications", "de_novo",
                 "--fast5-basedirs", fast5_dir,
                 "--statistics-file-basename", bn,
                 "--reference", ref_fn, "-q"]) == 0
    assert os.path.exists(bn + ".tombo.stats")
    assert main(["filter", "clear_filters",
                 "--fast5-basedirs", fast5_dir, "-q"]) == 0
    pdf = str(tmp_path / "optform.pdf")
    assert main(["plot", "max_coverage", "--fast5-basedirs", fast5_dir,
                 "--pdf-filename", pdf, "--num-regions", "1", "-q"]) == 0
    assert os.path.exists(pdf)


def test_cli_version_and_help():
    with pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0
    with pytest.raises(SystemExit):
        main(["not_a_command"])


def test_preprocess_annotate_fastqs(tmp_path):
    import h5py
    from tombo_tpu import config
    from tombo_tpu.testing import (random_reference, simulate_read,
                                   write_synthetic_fast5)

    rng = np.random.default_rng(3)
    fasta = random_reference(rng, 3000)
    fast5_dir = str(tmp_path / "raw_fast5s")
    os.makedirs(fast5_dir)
    fq_fn = str(tmp_path / "reads.fastq")
    model = None
    from tombo_tpu.io.model_io import KmerModel
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    with open(fq_fn, "w") as fq:
        for i in range(5):
            read = simulate_read(rng, fasta, model, read_len=300,
                                 read_id="pp_%03d" % i)
            write_synthetic_fast5(
                os.path.join(fast5_dir, read.read_id + ".fast5"), read,
                with_basecalls=False)
            fq.write("@%s extra meta\n%s\n+\n%s\n" % (
                read.read_id, read.seq, "5" * len(read.seq)))

    assert main(["preprocess", "annotate_raw_with_fastqs",
                 "--fast5-basedir", fast5_dir,
                 "--fastq-filenames", fq_fn]) == 0

    # Fastq slot written and consumable
    fn = os.path.join(fast5_dir, "pp_000.fast5")
    with h5py.File(fn) as fp:
        fq_data = fp["/Analyses/Basecall_1D_000/BaseCalled_template/"
                     "Fastq"][()]
        if isinstance(fq_data, bytes):
            fq_data = fq_data.decode()
        assert fq_data.startswith("@pp_000")

    # resquiggle now succeeds on the annotated reads
    fasta_fn = str(tmp_path / "ref.fasta")
    fasta.write(fasta_fn)
    assert main(["resquiggle", fast5_dir, fasta_fn, "--overwrite",
                 "--allow-exact-aligner", "--dna", "-q"]) == 0
    from tombo_tpu.io.index import ReadsIndex
    idx = ReadsIndex([fast5_dir])
    assert sum(len(v) for v in idx.reads_index.values()) == 5


def test_event_resquiggle(tmp_path):
    from tombo_tpu import config
    from tombo_tpu.io.fast5 import read_corrected_events
    from tombo_tpu.io.index import ReadsIndex
    from tombo_tpu.io.model_io import KmerModel
    from tombo_tpu.pipeline.aligner import ExactAligner
    from tombo_tpu.pipeline.event_resquiggle import (
        event_resquiggle_all_reads)
    from tombo_tpu.testing import (random_reference, simulate_read,
                                   write_basecaller_events,
                                   write_synthetic_fast5)

    rng = np.random.default_rng(13)
    fasta = random_reference(rng, 3000)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    fast5_dir = str(tmp_path / "ev_fast5s")
    os.makedirs(fast5_dir)
    reads = []
    for i in range(5):
        read = simulate_read(rng, fasta, model, read_len=300,
                             read_id="ev_%03d" % i)
        fn = os.path.join(fast5_dir, read.read_id + ".fast5")
        write_synthetic_fast5(fn, read)
        write_basecaller_events(fn, read, jitter=2, rng=rng)
        reads.append(read)

    n_ok, n_fail, fails = event_resquiggle_all_reads(
        fast5_dir, ExactAligner(fasta), num_threads=2)
    assert n_ok == 5, fails

    # corrected groups written with genome-matching bases
    fn = os.path.join(fast5_dir, reads[0].read_id + ".fast5")
    events, rsrtr, align_attrs, rna = read_corrected_events(
        fn, config.DEFAULT_CORRECTED_GROUP + "/" +
        config.DEFAULT_BASECALL_SUBGROUP)
    bases = b"".join(events["base"]).decode()
    expected = fasta.get_seq(reads[0].chrm)[reads[0].start:reads[0].end]
    if reads[0].strand == "-":
        from tombo_tpu.seq import rev_comp
        expected = rev_comp(expected)
    assert bases == expected
    # boundaries close to ground truth (basecaller jitter preserved)
    true_rel = reads[0].true_segs - reads[0].read_start_rel_to_raw
    assert events.shape[0] == true_rel.shape[0] - 1
    idx = ReadsIndex([fast5_dir])
    assert sum(len(v) for v in idx.reads_index.values()) == 5


def test_resquiggle_advanced_options(tmp_path, capsys):
    """Advanced re-squiggle options (reference:
    tombo/_option_parsers.py:732-806): --print-advanced-arguments,
    --fixed-scale / --skip-sequence-rescaling / --failed-reads-filename /
    --outlier-threshold / --max-scaling-iterations."""
    tmp = str(tmp_path)
    fasta, reads, fast5_dir = make_synthetic_dataset(
        tmp, n_reads=6, seed=21, read_len=400, ref_len=2500)
    ref_fn = os.path.join(tmp, "reference.fasta")

    assert main(["resquiggle", fast5_dir, ref_fn,
                 "--print-advanced-arguments"]) == 0
    out = capsys.readouterr().out
    for opt in ("--fixed-scale", "--outlier-threshold",
                "--skip-sequence-rescaling", "--max-scaling-iterations"):
        assert opt in out

    # a fixed scale near the dataset's true MAD so reads still align
    sig = reads[0].raw_signal
    const = float(np.median(np.abs(sig - np.median(sig))))
    failed_fn = os.path.join(tmp, "failed.txt")
    assert main(["resquiggle", fast5_dir, ref_fn, "--overwrite",
                 "--allow-exact-aligner", "--dna", "--processes", "2",
                 "--fixed-scale", str(const), "--skip-sequence-rescaling",
                 "--max-scaling-iterations", "1",
                 "--outlier-threshold", "5.0",
                 "--failed-reads-filename", failed_fn,
                 "--obs-per-base-filter", "99:200", "100:5000"]) == 0
    out = capsys.readouterr().out
    assert "succeeded" in out
    assert os.path.exists(failed_fn)

    # fixed scale must actually pin every read's scale parameter
    from tombo_tpu.io.index import ReadsIndex
    import h5py
    idx = ReadsIndex([fast5_dir])
    n_checked = 0
    for rd in idx.iter_reads():
        with h5py.File(rd.fn, "r") as fp:
            grp = fp["/Analyses/%s" % rd.corr_group]
            assert abs(grp.attrs["scale"] - const) < 1e-9
            n_checked += 1
    assert n_checked >= 5


def test_preprocess_annotate_multiprocess(tmp_path):
    """The parallel annotation writers (real processes, disjoint FAST5
    shards) produce exactly the sequential result."""
    import os

    import h5py
    import numpy as np

    from tombo_tpu import config
    from tombo_tpu.io.model_io import KmerModel
    from tombo_tpu.preprocess import annotate_reads_with_fastq
    from tombo_tpu.testing import (random_reference, simulate_read,
                                   write_synthetic_fast5)

    rng = np.random.default_rng(91)
    fasta = random_reference(np.random.default_rng(92), 8000)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    fast5_dir = str(tmp_path / "raw_fast5s")
    os.makedirs(fast5_dir)
    fastq_fn = str(tmp_path / "reads.fastq")
    reads = []
    with open(fastq_fn, "w") as fp:
        for i in range(12):
            read = simulate_read(rng, fasta, model, read_len=150,
                                 read_id="mp_%03d" % i)
            write_synthetic_fast5(
                os.path.join(fast5_dir, read.read_id + ".fast5"), read,
                with_basecalls=False)
            fp.write("@%s\n%s\n+\n%s\n" % (read.read_id, read.seq,
                                           "#" * len(read.seq)))
            reads.append(read)

    n_ann, n_miss = annotate_reads_with_fastq(
        fast5_dir, [fastq_fn], num_threads=3, min_parallel_records=4)
    assert (n_ann, n_miss) == (12, 0)
    for read in reads:
        fn = os.path.join(fast5_dir, read.read_id + ".fast5")
        with h5py.File(fn, "r") as fp:
            rec = fp["/Analyses/Basecall_1D_000/BaseCalled_template/"
                     "Fastq"][()]
            if isinstance(rec, bytes):
                rec = rec.decode()
            assert rec.split("\n")[1] == read.seq
