"""Plot commands: PDFs produced end-to-end through the CLI."""
import os

import numpy as np
import pytest

from tombo_tpu.cli.main import main
from tombo_tpu.testing import make_synthetic_dataset


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("plot_ds"))
    fasta, reads, fast5_dir = make_synthetic_dataset(
        tmp, n_reads=12, seed=17, read_len=400, ref_len=2500)
    ref_fn = os.path.join(tmp, "reference.fasta")
    assert main(["resquiggle", fast5_dir, ref_fn, "--overwrite", "--dna",
                 "--allow-exact-aligner", "-q"]) == 0
    stats_bn = os.path.join(tmp, "pl")
    assert main(["detect_modifications", "de_novo", fast5_dir,
                 "--statistics-file-basename", stats_bn,
                 "--per-read-statistics-basename", stats_bn,
                 "--reference", ref_fn]) == 0
    return tmp, ref_fn, fast5_dir, stats_bn


def _check_pdf(fn):
    assert os.path.exists(fn), fn
    with open(fn, "rb") as fp:
        assert fp.read(5) == b"%PDF-"


def test_plot_max_coverage(ds, tmp_path):
    tmp, ref_fn, fast5_dir, stats_bn = ds
    pdf = str(tmp_path / "maxcov.pdf")
    assert main(["plot", "max_coverage", fast5_dir,
                 "--genome-fasta", ref_fn, "--pdf-filename", pdf,
                 "--num-regions", "2", "-q"]) == 0
    _check_pdf(pdf)


def test_plot_genome_locations(ds, tmp_path):
    tmp, ref_fn, fast5_dir, stats_bn = ds
    pdf = str(tmp_path / "gloc.pdf")
    assert main(["plot", "genome_locations", fast5_dir,
                 "--genome-locations", "chr_test:1000:+",
                 "--genome-fasta", ref_fn, "--pdf-filename", pdf,
                 "-q"]) == 0
    _check_pdf(pdf)


def test_plot_motif_centered(ds, tmp_path):
    tmp, ref_fn, fast5_dir, stats_bn = ds
    pdf = str(tmp_path / "motif.pdf")
    assert main(["plot", "motif_centered", fast5_dir,
                 "--motif", "CG", "--genome-fasta", ref_fn,
                 "--pdf-filename", pdf, "--num-regions", "2", "-q"]) == 0
    _check_pdf(pdf)


def test_plot_most_significant(ds, tmp_path):
    tmp, ref_fn, fast5_dir, stats_bn = ds
    pdf = str(tmp_path / "signif.pdf")
    assert main(["plot", "most_significant", fast5_dir,
                 "--statistics-filename", stats_bn + ".tombo.stats",
                 "--genome-fasta", ref_fn, "--pdf-filename", pdf,
                 "--num-regions", "2", "-q"]) == 0
    _check_pdf(pdf)


def test_plot_roc_and_per_read_roc(ds, tmp_path):
    tmp, ref_fn, fast5_dir, stats_bn = ds
    pdf = str(tmp_path / "roc.pdf")
    assert main(["plot", "roc",
                 "--statistics-filenames", stats_bn + ".tombo.stats",
                 "--motif-descriptions", "CG:1:CpG",
                 "--genome-fasta", ref_fn, "--pdf-filename", pdf,
                 "-q"]) == 0
    _check_pdf(pdf)

    pdf2 = str(tmp_path / "pr_roc.pdf")
    assert main(["plot", "per_read_roc",
                 "--statistics-filenames",
                 stats_bn + ".tombo.per_read_stats",
                 "--motif-descriptions", "CG:1:CpG",
                 "--genome-fasta", ref_fn, "--pdf-filename", pdf2,
                 "-q"]) == 0
    _check_pdf(pdf2)


def test_plot_kmer_and_per_read(ds, tmp_path):
    tmp, ref_fn, fast5_dir, stats_bn = ds
    pdf = str(tmp_path / "kmer.pdf")
    assert main(["plot", "kmer", fast5_dir, "--pdf-filename", pdf,
                 "--num-reads", "5", "-q"]) == 0
    _check_pdf(pdf)

    pdf2 = str(tmp_path / "per_read.pdf")
    assert main(["plot", "per_read",
                 "--per-read-statistics-filename",
                 stats_bn + ".tombo.per_read_stats",
                 "--genome-locations", "chr_test:1000:+",
                 "--pdf-filename", pdf2, "-q"]) == 0
    _check_pdf(pdf2)


def test_plot_cluster(ds, tmp_path):
    tmp, ref_fn, fast5_dir, stats_bn = ds
    pdf = str(tmp_path / "cluster.pdf")
    assert main(["plot", "cluster_most_significant", fast5_dir,
                 "--statistics-filename", stats_bn + ".tombo.stats",
                 "--genome-fasta", ref_fn, "--pdf-filename", pdf,
                 "--num-regions", "2", "-q"]) == 0
    _check_pdf(pdf)


def test_plot_overplot_types_and_models(ds, tmp_path):
    """--overplot-type alternatives + model-distribution overlays
    (reference: tombo/_option_parsers.py:343-346,499-501,649-652)."""
    tmp, ref_fn, fast5_dir, stats_bn = ds
    for op_type in ("Boxplot", "Quantile", "Density"):
        pdf = str(tmp_path / ("op_%s.pdf" % op_type))
        assert main(["plot", "max_coverage", fast5_dir,
                     "--genome-fasta", ref_fn, "--pdf-filename", pdf,
                     "--num-regions", "1", "--overplot-threshold", "2",
                     "--overplot-type", op_type, "-q"]) == 0
        _check_pdf(pdf)
    pdf = str(tmp_path / "models.pdf")
    assert main(["plot", "max_coverage", fast5_dir,
                 "--genome-fasta", ref_fn, "--pdf-filename", pdf,
                 "--num-regions", "1", "--plot-standard-model",
                 "--plot-alternate-model", "5mC", "-q"]) == 0
    _check_pdf(pdf)


def test_plot_motif_with_stats_and_deepest(ds, tmp_path):
    tmp, ref_fn, fast5_dir, stats_bn = ds
    pdf = str(tmp_path / "motif_stats.pdf")
    assert main(["plot", "motif_with_stats", fast5_dir,
                 "--motif", "CG", "--genome-fasta", ref_fn,
                 "--statistics-filename", stats_bn + ".tombo.stats",
                 "--pdf-filename", pdf, "--num-regions", "2",
                 "--num-context", "3", "--num-statistics", "50",
                 "-q"]) == 0
    _check_pdf(pdf)
    pdf2 = str(tmp_path / "motif_deep.pdf")
    assert main(["plot", "motif_centered", fast5_dir,
                 "--motif", "CG", "--genome-fasta", ref_fn,
                 "--deepest-coverage", "--pdf-filename", pdf2,
                 "--num-regions", "2", "-q"]) == 0
    _check_pdf(pdf2)


def test_plot_kmer_data_file_and_box_center(ds, tmp_path):
    import pickle
    tmp, ref_fn, fast5_dir, stats_bn = ds
    data_fn = str(tmp_path / "kmer.pkl")
    assert main(["plot", "kmer", fast5_dir, "--num-reads", "5",
                 "--num-kmer-threshold", "2", "--dont-plot",
                 "--r-data-filename", data_fn, "-q"]) == 0
    with open(data_fn, "rb") as fp:
        levels = pickle.load(fp)
    assert levels and all(len(v) >= 1 for v in levels.values())

    pdf = str(tmp_path / "pr_box.pdf")
    assert main(["plot", "per_read",
                 "--per-read-statistics-filename",
                 stats_bn + ".tombo.per_read_stats",
                 "--genome-locations", "chr_test:1000:+",
                 "--box-center", "--pdf-filename", pdf, "-q"]) == 0
    _check_pdf(pdf)


def test_plot_cluster_slide_span(ds, tmp_path):
    import pickle
    tmp, ref_fn, fast5_dir, stats_bn = ds
    pdf = str(tmp_path / "cluster_ss.pdf")
    data_fn = str(tmp_path / "cluster.pkl")
    assert main(["plot", "cluster_most_significant", fast5_dir,
                 "--statistics-filename", stats_bn + ".tombo.stats",
                 "--genome-fasta", ref_fn, "--pdf-filename", pdf,
                 "--num-regions", "2", "--slide-span", "2",
                 "--r-data-filename", data_fn, "-q"]) == 0
    _check_pdf(pdf)
    if os.path.exists(data_fn):
        with open(data_fn, "rb") as fp:
            saved = pickle.load(fp)
        assert isinstance(saved, dict)


def test_plot_sample_compare_roc(ds, tmp_path):
    """Control-sample ROC: native stats vs control stats at motif sites
    (reference: tombo/tombo_stats.py:2485-2533)."""
    tmp, ref_fn, fast5_dir, stats_bn = ds
    pdf = str(tmp_path / "sc_roc.pdf")
    assert main(["plot", "sample_compare_roc",
                 "--statistics-filenames", stats_bn + ".tombo.stats",
                 "--control-statistics-filenames",
                 stats_bn + ".tombo.stats",
                 "--motif-descriptions", "CG:1:CpG",
                 "--genome-fasta", ref_fn, "--pdf-filename", pdf,
                 "-q"]) == 0
    _check_pdf(pdf)

    pdf2 = str(tmp_path / "sc_pr_roc.pdf")
    assert main(["plot", "sample_compare_per_read_roc",
                 "--per-read-statistics-filenames",
                 stats_bn + ".tombo.per_read_stats",
                 "--per-read-control-statistics-filenames",
                 stats_bn + ".tombo.per_read_stats",
                 "--motif-descriptions", "CG:1:CpG",
                 "--genome-fasta", ref_fn, "--pdf-filename", pdf2,
                 "-q"]) == 0
    _check_pdf(pdf2)
