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
