"""Browser-file text output + index filters."""
import os

import numpy as np
import pytest

from tombo_tpu import config, filters
from tombo_tpu.io.index import ReadsIndex
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.output import text as txt
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
from tombo_tpu.stats import detect as dt
from tombo_tpu.testing import make_synthetic_dataset
from tombo_tpu.types import SeqSampleType


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("out_ds"))
    fasta, reads, fast5_dir = make_synthetic_dataset(
        tmp, n_reads=10, seed=11, read_len=400)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    summary, _ = resquiggle_all_reads(
        fast5_dir, ExactAligner(fasta), model,
        SeqSampleType(config.DNA_SAMP_TYPE, False),
        config.load_resquiggle_parameters(config.DNA_SAMP_TYPE),
        RunConfig(overwrite=True, batch_size=6, num_io_threads=2))
    assert summary.n_success == 10
    th = config.DE_NOVO_THRESH[config.DNA_SAMP_TYPE]
    params = dt.TestParams(stat_type="de_novo", single_read_thresh=th[1],
                           lower_thresh=th[0], region_size=1000,
                           num_most_signif=200)
    stats_fn = os.path.join(tmp, "o.tombo.stats")
    index = ReadsIndex([fast5_dir])
    dt.test_significance(index, params, stats_fn, fasta=fasta,
                         std_ref=model)
    return tmp, fasta, fast5_dir, stats_fn


def test_browser_files(dataset, tmp_path):
    tmp, fasta, fast5_dir, stats_fn = dataset
    index = ReadsIndex([fast5_dir])
    base = str(tmp_path / "browser")
    txt.write_all_browser_files(
        index, None, stats_fn, base,
        ["coverage", "signal", "signal_sd", "dwell", "fraction",
         "dampened_fraction", "valid_coverage"])
    produced = sorted(os.listdir(str(tmp_path)))
    # coverage bedGraphs + wig pairs for each type
    assert "browser.coverage.plus.bedgraph" in produced
    assert "browser.signal.plus.wig" in produced
    assert "browser.fraction_modified_reads.plus.wig" in produced
    assert "browser.dampened_fraction_modified_reads.minus.wig" in produced
    assert "browser.valid_coverage.plus.wig" in produced

    # headers + wiggle structure match the reference format
    with open(os.path.join(str(tmp_path),
                           "browser.signal.plus.wig")) as fp:
        lines = fp.read().splitlines()
    assert lines[0].startswith('track type=wiggle_0 name="')
    assert any(ln.startswith("variableStep chrom=") for ln in lines[1:])
    data_lines = [ln for ln in lines if ln and ln[0].isdigit()]
    assert data_lines
    pos, val = data_lines[0].split()
    int(pos)
    float(val)

    with open(os.path.join(str(tmp_path),
                           "browser.coverage.plus.bedgraph")) as fp:
        cov_lines = fp.read().splitlines()
    assert cov_lines[0].startswith("track type=bedGraph")
    fields = cov_lines[1].split("\t")
    assert len(fields) == 4 and int(fields[2]) > int(fields[1])

    # FASTA of most significant regions
    seqs_fn = str(tmp_path / "signif.fasta")
    txt.write_most_signif(stats_fn, seqs_fn, num_regions=3, num_bases=21,
                          fasta=fasta)
    with open(seqs_fn) as fp:
        fa = fp.read().splitlines()
    assert fa[0].startswith(">")
    assert set(fa[1]) <= set("ACGTN")


def test_filters_roundtrip(dataset):
    tmp, fasta, fast5_dir, stats_fn = dataset

    # signal-matching filter with absurd threshold filters nothing
    filters.filter_reads_for_signal_matching(fast5_dir,
                                             config.DEFAULT_CORRECTED_GROUP,
                                             1e9, quiet=True)
    idx = ReadsIndex([fast5_dir])
    n_all = sum(len(v) for v in idx.reads_index.values())
    assert n_all == 10

    # stuck filter with impossible threshold filters everything
    filters.filter_reads_for_stuck(fast5_dir,
                                   config.DEFAULT_CORRECTED_GROUP,
                                   [(50, 0)], quiet=True)
    idx = ReadsIndex([fast5_dir])           # remove_filtered=True default
    assert sum(len(v) for v in idx.reads_index.values()) == 0

    # clear restores all reads
    filters.clear_filters(fast5_dir, config.DEFAULT_CORRECTED_GROUP)
    idx = ReadsIndex([fast5_dir])
    assert sum(len(v) for v in idx.reads_index.values()) == 10

    # coverage filter removes requested fraction
    filters.filter_reads_for_coverage(
        fast5_dir, config.DEFAULT_CORRECTED_GROUP, 0.5, quiet=True,
        rng=np.random.default_rng(0))
    idx = ReadsIndex([fast5_dir])
    assert sum(len(v) for v in idx.reads_index.values()) == 5
    filters.clear_filters(fast5_dir, config.DEFAULT_CORRECTED_GROUP)

    # genome position filter
    chrm = fasta.iter_chrms()[0]
    filters.filter_reads_for_genome_pos(
        fast5_dir, config.DEFAULT_CORRECTED_GROUP,
        filters.parse_genome_regions([chrm]), quiet=True)
    idx = ReadsIndex([fast5_dir])
    assert sum(len(v) for v in idx.reads_index.values()) == 10
    filters.filter_reads_for_genome_pos(
        fast5_dir, config.DEFAULT_CORRECTED_GROUP,
        filters.parse_genome_regions(["not_a_chrm"]), quiet=True)
    idx = ReadsIndex([fast5_dir])
    assert sum(len(v) for v in idx.reads_index.values()) == 0
    filters.clear_filters(fast5_dir, config.DEFAULT_CORRECTED_GROUP)
