"""End-to-end single-read re-squiggle on synthetic data.

The pipeline must recover the ground-truth segmentation (within a small
tolerance at boundaries) and produce a good signal-match score.
"""
import numpy as np
import pytest

from tombo_tpu import config
from tombo_tpu.io.fasta import Fasta
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline import resquiggle as rsq
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.testing import random_reference, simulate_read
from tombo_tpu.types import SeqSampleType, SequenceData


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(123)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    fasta = random_reference(rng, 20000)
    aligner = ExactAligner(fasta)
    return rng, model, fasta, aligner


def _run_read(read, model, aligner, samp_type_name=config.DNA_SAMP_TYPE):
    seq_samp_type = SeqSampleType(samp_type_name,
                                  samp_type_name == config.RNA_SAMP_TYPE)
    params = config.load_resquiggle_parameters(samp_type_name)
    seq_data = SequenceData(seq=read.seq, id=read.read_id, mean_q_score=12.0)
    map_res = rsq.map_read(seq_data, aligner, model, seq_samp_type)
    map_res = map_res.replace(raw_signal=read.raw_signal)
    map_res = rsq.adjust_map_res(map_res, seq_samp_type, params)
    save_params = config.load_resquiggle_parameters(
        samp_type_name, use_save_bandwidth=True)
    return rsq.resquiggle_read_with_retries(
        map_res, model, params, save_params,
        outlier_thresh=config.OUTLIER_THRESH, seq_samp_type=seq_samp_type)


def test_single_read_fwd(setup):
    rng, model, fasta, aligner = setup
    read = simulate_read(rng, fasta, model, read_len=700, strand="+")
    res = _run_read(read, model, aligner)

    # segmentation matches base count
    assert res.segs.shape[0] == len(res.genome_seq) + 1
    assert res.segs.shape[0] == read.end - read.start + 1
    # signal assignment starts near the true adapter end
    true_rel = read.true_segs - read.read_start_rel_to_raw
    assert abs(res.read_start_rel_to_raw - read.read_start_rel_to_raw) < 30
    # most boundaries recovered within 3 samples
    shift = res.read_start_rel_to_raw - read.read_start_rel_to_raw
    recovered = res.segs + shift
    diffs = np.abs(recovered - true_rel)
    # noise-limited boundary recovery: most boundaries close, half exact-ish
    assert (diffs <= 5).mean() > 0.9, (diffs <= 5).mean()
    assert (diffs <= 1).mean() > 0.5, (diffs <= 1).mean()
    assert np.median(recovered - true_rel) == 0
    # good signal match
    assert res.sig_match_score < config.SIG_MATCH_THRESH[
        config.DNA_SAMP_TYPE], res.sig_match_score
    # genome seq is the mapped portion of the reference
    ref = fasta.get_seq(read.chrm)
    if read.strand == "+":
        assert res.genome_seq == ref[read.start:read.end]


def test_single_read_rev(setup):
    rng, model, fasta, aligner = setup
    read = simulate_read(rng, fasta, model, read_len=600, strand="-")
    res = _run_read(read, model, aligner)
    assert res.segs.shape[0] == len(res.genome_seq) + 1
    assert res.sig_match_score < config.SIG_MATCH_THRESH[
        config.DNA_SAMP_TYPE]
    assert res.genome_loc.strand == "-"


def test_short_read_static_band(setup):
    """Reads too short for start discovery take the static-band path."""
    rng, model, fasta, aligner = setup
    read = simulate_read(rng, fasta, model, read_len=120, strand="+",
                         adapter_len=(20, 40))
    res = _run_read(read, model, aligner)
    assert res.segs.shape[0] == len(res.genome_seq) + 1
    assert res.sig_match_score < 2.0


def test_rna_read(setup):
    rng, _, _, _ = setup
    model = KmerModel.load_default(config.RNA_SAMP_TYPE)
    fasta = random_reference(np.random.default_rng(5), 20000)
    aligner = ExactAligner(fasta)
    # long enough for the RNA start-discovery band (start_bw 1000 events)
    read = simulate_read(rng, fasta, model, read_len=1700, strand="+",
                         mean_dwell=12.0, rev_sig=True,
                         adapter_len=(600, 900))
    res = _run_read(read, model, aligner, config.RNA_SAMP_TYPE)
    assert res.segs.shape[0] == len(res.genome_seq) + 1
    assert res.sig_match_score < config.SIG_MATCH_THRESH[
        config.RNA_SAMP_TYPE], res.sig_match_score


def test_dp_debug_dump(setup, tmp_path, monkeypatch):
    """TOMBO_TPU_DEBUG_DP dumps the DP internals per read and the plot
    script renders them (reference: tombo/resquiggle.py:83-307 _DEBUG_*)."""
    import glob
    import subprocess
    import sys

    rng, model, fasta, aligner = setup
    dump_dir = str(tmp_path / "dp_dumps")
    monkeypatch.setenv("TOMBO_TPU_DEBUG_DP", dump_dir)
    read = simulate_read(rng, fasta, model, read_len=1500, strand="+",
                         read_id="dbg_read")
    _run_read(read, model, aligner)
    fns = glob.glob(dump_dir + "/dp_debug.*.npz")
    assert len(fns) == 1
    d = np.load(fns[0])
    # traced path is inside the band everywhere and margins agree
    assert int(d["bandwidth"]) > 0
    margins = np.minimum(d["lower_margin"], d["upper_margin"])
    assert margins.min() >= 0
    assert d["fwd_pass"].shape[1] == int(d["bandwidth"])

    out_pdf = str(tmp_path / "dp.pdf")
    subprocess.run(
        [sys.executable, "scripts/debug_dp_plot.py", dump_dir, out_pdf],
        check=True, cwd="/root/repo",
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    with open(out_pdf, "rb") as fp:
        assert fp.read(5) == b"%PDF-"
