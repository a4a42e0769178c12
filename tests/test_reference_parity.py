"""Direct A/B parity against the reference implementation's pure-Python
math (VERDICT round 2, next-round item 5).

Every test here EXECUTES code imported from /root/reference (via
tests/reference_shim.py) on random inputs and compares against the
tombo_tpu implementation.  Cython kernels the reference paths reach are
patched with tiny numpy oracles written from the .pyx sources — so these
tests verify the reference's surrounding Python math, not a re-statement
of it.
"""
import numpy as np
import pytest

from reference_shim import (load_reference, np_apply_outlier_thresh,
                            np_compute_running_pctl_diffs,
                            np_compute_slopes, patch_c_helper)

from tombo_tpu import config
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline import resquiggle as rsq
from tombo_tpu.stats import kernels
from tombo_tpu.types import ScaleValues


@pytest.fixture(scope="module")
def ref():
    ts, th, dp = load_reference()
    return ts, th, dp


# ---------------------------------------------------------------------------
# normalize_raw_signal (reference: tombo/tombo_stats.py:482-573)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("norm_type,outlier", [
    ("median", None), ("median", 5.0), ("none", None),
    ("median_const_scale", 5.0), ("robust_median", 5.0)])
def test_normalize_raw_signal_parity(ref, norm_type, outlier):
    ts, th, _ = ref
    rng = np.random.default_rng(3)
    raw = rng.normal(450, 60, 5000).round().astype(np.float64)
    kw = dict(read_start_rel_to_raw=37, read_obs_len=4200,
              norm_type=norm_type, outlier_thresh=outlier)
    if norm_type == "median_const_scale":
        kw["const_scale"] = 42.5
    with patch_c_helper(c_apply_outlier_thresh=np_apply_outlier_thresh):
        r_sig, r_sv = ts.normalize_raw_signal(raw, **kw)
    t_sig, t_sv = rsq.normalize_raw_signal(raw, **kw)
    np.testing.assert_array_equal(t_sig, r_sig)
    assert float(t_sv.shift) == float(r_sv.shift)
    assert float(t_sv.scale) == float(r_sv.scale)
    if outlier is not None:
        assert float(t_sv.lower_lim) == float(r_sv.lower_lim)
        assert float(t_sv.upper_lim) == float(r_sv.upper_lim)


def test_normalize_with_provided_scale_values_parity(ref):
    ts, th, _ = ref
    rng = np.random.default_rng(4)
    raw = rng.normal(450, 60, 3000).round().astype(np.float64)
    r_sv = th.scaleValues(440.0, 55.0, -4.5, 4.5, None)
    t_sv = ScaleValues(440.0, 55.0, -4.5, 4.5, None)
    with patch_c_helper(c_apply_outlier_thresh=np_apply_outlier_thresh):
        r_sig, _ = ts.normalize_raw_signal(raw, scale_values=r_sv)
    t_sig, _ = rsq.normalize_raw_signal(raw, scale_values=t_sv)
    np.testing.assert_array_equal(t_sig, r_sig)


def test_normalize_pa_raw_parity(ref):
    ts, th, _ = ref
    rng = np.random.default_rng(5)
    raw = rng.integers(200, 800, 2000).astype(np.float64)
    r_ci = th.channelInfo(-210.5, 1400.0, 8192.0, 1, 4000)
    from tombo_tpu.types import ChannelInfo
    t_ci = ChannelInfo(-210.5, 1400.0, 8192.0, 1, 4000)
    r_sig, r_sv = ts.normalize_raw_signal(raw, norm_type="pA_raw",
                                          channel_info=r_ci)
    t_sig, t_sv = rsq.normalize_raw_signal(raw, norm_type="pA_raw",
                                           channel_info=t_ci)
    np.testing.assert_array_equal(t_sig, r_sig)
    assert float(t_sv.shift) == float(r_sv.shift)
    assert float(t_sv.scale) == float(r_sv.scale)


# ---------------------------------------------------------------------------
# calc_kmer_fitted_shift_scale (reference: tombo/tombo_stats.py:370-419)
# ---------------------------------------------------------------------------

def test_theil_sen_fit_parity(ref):
    """Reference Theil-Sen rescale (with the .pyx slope oracle) vs the
    native batched estimator used by the production lane."""
    ts, _, _ = ref
    from tombo_tpu.native import theil_sen_batch
    rng = np.random.default_rng(6)
    n = 400                       # below MAX_POINTS_FOR_THEIL_SEN: no
    B = 8                         # random subsampling inside the reference
    ev = rng.normal(0, 1, (B, n))
    mod = ev * 1.08 + 0.12 + rng.normal(0, 0.25, (B, n))
    slopes, inters = theil_sen_batch(
        np.pad(ev, ((0, 0), (0, 0))), mod, np.full(B, n, np.int64))
    with patch_c_helper(c_compute_slopes=np_compute_slopes):
        for b in range(B):
            shift, scale, shift_corr, scale_corr = \
                ts.calc_kmer_fitted_shift_scale(
                    1.5, 2.0, ev[b], mod[b], method="theil_sen")
            t_scale_corr = 1.0 / slopes[b]
            t_shift_corr = -inters[b] / slopes[b]
            assert abs(t_scale_corr - scale_corr) < 1e-9 * abs(scale_corr)
            assert abs(t_shift_corr - shift_corr) < 1e-9 * max(
                abs(shift_corr), 1e-3)
            # the reference's shift/scale composition rule
            assert abs((1.5 + shift_corr * 2.0) - shift) < 1e-12
            assert abs(2.0 * scale_corr - scale) < 1e-12


def test_mom_fit_parity(ref):
    """Method-of-moments fitted scaling (pure numpy in the reference) vs
    this build's pA-normalization fit."""
    ts, _, _ = ref
    rng = np.random.default_rng(7)
    n = 300
    ev = rng.normal(100, 12, n)
    mod = (ev - 5.0) / 1.4 + rng.normal(0, 0.5, n)
    inv_var = 1.0 / rng.uniform(0.05, 0.3, n) ** 2
    r = ts.calc_kmer_fitted_shift_scale(10.0, 3.0, ev, mod, inv_var,
                                        method="mom")
    t = rsq.calc_kmer_fitted_shift_scale(10.0, 3.0, ev, mod, inv_var,
                                         method="mom")
    np.testing.assert_allclose(t, r, rtol=1e-12)


# ---------------------------------------------------------------------------
# identify_stalls (reference: tombo/tombo_stats.py:269-368)
# ---------------------------------------------------------------------------

def _stall_signal(rng, n=20000):
    sig = rng.normal(90, 10, n)
    sig[n // 5:n // 5 + n // 10] = rng.normal(90, 0.4, n // 10)  # a stall
    sig[int(n * 0.6):int(n * 0.6) + n // 25] = \
        rng.normal(90, 0.3, n // 25)                             # another
    return sig


def test_identify_stalls_mean_diff_parity(ref):
    ts, th, r_dp = ref
    rng = np.random.default_rng(8)
    sig = _stall_signal(rng)
    r_params = th.stallParams(**r_dp.STALL_PARAMS)
    t_params = config.DEFAULT_STALL_PARAMS
    r_ints, r_metric = ts.identify_stalls(sig, r_params,
                                          return_metric=True)
    t_ints, t_metric = rsq.identify_stalls(sig, t_params,
                                           return_metric=True)
    np.testing.assert_allclose(t_metric, r_metric, rtol=1e-10,
                               equal_nan=True)
    assert [tuple(i) for i in t_ints] == [tuple(i) for i in r_ints]


def test_identify_stalls_percentile_parity(ref):
    ts, th, r_dp = ref
    rng = np.random.default_rng(9)
    sig = _stall_signal(rng, 8000).astype(np.int16).astype(np.float64)
    r_params = th.stallParams(**r_dp.PCTL_STALL_PARAMS)
    t_params = config.PCTL_STALL_PARAMS
    with patch_c_helper(
            c_compute_running_pctl_diffs=np_compute_running_pctl_diffs):
        r_ints = ts.identify_stalls(sig, r_params)
    t_ints = rsq.identify_stalls(sig, t_params)
    assert [tuple(i) for i in t_ints] == [tuple(i) for i in r_ints]


# ---------------------------------------------------------------------------
# derived DP parameters + defaults (reference: tombo/tombo_stats.py:2364,
# tombo/_default_parameters.py)
# ---------------------------------------------------------------------------

def test_get_dynamic_prog_params_parity(ref):
    ts, _, _ = ref
    for ev in (1.0, 4.2, 5.0, 6.0, 0.25):
        r_z, r_sp = ts.get_dynamic_prog_params(ev)
        t_z, t_sp = config.get_dynamic_prog_params(ev)
        assert t_z == r_z and t_sp == r_sp


def test_default_parameter_tables_match(ref):
    from dataclasses import astuple
    _, _, r_dp = ref
    for samp in ("DNA", "RNA"):
        assert astuple(config.SEG_PARAMS_TABLE[samp]) == \
            tuple(r_dp.SEG_PARAMS_TABLE[samp])
        assert astuple(config.ALGN_PARAMS_TABLE[samp]) == \
            tuple(r_dp.ALGN_PARAMS_TABLE[samp])
    assert config.OUTLIER_THRESH == r_dp.OUTLIER_THRESH
    assert config.MAX_POINTS_FOR_THEIL_SEN == r_dp.MAX_POINTS_FOR_THEIL_SEN
    assert config.MEAN_PRIOR_CONST == r_dp.MEAN_PRIOR_CONST
    assert config.SD_PRIOR_CONST == r_dp.SD_PRIOR_CONST
    assert config.OCLLHR_SCALE == r_dp.OCLLHR_SCALE
    assert config.OCLLHR_HEIGHT == r_dp.OCLLHR_HEIGHT
    assert config.OCLLHR_POWER == r_dp.OCLLHR_POWER
    assert config.FM_OFFSET_DEFAULT == r_dp.FM_OFFSET_DEFAULT
    assert tuple(config.COV_DAMP_COUNTS) == tuple(r_dp.COV_DAMP_COUNTS)
    assert config.HALF_NORM_EXPECTED_VAL == pytest.approx(
        load_reference()[0].HALF_NORM_EXPECTED_VAL, abs=1e-13)
    for samp in ("DNA", "RNA"):
        assert config.SIG_MATCH_THRESH[samp] == \
            r_dp.SIG_MATCH_THRESH[samp]
        assert config.DE_NOVO_THRESH[samp] == r_dp.DE_NOVO_THRESH[samp]
        assert config.SAMP_COMP_THRESH[samp] == \
            r_dp.SAMP_COMP_THRESH[samp]
    assert config.LLR_THRESH == r_dp.LLR_THRESH


def test_compute_num_events_parity(ref):
    ts, _, _ = ref
    rng = np.random.default_rng(10)
    for _ in range(50):
        sig_len = int(rng.integers(1000, 200000))
        seq_len = int(rng.integers(50, 5000))
        mo = float(rng.uniform(2, 30))
        assert rsq.compute_num_events(sig_len, seq_len, mo) == \
            ts.compute_num_events(sig_len, seq_len, mo)
    # min_event_to_seq_ratio branch
    assert rsq.compute_num_events(10000, 900, 20, 1.1) == \
        ts.compute_num_events(10000, 900, 20, 1.1)


# ---------------------------------------------------------------------------
# detection-side pure math (reference: tombo/tombo_stats.py:2252-2553)
# ---------------------------------------------------------------------------

def test_calc_window_fishers_method_parity(ref):
    ts, _, _ = ref
    rng = np.random.default_rng(11)
    pvals = rng.uniform(1e-12, 1, 500)
    pvals[40:60] = np.nan
    for lag in (1, 3):
        r = ts.calc_window_fishers_method(pvals.copy(), lag)
        t = kernels.calc_window_fishers_method(pvals.copy(), lag)
        np.testing.assert_allclose(t, r, rtol=1e-10, equal_nan=True)


def test_calc_damp_fraction_parity(ref):
    ts, _, _ = ref
    rng = np.random.default_rng(12)
    valid_cov = rng.integers(1, 60, 200)
    fracs = rng.uniform(0, 1, 200)
    r = ts.calc_damp_fraction({"unmod": 2, "mod": 0}, fracs, valid_cov)
    t = kernels.calc_damp_fraction((2, 0), fracs, valid_cov)
    np.testing.assert_allclose(t, r, rtol=1e-12)


# ---------------------------------------------------------------------------
# bundled model files + motif engine (reference: tombo/tombo_stats.py:580,
# tombo/tombo_helper.py:542)
# ---------------------------------------------------------------------------

def test_bundled_model_parity(ref):
    """The reference's own TomboModel loader reading its bundled HDF5
    model vs this build's converted .npz: identical k-mer tables."""
    ts, _, _ = ref
    r_model = ts.TomboModel(seq_samp_type=ts.th.seqSampleType("DNA", False))
    t_model = KmerModel.load_default("DNA")
    assert t_model.central_pos == r_model.central_pos
    assert t_model.kmer_width == r_model.kmer_width
    kmers = sorted(r_model.means.keys())
    r_means = np.array([r_model.means[k] for k in kmers])
    r_sds = np.array([r_model.sds[k] for k in kmers])
    t_codes = t_model.get_kmer_codes_from_kmers(kmers) \
        if hasattr(t_model, "get_kmer_codes_from_kmers") else None
    if t_codes is None:
        from tombo_tpu.seq import encode_seq, seq_to_kmer_codes
        t_codes = np.array([
            int(seq_to_kmer_codes(encode_seq(k), t_model.kmer_width)[0])
            for k in kmers])
    np.testing.assert_array_equal(t_model.means[t_codes], r_means)
    np.testing.assert_array_equal(t_model.sds[t_codes], r_sds)


def test_tombo_motif_parity(ref):
    _, th, _ = ref
    from tombo_tpu.seq import TomboMotif
    rng = np.random.default_rng(13)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 5000))
    for motif, pos in (("CCWGG", 2), ("GATC", 2), ("CG", 1), ("DRACH", 3)):
        r_m = th.TomboMotif(motif, pos)
        t_m = TomboMotif(motif, pos)
        r_hits = [m.start() for m in r_m.motif_pat.finditer(seq)]
        t_hits = [m.start() for m in t_m.motif_pat.finditer(seq)]
        assert r_hits == t_hits, motif
        r_rc = [m.start() for m in r_m.rev_comp_pat.finditer(seq)]
        t_rc = [m.start() for m in t_m.rev_comp_pat.finditer(seq)]
        assert r_rc == t_rc, motif
        assert t_m.is_palindrome == r_m.is_palindrome
