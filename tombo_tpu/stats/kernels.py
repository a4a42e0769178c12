"""Vectorized statistical kernels for modified-base detection.

Numpy implementations of the reference's per-site/per-read statistics with
identical semantics (reference: tombo/tombo_stats.py:2252-2340 and
tombo/_c_helper.pyx:277-358).  The per-read model tests operate on whole
(reads x positions) matrices at once instead of the reference's per-read
Python loops; the batched entry points in detect.py feed them padded
region blocks.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import stats as sps

from .. import config
from ..errors import TomboTpuError

SMALLEST_PVAL = 1e-50


def pvals_from_z(z: np.ndarray) -> np.ndarray:
    """Two-sided p-values from |z| scores (NaN passthrough)
    (reference: tombo/tombo_stats.py:3744-3753)."""
    out = np.full(z.shape, np.nan)
    valid = ~np.isnan(z)
    out[valid] = sps.norm.cdf(-np.abs(z[valid])) * 2.0
    return out


def calc_window_fishers_method(pvals: np.ndarray, lag: int) -> np.ndarray:
    """Fisher's method over a sliding window of +-lag positions
    (reference: tombo/tombo_stats.py:2252-2271).  Positions within ``lag``
    of either edge become NaN."""
    assert lag > 0, "Invalid p-value window provided."
    width = lag * 2 + 1
    if pvals.shape[-1] < width:
        # TomboTpuError so per-read loops skip the read, matching the
        # reference's th.TomboError (tombo/tombo_stats.py:2258): a read
        # overlapping a test region by fewer bases than the window is
        # skipped, not fatal
        raise TomboTpuError(
            "P-values vector too short for Fisher's Method window "
            "computation.")
    with np.errstate(invalid="ignore"):
        pvals = np.maximum(pvals, SMALLEST_PVAL)
    # per-window sums (NOT a cumsum difference): a NaN p-value must only
    # poison the windows containing it — the cumsum trick would NaN every
    # window downstream of it (reference: tombo/tombo_stats.py:2262-2266
    # strided window sums; A/B-checked in tests/test_reference_parity.py)
    log_sums = np.lib.stride_tricks.sliding_window_view(
        np.log(pvals), width, axis=-1).sum(-1)
    f_pvals = np.full(pvals.shape, np.nan)
    with np.errstate(invalid="ignore"):
        f_pvals[..., lag:-lag] = sps.chi2.sf(log_sums * -2, width * 2)
    return f_pvals


def calc_window_means(stat: np.ndarray, lag: int) -> np.ndarray:
    """Sliding-window mean (reference: tombo/tombo_stats.py:2273-2287)."""
    assert lag > 0
    width = lag * 2 + 1
    if stat.shape[-1] < width:
        raise TomboTpuError(
            "Statistics vector too short for window mean.")
    m = np.full(stat.shape, np.nan)
    m[..., lag:-lag] = np.lib.stride_tricks.sliding_window_view(
        stat, width, axis=-1).mean(-1)
    return m


def calc_damp_fraction(cov_damp_counts: Tuple[float, float],
                       fracs: np.ndarray, valid_cov: np.ndarray
                       ) -> np.ndarray:
    """Beta-prior dampened un-modified fraction
    (reference: tombo/tombo_stats.py:2537-2553); cov_damp_counts is
    (unmod, mod)."""
    non_mod_counts = np.round(fracs * valid_cov)
    return (non_mod_counts + cov_damp_counts[0]) / (
        valid_cov + cov_damp_counts[0] + cov_damp_counts[1])


# --------------------------------------------------------------------------
# Likelihood ratios (reference: tombo/_c_helper.pyx:277-358)
# --------------------------------------------------------------------------

def calc_llh_ratio(reg_means, reg_ref_means, reg_ref_vars,
                   reg_alt_means, reg_alt_vars):
    """Standard LLR; positive -> canonical base fits better
    (reference: tombo/_c_helper.pyx:277 ``c_calc_llh_ratio``).  Accepts
    (..., K) stacked windows and reduces the last axis."""
    return ((np.square(reg_means - reg_alt_means) / reg_alt_vars +
             np.log(reg_alt_vars)).sum(-1) -
            (np.square(reg_means - reg_ref_means) / reg_ref_vars +
             np.log(reg_ref_vars)).sum(-1))


def calc_llh_ratio_const_var(reg_means, reg_ref_means, reg_alt_means,
                             const_var):
    """Constant-variance LLR (reference: tombo/_c_helper.pyx:298)."""
    return (np.square(reg_means - reg_alt_means).sum(-1) -
            np.square(reg_means - reg_ref_means).sum(-1)) / const_var


def calc_scaled_llh_ratio_const_var(
        reg_means, reg_ref_means, reg_alt_means, const_var,
        scale_factor=None, density_height_factor=None,
        density_height_power=None):
    """Outlier-robust scaled LLR, the default alt-model statistic
    (reference: tombo/_c_helper.pyx:313 ``c_calc_scaled_llh_ratio_const_var``
    and docs/modified_base_detection.rst:44-50):

        scaled_llhr = sum_i [ exp(-(m_i-ref_i)^2/(s*v)) -
                              exp(-(m_i-alt_i)^2/(s*v)) ] * h * v^p

    Accepts stacked (..., K) windows."""
    if scale_factor is None:
        scale_factor = config.OCLLHR_SCALE
    if density_height_factor is None:
        density_height_factor = config.OCLLHR_HEIGHT
    if density_height_power is None:
        density_height_power = config.OCLLHR_POWER
    scale_var = const_var * scale_factor
    coef = density_height_factor * np.power(const_var,
                                            density_height_power)
    return ((np.exp(-np.square(reg_means - reg_ref_means) / scale_var) -
             np.exp(-np.square(reg_means - reg_alt_means) / scale_var))
            .sum(-1)) * coef


# --------------------------------------------------------------------------
# Group (level) tests (reference: tombo/tombo_stats.py:4236-4334)
# --------------------------------------------------------------------------

def compute_ks_tests(samp_base_levels, ctrl_base_levels, return_stat):
    """Two-sample KS test (stat or p-value) per site; inputs are
    (positions, max_cov) NaN-padded level matrices
    (reference: tombo/tombo_stats.py:4236-4264)."""
    out = np.empty(samp_base_levels.shape[0])
    for i in range(samp_base_levels.shape[0]):
        s = samp_base_levels[i]
        c = ctrl_base_levels[i]
        s = np.sort(s[~np.isnan(s)])
        c = np.sort(c[~np.isnan(c)])
        sn, cn = s.shape[0], c.shape[0]
        allv = np.concatenate([s, c])
        s_cdf = np.searchsorted(s, allv, side="right") / sn
        c_cdf = np.searchsorted(c, allv, side="right") / cn
        d = np.max(np.abs(s_cdf - c_cdf))
        if return_stat:
            out[i] = 1 - d
        else:
            en = np.sqrt(sn * cn / float(sn + cn))
            out[i] = sps.distributions.kstwobign.sf(
                (en + 0.12 + 0.11 / en) * d)
    return out


def compute_u_tests(samp_base_levels, ctrl_base_levels, return_stat):
    """Mann-Whitney U test (stat or p-value) per site
    (reference: tombo/tombo_stats.py:4266-4300)."""
    out = np.empty(samp_base_levels.shape[0])
    for i in range(samp_base_levels.shape[0]):
        s = samp_base_levels[i]
        c = ctrl_base_levels[i]
        s = np.sort(s[~np.isnan(s)])
        c = np.sort(c[~np.isnan(c)])
        sn, cn = s.shape[0], c.shape[0]
        tot = sn * cn
        allv = np.concatenate([s, c])
        ranks = np.empty(sn + cn, int)
        ranks[allv.argsort()] = np.arange(1, sn + cn + 1)
        u1 = ranks[:sn].sum() - (sn * (sn + 1)) / 2
        u2 = tot - u1
        u = min(u1, u2)
        mu = tot / 2
        if return_stat:
            out[i] = (u - mu) / mu
        else:
            rhou = np.sqrt(tot * (tot + 1) / 12)
            out[i] = sps.norm.cdf((u - mu) / rhou) * 2.0
    return out


def compute_t_tests(samp_base_levels, ctrl_base_levels, return_stat):
    """Two-sample t test (stat or p-value) per site
    (reference: tombo/tombo_stats.py:4302-4334)."""
    out = np.empty(samp_base_levels.shape[0])
    for i in range(samp_base_levels.shape[0]):
        s = samp_base_levels[i]
        c = ctrl_base_levels[i]
        s = s[~np.isnan(s)]
        c = c[~np.isnan(c)]
        sn, cn = s.shape[0], c.shape[0]
        s_mean, s_sd = s.mean(), s.std()
        c_mean, c_sd = c.mean(), c.std()
        if return_stat:
            out[i] = -np.abs(s_mean - c_mean) / np.sqrt(
                (s_sd ** 2 + c_sd ** 2) / 2)
        else:
            sp = np.sqrt((((sn - 1) * s_sd ** 2) + (cn - 1) * c_sd ** 2) /
                         (sn + cn - 2))
            t = -np.abs(s_mean - c_mean) / (sp * np.sqrt(1 / sn + 1 / cn))
            out[i] = sps.t.cdf(t, sn + cn - 2) * 2.0
    return out
