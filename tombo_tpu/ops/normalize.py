"""Batched signal normalization on device.

TPU equivalent of the reference's per-read numpy normalization
(reference: tombo/tombo_stats.py:482-573 ``normalize_raw_signal``): reads are
padded into (B, S) batches with true lengths carried separately; medians/MADs
are computed with masked sorts so padding never leaks into statistics.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .precision import seq_cumsum

POS_LARGE = 1e30


def masked_median(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Median over the first ``n`` entries of each padded row.

    Matches numpy median semantics (mean of the two central order statistics
    for even ``n``).  x: (B, S), n: (B,) -> (B,).
    """
    B, S = x.shape
    idx = jnp.arange(S)[None, :]
    masked = jnp.where(idx < n[:, None], x, POS_LARGE)
    s = jnp.sort(masked, axis=1)
    lo = (n - 1) // 2
    hi = n // 2
    lo_v = jnp.take_along_axis(s, lo[:, None], axis=1)[:, 0]
    hi_v = jnp.take_along_axis(s, hi[:, None], axis=1)[:, 0]
    return (lo_v + hi_v) * 0.5


def masked_mad(x: jnp.ndarray, med: jnp.ndarray, n: jnp.ndarray
               ) -> jnp.ndarray:
    """Median absolute deviation about ``med`` over the first ``n`` entries."""
    return masked_median(jnp.abs(x - med[:, None]), n)


@functools.partial(jax.jit, static_argnames=("outlier_thresh",))
def normalize_median_batch(raw: jnp.ndarray, sig_lens: jnp.ndarray,
                           outlier_thresh: Optional[float] = None):
    """Median/MAD normalization with optional winsorizing.

    Reference behavior (tombo/tombo_stats.py:540-542 'median' branch +
    :556-570 winsorizing): shift = median(signal), scale = MAD; the outlier
    limits are computed from the *normalized* signal's median/MAD.

    Returns (norm, shift, scale, lower_lim, upper_lim); padding positions of
    ``norm`` are zeroed.
    """
    shift = masked_median(raw, sig_lens)
    scale = masked_mad(raw, shift, sig_lens)
    norm = (raw - shift[:, None]) / scale[:, None]
    if outlier_thresh is not None:
        read_med = masked_median(norm, sig_lens)
        read_mad = masked_mad(norm, read_med, sig_lens)
        lower = read_med - read_mad * outlier_thresh
        upper = read_med + read_mad * outlier_thresh
        norm = jnp.clip(norm, lower[:, None], upper[:, None])
    else:
        lower = jnp.full(shift.shape, jnp.nan, raw.dtype)
        upper = jnp.full(shift.shape, jnp.nan, raw.dtype)
    idx = jnp.arange(raw.shape[1])[None, :]
    norm = jnp.where(idx < sig_lens[:, None], norm, 0.0)
    return norm, shift, scale, lower, upper


@jax.jit
def normalize_with_scale_batch(raw: jnp.ndarray, sig_lens: jnp.ndarray,
                               shift: jnp.ndarray, scale: jnp.ndarray,
                               lower: jnp.ndarray, upper: jnp.ndarray):
    """Apply externally-supplied scale values (reference: tombo_stats.py:550-
    570 ``scale_values`` branch).  NaN limits disable winsorizing."""
    norm = (raw - shift[:, None]) / scale[:, None]
    do_clip = ~jnp.isnan(lower) & ~jnp.isnan(upper)
    lo = jnp.where(do_clip, lower, -POS_LARGE)
    hi = jnp.where(do_clip, upper, POS_LARGE)
    norm = jnp.clip(norm, lo[:, None], hi[:, None])
    idx = jnp.arange(raw.shape[1])[None, :]
    return jnp.where(idx < sig_lens[:, None], norm, 0.0)


@jax.jit
def compute_base_means_batch(norm: jnp.ndarray, segs: jnp.ndarray,
                             n_segs: jnp.ndarray) -> jnp.ndarray:
    """Per-segment means via cumulative-sum differences, batched.

    Device equivalent of the per-segment mean kernel
    (reference: tombo/_c_helper.pyx:59 ``c_new_means``).

    norm: (B, S) padded signal; segs: (B, E+1) padded boundary positions
    (monotone within the first ``n_segs+1`` entries); n_segs: (B,) number of
    valid segments.  Returns (B, E) means; invalid segments produce 0.
    """
    cs = seq_cumsum(norm, axis=1)
    cs = jnp.concatenate([jnp.zeros((norm.shape[0], 1), norm.dtype), cs],
                         axis=1)
    seg_sum = (jnp.take_along_axis(cs, segs[:, 1:], axis=1) -
               jnp.take_along_axis(cs, segs[:, :-1], axis=1))
    lens = (segs[:, 1:] - segs[:, :-1]).astype(norm.dtype)
    valid = (jnp.arange(segs.shape[1] - 1)[None, :] < n_segs[:, None]) & \
        (lens > 0)
    return jnp.where(valid, seg_sum / jnp.where(lens > 0, lens, 1.0), 0.0)


@jax.jit
def compute_base_mean_stds_batch(norm: jnp.ndarray, segs: jnp.ndarray,
                                 n_segs: jnp.ndarray):
    """Per-segment means and population SDs
    (device equivalent of reference: tombo/_c_helper.pyx:38
    ``c_new_mean_stds``)."""
    B = norm.shape[0]
    z = jnp.zeros((B, 1), norm.dtype)
    cs = jnp.concatenate([z, seq_cumsum(norm, axis=1)], axis=1)
    cs2 = jnp.concatenate([z, seq_cumsum(norm * norm, axis=1)], axis=1)
    lens = (segs[:, 1:] - segs[:, :-1]).astype(norm.dtype)
    safe_lens = jnp.where(lens > 0, lens, 1.0)
    seg_sum = (jnp.take_along_axis(cs, segs[:, 1:], axis=1) -
               jnp.take_along_axis(cs, segs[:, :-1], axis=1))
    seg_sum2 = (jnp.take_along_axis(cs2, segs[:, 1:], axis=1) -
                jnp.take_along_axis(cs2, segs[:, :-1], axis=1))
    means = seg_sum / safe_lens
    var = jnp.maximum(seg_sum2 / safe_lens - means * means, 0.0)
    valid = (jnp.arange(segs.shape[1] - 1)[None, :] < n_segs[:, None]) & \
        (lens > 0)
    means = jnp.where(valid, means, 0.0)
    stds = jnp.where(valid, jnp.sqrt(var), 0.0)
    return means, stds
