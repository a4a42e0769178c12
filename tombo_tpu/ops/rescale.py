"""Device-side sequence-fitted rescaling: exact batched Theil-Sen.

The reference computes, per read, the median of all O(n^2/2) pairwise
slopes between observed event means and model levels plus the median
intercept (reference: tombo/_c_helper.pyx:362 ``c_compute_slopes``,
tombo/tombo_stats.py:370-419 ``calc_kmer_fitted_shift_scale``).  The
round-1 build ran this on the host (threaded C++); on a 4-core host it is
the single largest finalize cost (~1 ms/read).  This module moves it onto
the device:

* pairwise slopes are never materialized: the median is found by a
  bitwise binary search over the *float bit pattern* space (monotone
  unsigned key), each round recomputing the slopes in a fused
  broadcast-compare-count pass (32 rounds for f32, 64 for f64) — an
  exact selection, not an approximation;
* both middle order statistics (numpy even-length median semantics) are
  found in the same rounds;
* the O(n) intercept median uses a plain masked sort.

Everything is batch-parallel over reads and jit/shard_map friendly
(fixed trip counts, static shapes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _float_to_key(x):
    """Order-preserving unsigned-integer key of a float array."""
    if x.dtype == jnp.float64:
        u = lax.bitcast_convert_type(x, jnp.int64)
        sign = jnp.int64(-2 ** 63)
        mask = jnp.where(u < 0, jnp.int64(-1), sign)
        return lax.bitcast_convert_type(u ^ mask, jnp.uint64)
    u = lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    sign = jnp.int32(-2 ** 31)
    mask = jnp.where(u < 0, jnp.int32(-1), sign)
    return lax.bitcast_convert_type(u ^ mask, jnp.uint32)


def _key_to_float(k, dtype):
    """Inverse of :func:`_float_to_key`."""
    if dtype == jnp.float64:
        ki = lax.bitcast_convert_type(k.astype(jnp.uint64), jnp.int64)
        sign = jnp.int64(-2 ** 63)
        mask = jnp.where(ki < 0, sign, jnp.int64(-1))
        return lax.bitcast_convert_type(ki ^ mask, jnp.float64)
    ki = lax.bitcast_convert_type(k.astype(jnp.uint32), jnp.int32)
    sign = jnp.int32(-2 ** 31)
    mask = jnp.where(ki < 0, sign, jnp.int32(-1))
    return lax.bitcast_convert_type(ki ^ mask, jnp.float32)


def pairwise_slope_median(ev, mod, n_pts, max_slope):
    """Per-read median of all-pairs slopes, without materializing pairs.

    ev, mod: (B, N) point sets (first ``n_pts[b]`` valid per read).
    Returns (B,) median slopes with numpy semantics (mean of the two
    middle order statistics for an even pair count); pairs with equal
    event means contribute ``max_slope``
    (reference: tombo/_c_helper.pyx:362-377).
    """
    dtype = ev.dtype
    B, N = ev.shape
    uint = jnp.uint64 if dtype == jnp.float64 else jnp.uint32
    n_bits = 64 if dtype == jnp.float64 else 32
    n = n_pts.astype(jnp.int64)
    m = n * (n - 1) // 2                       # valid pair count
    k_lo = jnp.maximum((m - 1) // 2, 0)        # 0-based middle order stats
    k_hi = m // 2

    iot = jnp.arange(N, dtype=jnp.int32)
    pair_valid = ((iot[None, :, None] < iot[None, None, :]) &
                  (iot[None, None, :] < n_pts[:, None, None]))

    # keys materialized ONCE (B*N^2 ints in HBM): each selection round then
    # re-reads them instead of re-dividing — on TPU the 2*n_bits masked
    # count-reductions are bandwidth-bound fusions over this buffer
    de = ev[:, :, None] - ev[:, None, :]
    dm = mod[:, :, None] - mod[:, None, :]
    s = jnp.where(de == 0, jnp.asarray(max_slope, dtype), dm / de)
    keys = jnp.where(pair_valid, _float_to_key(s),
                     jnp.zeros((), jnp.uint64 if dtype == jnp.float64
                               else jnp.uint32))

    def count_le(mid):
        """#{valid pair keys <= mid} per read; mid (B,) uint."""
        le = pair_valid & (keys <= mid[:, None, None])
        return jnp.sum(le, axis=(1, 2)).astype(jnp.int64)

    top = ~jnp.zeros((B,), uint)

    def body(_, carry):
        lo1, hi1, lo2, hi2 = carry
        mid1 = lo1 + (hi1 - lo1) // 2
        mid2 = lo2 + (hi2 - lo2) // 2
        c1 = count_le(mid1)
        c2 = count_le(mid2)
        lo1 = jnp.where(c1 >= k_lo + 1, lo1, mid1 + 1)
        hi1 = jnp.where(c1 >= k_lo + 1, mid1, hi1)
        lo2 = jnp.where(c2 >= k_hi + 1, lo2, mid2 + 1)
        hi2 = jnp.where(c2 >= k_hi + 1, mid2, hi2)
        return lo1, hi1, lo2, hi2

    zero = jnp.zeros((B,), uint)
    lo1, hi1, lo2, hi2 = lax.fori_loop(
        0, n_bits, body, (zero, top, zero, top))
    v_lo = _key_to_float(hi1, dtype).astype(dtype)
    v_hi = _key_to_float(hi2, dtype).astype(dtype)
    med = jnp.where(m % 2 == 1, v_hi, (v_lo + v_hi) / 2)
    return jnp.where(m > 0, med, jnp.zeros((), dtype))


def masked_median_sorted(vals, n_valid):
    """Per-read numpy-style median of the first ``n_valid`` entries."""
    dtype = vals.dtype
    B, N = vals.shape
    iot = jnp.arange(N, dtype=jnp.int32)
    big = jnp.asarray(jnp.inf, dtype)
    v = jnp.where(iot[None, :] < n_valid[:, None], vals, big)
    v = jnp.sort(v, axis=1)
    n = n_valid.astype(jnp.int32)
    k_lo = jnp.maximum((n - 1) // 2, 0)
    k_hi = n // 2
    g = lambda k: jnp.take_along_axis(v, k[:, None], axis=1)[:, 0]
    v_lo, v_hi = g(k_lo), g(k_hi)
    med = jnp.where(n % 2 == 1, v_hi, (v_lo + v_hi) / 2)
    return jnp.where(n > 0, med, jnp.zeros((), dtype))


def pairwise_slope_median_recompute(ev, mod, n_pts, max_slope):
    """Same selection as :func:`pairwise_slope_median`, but the pairwise
    slope keys are recomputed inside every selection round instead of
    materialized to HBM: XLA fuses the broadcast-subtract-divide-compare
    -count into one pass, so the (B, N, N) intermediate never exists in
    memory.  Compute-bound instead of bandwidth-bound — the right trade
    when the fit runs fused inside a larger device program."""
    dtype = ev.dtype
    B, N = ev.shape
    uint = jnp.uint64 if dtype == jnp.float64 else jnp.uint32
    n_bits = 64 if dtype == jnp.float64 else 32
    n = n_pts.astype(jnp.int64)
    m = n * (n - 1) // 2
    k_lo = jnp.maximum((m - 1) // 2, 0)
    k_hi = m // 2

    iot = jnp.arange(N, dtype=jnp.int32)

    def counts(mid1, mid2):
        pair_valid = ((iot[None, :, None] < iot[None, None, :]) &
                      (iot[None, None, :] < n_pts[:, None, None]))
        de = ev[:, :, None] - ev[:, None, :]
        dm = mod[:, :, None] - mod[:, None, :]
        s = jnp.where(de == 0, jnp.asarray(max_slope, dtype), dm / de)
        keys = jnp.where(pair_valid, _float_to_key(s), jnp.zeros((), uint))
        c1 = jnp.sum(pair_valid & (keys <= mid1[:, None, None]),
                     axis=(1, 2)).astype(jnp.int64)
        c2 = jnp.sum(pair_valid & (keys <= mid2[:, None, None]),
                     axis=(1, 2)).astype(jnp.int64)
        return c1, c2

    top = ~jnp.zeros((B,), uint)

    def body(_, carry):
        lo1, hi1, lo2, hi2 = carry
        mid1 = lo1 + (hi1 - lo1) // 2
        mid2 = lo2 + (hi2 - lo2) // 2
        c1, c2 = counts(mid1, mid2)
        lo1 = jnp.where(c1 >= k_lo + 1, lo1, mid1 + 1)
        hi1 = jnp.where(c1 >= k_lo + 1, mid1, hi1)
        lo2 = jnp.where(c2 >= k_hi + 1, lo2, mid2 + 1)
        hi2 = jnp.where(c2 >= k_hi + 1, mid2, hi2)
        return lo1, hi1, lo2, hi2

    zero = jnp.zeros((B,), uint)
    _, hi1, _, hi2 = lax.fori_loop(0, n_bits, body, (zero, top, zero, top))
    v_lo = _key_to_float(hi1, dtype).astype(dtype)
    v_hi = _key_to_float(hi2, dtype).astype(dtype)
    med = jnp.where(m % 2 == 1, v_hi, (v_lo + v_hi) / 2)
    return jnp.where(m > 0, med, jnp.zeros((), dtype))


def theil_sen_device(ev, mod, n_pts, max_slope=1000.0, block=0):
    """Batched Theil-Sen fit on device: (slopes, intercepts), matching
    the host estimator (native theil_sen_batch / reference
    tombo/tombo_stats.py:413-419): slope = median pairwise slope,
    intercept = median(mod - slope * ev).

    ``block > 0`` runs the slope selection over read blocks of that size
    via ``lax.map`` with materialized pair keys (bounds the HBM pair
    buffer to block*N*N ints while each round re-reads instead of
    re-divides); ``block = 0`` recomputes keys per round with no pair
    buffer at all (fused; the default inside larger device programs)."""
    if block and ev.shape[0] > block:
        B, N = ev.shape
        nb = -(-B // block)
        pad = nb * block - B
        evp = jnp.pad(ev, ((0, pad), (0, 0)))
        modp = jnp.pad(mod, ((0, pad), (0, 0)))
        npp = jnp.pad(n_pts, (0, pad))
        slope = lax.map(
            lambda args: pairwise_slope_median(*args, max_slope),
            (evp.reshape(nb, block, N), modp.reshape(nb, block, N),
             npp.reshape(nb, block))).reshape(-1)[:B]
    elif block:
        slope = pairwise_slope_median(ev, mod, n_pts, max_slope)
    else:
        slope = pairwise_slope_median_recompute(ev, mod, n_pts, max_slope)
    inters = mod - slope[:, None] * ev
    inter = masked_median_sorted(inters, n_pts)
    return slope, inter
