"""Device-side sequence-fitted rescaling: exact batched Theil-Sen.

The reference computes, per read, the median of all O(n^2/2) pairwise
slopes between observed event means and model levels plus the median
intercept (reference: tombo/_c_helper.pyx:362 ``c_compute_slopes``,
tombo/tombo_stats.py:370-419 ``calc_kmer_fitted_shift_scale``).  The
round-1 build ran this on the host (threaded C++); on a 4-core host it is
the single largest finalize cost (~1 ms/read).  This module moves it onto
the device:

* pairwise slopes are selected over the *float bit pattern* space
  (monotone unsigned key) with a multi-way (15-pivot) range search:
  each round counts all pair keys against a per-read pivot grid in ONE
  fused pass, shrinking the candidate key range ~15x per round (10
  rounds for f32, 18 for f64) — an exact selection, not an
  approximation.  Both middle order statistics (numpy even-length
  median semantics) ride the same pass with their own pivot grids, so
  the dominant cost is ``rounds`` passes over the pair keys instead of
  the 2 x 32 bisection passes of the round-2 design;
* pair validity is folded into the keys (invalid pairs get the all-ones
  sentinel, above every achievable slope key), so count passes read one
  buffer with no mask recompute;
* the O(n) intercept median uses a plain masked sort.

Everything is batch-parallel over reads and jit/shard_map friendly
(fixed trip counts, static shapes).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


_N_PIV = 15          # pivots per rank per round (range shrinks ~15x)


def _select_rounds(n_bits: int, n_piv: int = _N_PIV) -> int:
    """Rounds needed for an ``n_piv``-pivot grid to pin an ``n_bits``
    key range down to a single value: width w > n_piv-1 shrinks to at
    most ``w // n_piv + 1`` per round (pivot step), and any w <= n_piv-1
    resolves in one round (the grid covers every integer in the
    range)."""
    w = (1 << n_bits) - 1
    r = 0
    while w > 0:
        w = w // n_piv + 1 if w > n_piv - 1 else 0
        r += 1
    return r            # 9 for 32-bit keys at 15 pivots, 17 for 64-bit


def _dual_rank_select(count_fn, B, uint, n_bits, k_lo, k_hi,
                      n_piv: int = _N_PIV):
    """Exact dual order-statistic selection over unsigned key space.

    ``count_fn(pivots)``: (B, P) uint pivots -> (B, P) int32 counts of
    keys <= pivot per read.  Returns the (k_lo, k_hi)-th smallest keys
    (0-based).  Each round evaluates an ``n_piv``-pivot grid per rank
    (one fused pass over the data for all 2*n_piv pivots), keeping the
    invariant ``target in [lo, hi]`` with ``count(hi) >= k+1``.  Fewer
    pivots per round = more (bandwidth-bound) passes but less compute
    per key; the engines pick their own balance."""
    one = jnp.ones((), uint)
    grid = jnp.arange(n_piv, dtype=uint)[None, :]           # (1, n_piv)

    def pivots_of(lo, hi):
        w = hi - lo
        step = w // n_piv + one                             # ceil-ish
        return jnp.minimum(lo[:, None] + step[:, None] * grid, hi[:, None])

    def update(lo, hi, p, c, k):
        admit = c.astype(jnp.int64) >= (k + 1)[:, None]     # (B, 15)
        top = ~jnp.zeros((), uint)
        hi_new = jnp.minimum(hi, jnp.min(jnp.where(admit, p, top), axis=1))
        lo_new = jnp.maximum(lo, jnp.max(
            jnp.where(admit, jnp.zeros((), uint), p + one), axis=1))
        return lo_new, hi_new

    def body(_, carry):
        lo1, hi1, lo2, hi2 = carry
        p1 = pivots_of(lo1, hi1)
        p2 = pivots_of(lo2, hi2)
        c = count_fn(jnp.concatenate([p1, p2], axis=1))     # (B, 2*n_piv)
        lo1, hi1 = update(lo1, hi1, p1, c[:, :n_piv], k_lo)
        lo2, hi2 = update(lo2, hi2, p2, c[:, n_piv:], k_hi)
        return lo1, hi1, lo2, hi2

    zero = jnp.zeros((B,), uint)
    # the all-ones key is the invalid-pair sentinel; starting hi one
    # below it keeps sentinels out of every count bracket
    top = ~zero - one
    _, hi1, _, hi2 = lax.fori_loop(
        0, _select_rounds(n_bits, n_piv), body, (zero, top, zero, top))
    return hi1, hi2


_PIV_PAD = 32        # pivot lanes per count call (2 ranks x 15, padded)


def _count_le_kernel(P: int, n_chunks: int):
    def kernel(k_ref, p_ref, o_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            o_ref[:, :] = jnp.zeros_like(o_ref)

        tile = k_ref[:, :]                          # (R, C) int32 keys
        parts = [
            jnp.sum((tile <= p_ref[:, p:p + 1]).astype(jnp.int32),
                    axis=1, keepdims=True)
            for p in range(P)]
        o_ref[:, :] = o_ref[:, :] + jnp.concatenate(parts, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _count_le_pallas(keys_i32, pivots_i32, interpret: bool = False):
    """Streaming multi-pivot count: #{keys <= pivot} per (read, pivot).

    keys_i32: (B, M) ORDER-PRESERVING int32 keys (the uint32 slope keys
    xor 0x80000000 — Mosaic's integer compares are signed); pivots_i32:
    (B, P<=32).  One pass over the key buffer counts all pivots at once:
    HBM traffic per selection round is exactly one key-buffer read, which
    is what makes the device Theil-Sen fit bandwidth-bound (~9 rounds
    for f32) instead of the 2x32 XLA bisection passes of round 2."""
    B, M = keys_i32.shape
    P = pivots_i32.shape[1]
    Pp = _round_up_int(P, 8)
    R_BLK = 32
    C = 16384
    Bp = _round_up_int(B, R_BLK)
    Mp = _round_up_int(M, C)
    if Bp != B or Mp != M:
        # pad keys with the maximum key (never <= any real pivot search
        # bracket top, which excludes the sentinel)
        keys_i32 = jnp.pad(keys_i32, ((0, Bp - B), (0, Mp - M)),
                           constant_values=jnp.int32(2 ** 31 - 1))
    if Pp != P or Bp != B:
        pivots_i32 = jnp.pad(
            pivots_i32, ((0, Bp - B), (0, Pp - P)),
            constant_values=jnp.int32(-2 ** 31))
    out = pl.pallas_call(
        _count_le_kernel(Pp, Mp // C),
        grid=(Bp // R_BLK, Mp // C),
        in_specs=[
            pl.BlockSpec((R_BLK, C), lambda r, c: (r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_BLK, Pp), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R_BLK, Pp), lambda r, c: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Pp), jnp.int32),
        interpret=interpret,
    )(keys_i32, pivots_i32)
    return out[:B, :P]


def _round_up_int(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _u32_to_ordered_i32(u):
    """Order-preserving uint32 -> int32 (xor the sign bit)."""
    return lax.bitcast_convert_type(
        u ^ jnp.uint32(0x80000000), jnp.int32)


def _ordered_i32_to_u32(i):
    """Inverse of :func:`_u32_to_ordered_i32`."""
    return lax.bitcast_convert_type(i, jnp.uint32) ^ jnp.uint32(0x80000000)


def _rank_select_single(count_fn, B, uint, n_bits, k, n_piv):
    """Exact single order-statistic selection over unsigned key space
    (the one-rank specialization of :func:`_dual_rank_select`: half the
    pivot lanes per count pass)."""
    one = jnp.ones((), uint)
    grid = jnp.arange(n_piv, dtype=uint)[None, :]

    def body(_, carry):
        lo, hi = carry
        w = hi - lo
        step = w // n_piv + one
        p = jnp.minimum(lo[:, None] + step[:, None] * grid, hi[:, None])
        c = count_fn(p)
        admit = c >= (k + 1)[:, None].astype(c.dtype)
        top = ~jnp.zeros((), uint)
        hi = jnp.minimum(hi, jnp.min(jnp.where(admit, p, top), axis=1))
        lo = jnp.maximum(lo, jnp.max(
            jnp.where(admit, jnp.zeros((), uint), p + one), axis=1))
        return lo, hi

    zero = jnp.zeros((B,), uint)
    top = ~zero - one      # sentinel-exclusive start (see _dual_rank_select)
    _, hi = lax.fori_loop(0, _select_rounds(n_bits, n_piv), body,
                          (zero, top))
    return hi


_TRI_CACHE: dict = {}


def tri_indices(N: int):
    """Cached upper-triangle (i, j) index vectors for an N-point read:
    compacting pair keys to N(N-1)/2 entries halves both the HBM key
    buffer and the per-round compare compute vs the full N^2 square.

    Returns DEVICE arrays built eagerly — call OUTSIDE any jit trace and
    pass the result in as arguments (baking multi-MB index constants into
    the HLO slows compilation pathologically, and caching arrays created
    during a trace leaks tracers)."""
    out = _TRI_CACHE.get(N)
    if out is None:
        i, j = np.triu_indices(N, 1)
        out = (jnp.asarray(i.astype(np.int32)),
               jnp.asarray(j.astype(np.int32)))
        _TRI_CACHE[N] = out
    return out


def pairwise_slope_median_pallas(ev, mod, n_pts, max_slope,
                                 interpret: bool = False,
                                 n_piv: int = 8, tri=None):
    """f32 exact pairwise-slope median with Pallas streaming counts.

    Three cost levers over the earlier square/dual design (330 ms ->
    target <100 ms at B=512, N=1024 on v5e):

    * keys are materialized ONCE in compact upper-triangle form
      (N(N-1)/2 entries, not the N^2 square) — half the HBM key buffer,
      half the compare compute per round;
    * selection runs for the UPPER middle order statistic only
      (~11 rounds x 8 padded pivot lanes at ``n_piv=8``), halving the
      pivot lanes per pass vs dual-rank selection;
    * the LOWER middle order statistic is derived exactly from one fused
      count/max pass: the two middle ranks are adjacent (k_lo = k_hi-1
      for an even pair count), so with c_lt = #{keys < v_hi}, the
      (k_hi-1)-th smallest equals v_hi unless c_lt == k_hi, in which
      case it is the largest key strictly below v_hi."""
    dtype = ev.dtype
    assert dtype == jnp.float32, "pallas slope selection is f32-only"
    B, N = ev.shape
    m, k_lo, k_hi = _pair_ranks(n_pts)

    if tri is not None:
        ii, jj = tri
    elif isinstance(ev, jax.core.Tracer):
        # called under an outer trace without explicit indices: embed
        # them as constants (correct but compile-slow) rather than
        # caching trace-local arrays (a tracer leak)
        i_np, j_np = np.triu_indices(N, 1)
        ii = jnp.asarray(i_np.astype(np.int32))
        jj = jnp.asarray(j_np.astype(np.int32))
    else:
        ii, jj = tri_indices(N)
    de = jnp.take(ev, ii, axis=1) - jnp.take(ev, jj, axis=1)
    dm = jnp.take(mod, ii, axis=1) - jnp.take(mod, jj, axis=1)
    s = jnp.where(de == 0, jnp.asarray(max_slope, dtype), dm / de)
    valid = jj[None, :] < n_pts.astype(jnp.int32)[:, None]
    keys = jnp.where(valid, _float_to_key(s), ~jnp.zeros((), jnp.uint32))
    keys_i32 = _u32_to_ordered_i32(keys)

    def count_le(pivots_u32):
        return _count_le_pallas(
            keys_i32, _u32_to_ordered_i32(pivots_u32), interpret)

    hi_key = _rank_select_single(count_le, B, jnp.uint32, 32, k_hi, n_piv)
    # derive the (k_hi-1)-th order statistic: invalid pairs carry the
    # all-ones sentinel (> every selectable key), so they never enter
    # c_lt or max_below
    vh_i32 = _u32_to_ordered_i32(hi_key)
    lt = keys_i32 < vh_i32[:, None]
    # pair counts fit int32 by construction: the fit path caps reads at
    # MAX_POINTS_FOR_THEIL_SEN=1000 points (m <= ~5e5)
    c_lt = jnp.sum(lt, axis=1, dtype=jnp.int32)
    max_below = jnp.max(
        jnp.where(lt, keys_i32, jnp.int32(-2 ** 31)), axis=1)
    lo_key = jnp.where(c_lt == k_hi.astype(jnp.int32),
                       _ordered_i32_to_u32(max_below), hi_key)
    v_hi = _key_to_float(hi_key, dtype).astype(dtype)
    v_lo = _key_to_float(lo_key, dtype).astype(dtype)
    med = jnp.where(m % 2 == 1, v_hi, (v_lo + v_hi) / 2)
    return jnp.where(m > 0, med, jnp.zeros((), dtype))


def _pair_ranks(n_pts):
    n = n_pts.astype(jnp.int64)
    m = n * (n - 1) // 2                       # valid pair count
    k_lo = jnp.maximum((m - 1) // 2, 0)        # 0-based middle order stats
    k_hi = m // 2
    return m, k_lo, k_hi


def pairwise_slope_median(ev, mod, n_pts, max_slope):
    """Per-read median of all-pairs slopes via materialized keys.

    ev, mod: (B, N) point sets (first ``n_pts[b]`` valid per read).
    Returns (B,) median slopes with numpy semantics (mean of the two
    middle order statistics for an even pair count); pairs with equal
    event means contribute ``max_slope``
    (reference: tombo/_c_helper.pyx:362-377).

    The (B, N, N) key buffer is materialized ONCE in HBM; each selection
    round is then one bandwidth-bound count pass over it (30 fused
    compares per key), ~9 rounds total for f32.  Invalid pairs carry the
    all-ones sentinel key, above every achievable slope key (slopes are
    never NaN: equal-``ev`` pairs map to ``max_slope`` first), so the
    count passes need no validity mask."""
    dtype = ev.dtype
    B, N = ev.shape
    uint = jnp.uint64 if dtype == jnp.float64 else jnp.uint32
    n_bits = 64 if dtype == jnp.float64 else 32
    m, k_lo, k_hi = _pair_ranks(n_pts)

    iot = jnp.arange(N, dtype=jnp.int32)
    pair_valid = ((iot[None, :, None] < iot[None, None, :]) &
                  (iot[None, None, :] < n_pts[:, None, None]))

    de = ev[:, :, None] - ev[:, None, :]
    dm = mod[:, :, None] - mod[:, None, :]
    s = jnp.where(de == 0, jnp.asarray(max_slope, dtype), dm / de)
    keys = jnp.where(pair_valid, _float_to_key(s),
                     ~jnp.zeros((), uint)).reshape(B, N * N)

    def count_le(pivots):
        """(B, P) pivot keys -> (B, P) #{pair keys <= pivot}."""
        le = keys[:, :, None] <= pivots[:, None, :]
        return jnp.sum(le, axis=1, dtype=jnp.int32)

    hi1, hi2 = _dual_rank_select(count_le, B, uint, n_bits, k_lo, k_hi)
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
    m, k_lo, k_hi = _pair_ranks(n_pts)

    iot = jnp.arange(N, dtype=jnp.int32)

    def count_le(pivots):
        pair_valid = ((iot[None, :, None] < iot[None, None, :]) &
                      (iot[None, None, :] < n_pts[:, None, None]))
        de = ev[:, :, None] - ev[:, None, :]
        dm = mod[:, :, None] - mod[:, None, :]
        s = jnp.where(de == 0, jnp.asarray(max_slope, dtype), dm / de)
        keys = jnp.where(pair_valid, _float_to_key(s),
                         ~jnp.zeros((), uint)).reshape(B, N * N)
        le = keys[:, :, None] <= pivots[:, None, :]
        return jnp.sum(le, axis=1, dtype=jnp.int32)

    hi1, hi2 = _dual_rank_select(count_le, B, uint, n_bits, k_lo, k_hi)
    v_lo = _key_to_float(hi1, dtype).astype(dtype)
    v_hi = _key_to_float(hi2, dtype).astype(dtype)
    med = jnp.where(m % 2 == 1, v_hi, (v_lo + v_hi) / 2)
    return jnp.where(m > 0, med, jnp.zeros((), dtype))


def theil_sen_device(ev, mod, n_pts, max_slope=1000.0, block=0,
                     engine: str = "auto", tri=None):
    """Batched Theil-Sen fit on device: (slopes, intercepts), matching
    the host estimator (native theil_sen_batch / reference
    tombo/tombo_stats.py:413-419): slope = median pairwise slope,
    intercept = median(mod - slope * ev).

    ``engine``: "pallas" streams materialized keys through the Pallas
    multi-pivot count kernel (f32/TPU; one bandwidth-bound pass per
    round — the fast path); "xla" uses the portable XLA selection;
    "auto" picks pallas when the default backend is TPU and the dtype is
    f32.  For the XLA engine, ``block > 0`` materializes pair keys per
    read block; ``block = 0`` recomputes keys per round with no pair
    buffer at all."""
    if engine == "auto":
        try:
            engine = ("pallas" if jax.default_backend() == "tpu" and
                      ev.dtype == jnp.float32 else "xla")
        except Exception:  # noqa: BLE001
            engine = "xla"
    if engine == "pallas":
        slope = pairwise_slope_median_pallas(ev, mod, n_pts, max_slope,
                                             tri=tri)
        inter = masked_median_sorted(mod - slope[:, None] * ev, n_pts)
        return slope, inter
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
