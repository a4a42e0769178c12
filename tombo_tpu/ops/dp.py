"""Batched banded dynamic programming on device (JAX/XLA).

TPU-first redesign of the reference's sequential Cython DTW engine
(reference: tombo/_c_dynamic_programming.pyx:202-412).  Key transformations:

* The band-position recurrence ``fwd[p] = max(fwd[p-1] + z[p] - stay_pen,
  max(diag, skip))`` (reference: pyx:213-234 ``c_process_band`` — profiled at
  >60% of DP runtime, pyx:403-404) is a first-order *max-plus* linear
  recurrence.  With ``s[p] = z[p] - stay_pen``, ``c = prefix_sum(s)`` and
  ``u[p] = d[p] - c[p]`` it closes to ``fwd[p] = c[p] + running_max(u)[p]``:
  one cumsum + one cummax + adds, all vectorized over the band *and* over a
  batch of reads.  The sequential axis collapses to the sequence dimension
  only (a ``lax.scan`` over rows), with thousands of reads advancing in
  lockstep on the VPU.

* Adaptive band placement (argmax of the previous row, clamped monotone;
  reference: pyx:342-358) happens inside the same scan step.

* Traceback (reference: pyx:281-310) is re-expressed without the inner
  ``while tb == 0`` walk: for each row, ``nsp[p] = max{q <= p : tb[q] != 0}``
  is a cummax over the band, making the reverse walk O(1) per row — a second
  ``lax.scan`` in reverse.

Everything here is shape-static: reads are bucketed and padded by the
pipeline layer; per-read true lengths are carried as integer arrays and all
out-of-range work is masked.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .precision import seq_cumsum

NEG_LARGE = -1e30  # stand-in for -inf that stays finite through arithmetic


class DpParams(NamedTuple):
    """Static DP parameters (hashable; part of the jit cache key)."""
    z_shift: float
    skip_pen: float
    stay_pen: float
    mask_fill_z_score: float
    max_half_z_score: float     # <=0 disables winsorizing
    bandwidth: int


def _row_update(prev_fwd: jnp.ndarray, shifted_z: jnp.ndarray,
                first_val: jnp.ndarray, first_move: jnp.ndarray,
                diff: jnp.ndarray, p: DpParams
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One band-row update for a batch of reads.

    prev_fwd:  (B, bw) previous forward row
    shifted_z: (B, bw) z_shift - half-z for this row (already masked)
    first_val: (B,)    externally-set value at band position 0
    first_move:(B,)    move code at band position 0 (1=skip or 2=diag)
    diff:      (B,)    band start difference vs previous row

    Returns (fwd, moves): (B, bw) float and (B, bw) int8.
    Move-code tie-breaking matches the reference comparison chain
    (stay beats diag beats skip on ties; reference: pyx:216-231).
    """
    bw = p.bandwidth
    pos = jnp.arange(bw)[None, :]                       # (1, bw)
    prev_b_pos = pos + diff[:, None]                    # (B, bw)

    diag_idx = prev_b_pos - 1
    diag_valid = (diag_idx >= 0) & (diag_idx < bw)
    diag_gather = jnp.take_along_axis(
        prev_fwd, jnp.clip(diag_idx, 0, bw - 1), axis=1)
    diag_score = jnp.where(diag_valid, diag_gather, NEG_LARGE) + shifted_z

    skip_valid = prev_b_pos < bw
    skip_gather = jnp.take_along_axis(
        prev_fwd, jnp.clip(prev_b_pos, 0, bw - 1), axis=1)
    skip_score = jnp.where(skip_valid, skip_gather, NEG_LARGE) - p.skip_pen

    d = jnp.maximum(diag_score, skip_score)

    s = shifted_z - p.stay_pen
    c = seq_cumsum(s.at[:, 0].set(0.0), axis=1)
    u = d - c
    u = u.at[:, 0].set(first_val)
    run = lax.cummax(u, axis=1)
    fwd = c + run
    fwd = fwd.at[:, 0].set(first_val)

    stay_score = jnp.concatenate(
        [jnp.full((fwd.shape[0], 1), NEG_LARGE, fwd.dtype),
         fwd[:, :-1] - p.stay_pen + shifted_z[:, 1:]], axis=1)
    moves = jnp.zeros(fwd.shape, jnp.int8)
    moves = jnp.where(diag_score > stay_score, jnp.int8(2), moves)
    moves = jnp.where(skip_score > jnp.maximum(stay_score, diag_score),
                      jnp.int8(1), moves)
    moves = moves.at[:, 0].set(first_move.astype(jnp.int8))
    return fwd, moves


def _band_z_scores(em_shift: jnp.ndarray, n_events: jnp.ndarray,
                   band_start: jnp.ndarray, ref_mean: jnp.ndarray,
                   ref_sd: jnp.ndarray, p: DpParams) -> jnp.ndarray:
    """Shifted winsorized z-scores for one adaptive band row of each read
    (reference: pyx:360-386).  Positions outside [0, n_events) are filled
    with ``mask_fill_z_score``.

    ``em_shift`` is the events array left-padded with ``bandwidth`` zeros so
    negative band starts (which the reference's start-masked prefix plan
    produces intentionally; reference: tombo/resquiggle.py:627-629) index
    correctly — a raw ``dynamic_slice`` would clamp and silently shift the
    window."""
    bw = p.bandwidth

    def one(read_means, n_ev, start, mu, sd):
        window = lax.dynamic_slice(read_means, (start + bw,), (bw,))
        z = jnp.abs((window - mu) / sd)
        if p.max_half_z_score > 0:
            z = jnp.minimum(z, p.max_half_z_score)
        shifted = p.z_shift - z
        abs_pos = start + jnp.arange(bw)
        return jnp.where((abs_pos >= 0) & (abs_pos < n_ev), shifted,
                         p.mask_fill_z_score)

    return jax.vmap(one)(em_shift, n_events, band_start, ref_mean, ref_sd)


@functools.partial(
    jax.jit, static_argnames=("params", "n_rows", "prefix_rows"))
def adaptive_banded_dp(
        event_means: jnp.ndarray,      # (B, E) padded, PRE-CLIPPED per read
        n_events: jnp.ndarray,         # (B,) valid events per read
        ref_means: jnp.ndarray,        # (B, L) expected levels, padded
        ref_sds: jnp.ndarray,          # (B, L)
        seq_lens: jnp.ndarray,         # (B,) true number of bases (DP rows)
        prefix_starts: jnp.ndarray,    # (B, P) static band starts (start mask)
        prefix_valid_start: jnp.ndarray,  # (B,) events < this are masked
        prefix_end: jnp.ndarray,       # (B, P) events >= this are masked
        start_rows: jnp.ndarray,       # (B,) rows < this use the prefix plan
        params: DpParams,
        n_rows: int,                   # static: L (max rows to scan)
        prefix_rows: int,              # static: P
):
    """Full start-masked + adaptive banded forward pass for a read batch.

    Fuses the reference's ``_get_masked_start_fwd_pass`` (static-band prefix
    with start masking; reference: tombo/resquiggle.py:607-683) and
    ``c_adaptive_banded_forward_pass`` (reference: pyx:314-412) into a single
    row scan; each read switches from the precomputed prefix band plan to
    adaptive placement at its own ``start_rows``.

    Returns:
        tb:          (L, B, bw) int8 move codes (row r = fwd_pass row r+1)
        band_starts: (L, B) int32 event start of each row's band
        final_fwd:   (B, bw) forward row at each read's last base
        band_error:  (B,) bool — adaptive band ran past the events array
                     before the last two bases (reference: pyx:349-356)
    """
    bw = params.bandwidth
    B = event_means.shape[0]
    dtype = event_means.dtype
    half_bw = bw // 2

    # normalize integer dtypes so the scan carry is stable
    n_events = n_events.astype(jnp.int32)
    seq_lens = seq_lens.astype(jnp.int32)
    prefix_starts = prefix_starts.astype(jnp.int32)
    prefix_valid_start = prefix_valid_start.astype(jnp.int32)
    # prefix_end is clipped into int32 range first (callers may use a large
    # "no mask" sentinel); int64 would be silently truncated under x32
    prefix_end = jnp.clip(prefix_end, 0, 2 ** 31 - 1).astype(jnp.int32)
    start_rows = start_rows.astype(jnp.int32)

    # Events left/right-padded by one bandwidth so negative band starts
    # (reference: tombo/resquiggle.py:627-629) and end-overrunning bands
    # slice without clamping; out-of-range positions are masked explicitly.
    zpad = jnp.zeros((B, bw), dtype)
    em_shift = jnp.concatenate([zpad, event_means, zpad], axis=1)

    # Precompute prefix-phase z-scores: (B, P, bw).
    def prefix_z_one(read_means_shift, n_ev, starts, valid_start, ends):
        windows = jax.vmap(
            lambda s: lax.dynamic_slice(
                read_means_shift, (s + bw,), (bw,)))(starts)
        abs_pos = starts[:, None] + jnp.arange(bw)[None, :]
        valid = ((abs_pos >= valid_start) & (abs_pos < ends[:, None]) &
                 (abs_pos >= 0) & (abs_pos < n_ev))
        return windows, valid

    prefix_windows, prefix_valid = jax.vmap(prefix_z_one)(
        em_shift, n_events, prefix_starts, prefix_valid_start, prefix_end)
    # z-scores need the per-row ref level: rows 0..P-1 use ref_means[:, :P]
    pz = jnp.abs((prefix_windows - ref_means[:, :prefix_rows, None]) /
                 ref_sds[:, :prefix_rows, None])
    if params.max_half_z_score > 0:
        pz = jnp.minimum(pz, params.max_half_z_score)
    prefix_z = jnp.where(prefix_valid, params.z_shift - pz,
                         params.mask_fill_z_score).astype(dtype)

    init = dict(
        fwd=jnp.zeros((B, bw), dtype),
        prev_start=prefix_starts[:, 0].astype(jnp.int32),
        final_fwd=jnp.zeros((B, bw), dtype),
        band_error=jnp.zeros((B,), jnp.bool_),
    )

    def step(carry, r):
        fwd = carry["fwd"]
        prev_start = carry["prev_start"]

        is_prefix = r < start_rows                       # (B,)
        active = r < seq_lens                            # (B,)

        # ---- adaptive band placement (reference: pyx:342-358)
        amax = jnp.argmax(fwd, axis=1).astype(jnp.int32)
        adapt_start = prev_start + amax - half_bw + 1
        adapt_start = jnp.maximum(adapt_start, prev_start)
        overrun = adapt_start >= n_events
        band_err = overrun & (r < seq_lens - 2) & active & ~is_prefix
        adapt_start = jnp.minimum(adapt_start, n_events - 1)

        pref_idx = jnp.minimum(r, prefix_rows - 1)
        pref_start = prefix_starts[:, pref_idx].astype(jnp.int32)
        band_start = jnp.where(is_prefix, pref_start, adapt_start)
        band_start = jnp.where(active, band_start, prev_start)

        # ---- row z-scores
        mu = jnp.take(ref_means, r, axis=1)
        sd = jnp.take(ref_sds, r, axis=1)
        adapt_z = _band_z_scores(em_shift, n_events, band_start, mu, sd,
                                 params)
        pref_z = prefix_z[:, pref_idx]
        z_row = jnp.where(is_prefix[:, None], pref_z, adapt_z)

        # ---- first band position special case (reference: pyx:392-401)
        diff = band_start - prev_start
        same_start = diff == 0
        first_skip = fwd[:, 0] - params.skip_pen
        diag_gather = jnp.take_along_axis(
            fwd, jnp.clip(diff - 1, 0, bw - 1)[:, None], axis=1)[:, 0]
        first_diag = diag_gather + z_row[:, 0]
        first_val = jnp.where(same_start, first_skip, first_diag)
        first_move = jnp.where(same_start, 1, 2)

        new_fwd, moves = _row_update(
            fwd, z_row, first_val, first_move, diff, params)

        new_fwd = jnp.where(active[:, None], new_fwd, fwd)
        moves = jnp.where(active[:, None], moves, jnp.int8(0))

        final_fwd = jnp.where((r == seq_lens - 1)[:, None], new_fwd,
                              carry["final_fwd"])
        new_carry = dict(
            fwd=new_fwd,
            prev_start=band_start,
            final_fwd=final_fwd,
            band_error=carry["band_error"] | band_err,
        )
        return new_carry, (moves, band_start)

    carry, (tb, band_starts) = lax.scan(
        step, init, jnp.arange(n_rows, dtype=jnp.int32))
    return tb, band_starts, carry["final_fwd"], carry["band_error"]


@functools.partial(jax.jit, static_argnames=("bandwidth", "n_rows"))
def banded_traceback(
        tb: jnp.ndarray,             # (L, B, bw) int8 move codes
        band_starts: jnp.ndarray,    # (L, B) int32
        seq_lens: jnp.ndarray,       # (B,)
        top_band_pos: jnp.ndarray,   # (B,) argmax band pos on final row
        band_bound_thresh: int,      # -1 disables the boundary check
        bandwidth: int, n_rows: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized traceback (reference: pyx:281-310 ``c_banded_traceback``).

    Returns (seq_poss, boundary_error):
        seq_poss: (B, L+1) int32; entry i is the event index boundary of base
                  i; only entries [0, seq_len] are meaningful per read.
        boundary_error: (B,) bool — path came within ``band_bound_thresh`` of
                  the band edge.
    """
    L, B, bw = tb.shape
    assert bw == bandwidth and L == n_rows

    last_start = jnp.take_along_axis(
        band_starts, (seq_lens - 1)[None, :], axis=0)[0]     # (B,)
    init_event_pos = (top_band_pos + last_start).astype(jnp.int32)

    init = dict(
        event_pos=init_event_pos,
        bound_err=jnp.zeros((B,), jnp.bool_),
    )

    def step(carry, xs):
        tb_row, bs_row, r = xs          # (B, bw), (B,), scalar row index
        active = r < seq_lens           # row r == fwd_pass row r+1

        band_pos = carry["event_pos"] - bs_row
        band_pos = jnp.clip(band_pos, 0, bw - 1)

        # nsp: last non-stay position <= p within this row (cummax trick)
        iota = jnp.arange(bw)[None, :]
        nz = jnp.where(tb_row != 0, iota, -1)
        nsp = lax.cummax(nz, axis=1)
        band_pos = jnp.take_along_axis(nsp, band_pos[:, None], axis=1)[:, 0]
        band_pos = jnp.clip(band_pos, 0, bw - 1)

        move = jnp.take_along_axis(tb_row, band_pos[:, None], axis=1)[:, 0]
        band_pos = jnp.where(move == 2, band_pos - 1, band_pos)

        # band_pos is clipped to [0, bw-1] so with thresh < 0 this is
        # vacuously False (matching the reference's disabled check).
        bound_err = active & (
            jnp.minimum(band_pos, bw - band_pos - 1) < band_bound_thresh)

        new_event_pos = (bs_row + band_pos).astype(jnp.int32)
        new_event_pos = jnp.where(active, new_event_pos, carry["event_pos"])
        new_carry = dict(
            event_pos=new_event_pos,
            bound_err=carry["bound_err"] | bound_err,
        )
        # emitted value is seq_poss[r] = event boundary of base r
        return new_carry, jnp.where(active, new_event_pos + 1, 0)

    rows = jnp.arange(n_rows - 1, -1, -1, dtype=jnp.int32)
    carry, segs_rev = lax.scan(
        step, init, (tb[::-1], band_starts[::-1], rows))
    segs = segs_rev[::-1].T                              # (B, L)

    # seq_poss[seq_len] = init_event_pos + 1 (reference: pyx:290-293)
    segs = jnp.concatenate(
        [segs, jnp.zeros((B, 1), segs.dtype)], axis=1)   # (B, L+1)
    segs = jax.vmap(
        lambda s, n, v: s.at[n].set(v))(
            segs, seq_lens, init_event_pos + 1)
    return segs, carry["bound_err"]


class StartDpParams(NamedTuple):
    """Static parameters for read-start discovery."""
    z_shift: float
    skip_pen: float
    stay_pen: float
    max_half_z_score: float
    num_bases: int       # rows (reference start_n_bases, e.g. 250)
    num_events: int      # band width (reference start_bw, e.g. 750)


@functools.partial(jax.jit, static_argnames=("params",))
def start_band_dp(event_means: jnp.ndarray,   # (B, >= num_bases+num_events)
                  ref_means: jnp.ndarray,     # (B, >= num_bases)
                  ref_sds: jnp.ndarray,
                  params: StartDpParams):
    """Read-start discovery DP (reference: tombo/resquiggle.py:685-752
    ``find_seq_start_in_events``): a static band moving up one event per
    base.  Whole z-score matrix is computed vectorized, then the same row
    recurrence runs under a scan.

    Returns (segs, top_band_pos, final_fwd_max):
        segs: (B, num_bases+1) traceback boundaries (event indices)
    """
    nb, ne = params.num_bases, params.num_events
    B = event_means.shape[0]
    dtype = event_means.dtype
    dp = DpParams(z_shift=params.z_shift, skip_pen=params.skip_pen,
                  stay_pen=params.stay_pen, mask_fill_z_score=0.0,
                  max_half_z_score=params.max_half_z_score, bandwidth=ne)

    # z matrix: (B, nb, ne); row i covers events [i, i+ne)
    idx = jnp.arange(nb)[:, None] + jnp.arange(ne)[None, :]
    windows = event_means[:, idx]                        # (B, nb, ne)
    z = jnp.abs((windows - ref_means[:, :nb, None]) / ref_sds[:, :nb, None])
    if params.max_half_z_score > 0:
        z = jnp.minimum(z, params.max_half_z_score)
    zmat = (params.z_shift - z).astype(dtype)

    init_fwd = jnp.zeros((B, ne), dtype)

    def step(fwd, r):
        z_row = zmat[:, r]
        diff = jnp.where(r == 0, 0, 1)                   # starts = arange
        same = diff == 0
        first_val = jnp.where(same, fwd[:, 0] - params.skip_pen,
                              fwd[:, 0] + z_row[:, 0])
        first_move = jnp.where(same, 1, 2)
        diffs = jnp.full((B,), diff, jnp.int32)
        new_fwd, moves = _row_update(fwd, z_row, first_val, first_move,
                                     diffs, dp)
        return new_fwd, moves

    final_fwd, tb = lax.scan(step, init_fwd, jnp.arange(nb, dtype=jnp.int32))
    # tb: (nb, B, ne)
    top_band_pos = jnp.argmax(final_fwd, axis=1).astype(jnp.int32)
    band_starts = jnp.broadcast_to(
        jnp.arange(nb, dtype=jnp.int32)[:, None], (nb, B))
    seq_lens = jnp.full((B,), nb, jnp.int32)
    segs, _ = banded_traceback(tb, band_starts, seq_lens, top_band_pos,
                               -1, ne, nb)
    return segs, top_band_pos, jnp.max(final_fwd, axis=1)
