"""Fused adaptive banded DP + traceback as a single Pallas TPU kernel.

The ``lax.scan`` engine in ops/dp.py is correct but latency-bound on TPU:
each of the ~1000 sequential row steps is a handful of tiny VPU ops plus
fixed per-step overhead, and the (rows, batch, bandwidth) move matrix
(~20 MB per batch) must be shipped to a second traceback kernel.  This
kernel keeps the whole recurrence on-core:

* grid over blocks of reads; each program runs the full forward pass AND
  the traceback for its block, so only the (B, L+1) segment boundaries,
  band-error flags and the final forward row ever leave the chip;
* the band-position recurrence uses the same max-plus closure as
  ops/dp.py (cumsum + running-max), with lane scans implemented as
  Hillis-Steele passes over ``pltpu.roll``;
* the forward pass stores raw per-row move codes in VMEM; the traceback
  resolves each row's "last non-stay position <= p" query with a single
  masked max-reduce (reference semantics:
  tombo/_c_dynamic_programming.pyx:281-310).

Mosaic requires lane-dimension offsets to be 128-aligned, so all
unaligned window gathers are expressed as an aligned dynamic slice
(``pl.multiple_of``) followed by a sub-128 ``pltpu.roll``; per-row column
reads/writes of (R, L) arrays use one-hot masked reduce / select instead
of dynamic lane indexing.

Reference behavior: tombo/_c_dynamic_programming.pyx:314-412
(``c_adaptive_banded_forward_pass``) fused with
tombo/resquiggle.py:607-683 (``_get_masked_start_fwd_pass``) and
pyx:281-310 (``c_banded_traceback``); tie-breaking (stay > diag > skip,
first-max band placement) matches the C comparison chains.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp import DpParams, NEG_LARGE

_INT_NEG = -(2 ** 30)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lane_iota(r: int, w: int) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)


def _cumsum_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the lane axis (Hillis-Steele)."""
    r, w = x.shape
    lanes = _lane_iota(r, w)
    shift = 1
    while shift < w:
        rolled = pltpu.roll(x, shift, 1)
        x = x + jnp.where(lanes >= shift, rolled, 0.0)
        shift *= 2
    return x


def _cummax_lanes_f(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running max along the lane axis (float)."""
    r, w = x.shape
    lanes = _lane_iota(r, w)
    shift = 1
    while shift < w:
        rolled = pltpu.roll(x, shift, 1)
        x = jnp.maximum(x, jnp.where(lanes >= shift, rolled, NEG_LARGE))
        shift *= 2
    return x


def _cummax_lanes_i(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running max along the lane axis (int32)."""
    r, w = x.shape
    lanes = _lane_iota(r, w)
    shift = 1
    while shift < w:
        rolled = pltpu.roll(x, shift, 1)
        x = jnp.maximum(x, jnp.where(lanes >= shift, rolled, _INT_NEG))
        shift *= 2
    return x


def _first_argmax(x: jnp.ndarray, n_valid: int) -> jnp.ndarray:
    """Index of the first maximum over lanes < n_valid; (R, W) -> (R, 1).

    Matches C ``>`` comparison chains / np.argmax first-occurrence
    semantics (reference: tombo/_c_dynamic_programming.pyx:186-200)."""
    r, w = x.shape
    lanes = _lane_iota(r, w)
    xm = jnp.where(lanes < n_valid, x, NEG_LARGE)
    m = jnp.max(xm, axis=1, keepdims=True)
    idx = jnp.where(xm == m, lanes, jnp.int32(w))
    return jnp.min(idx, axis=1, keepdims=True)


def _col_f(arr: jnp.ndarray, lanes: jnp.ndarray, r) -> jnp.ndarray:
    """One-hot read of column ``r`` from an (R, W) float array -> (R, 1)."""
    return jnp.max(jnp.where(lanes == r, arr, NEG_LARGE), axis=1,
                   keepdims=True)


def _col_i(arr: jnp.ndarray, lanes: jnp.ndarray, r) -> jnp.ndarray:
    """One-hot read of column ``r`` from an (R, W) int array -> (R, 1)."""
    return jnp.max(jnp.where(lanes == r, arr, _INT_NEG), axis=1,
                   keepdims=True)


def _dp_variant() -> str:
    """How per-read unaligned window gathers are expressed in the kernel.

    ``TOMBO_TPU_DP_VARIANT`` selects:

    * ``"loop"`` — R sequential aligned-slice + sub-128-roll
      gathers per DP row (one per read; Mosaic-safe everywhere);
    * ``"gather"`` — lane-wise ``take_along_axis`` (Mosaic dynamic
      gather): one vector op per row;
    * ``"shift"`` (default on TPU) — two-level barrel shifter:
      log2(W/128) coarse 128-lane ``pltpu.roll``s selected per-row +
      7 fine rolls, fully vectorized across reads (op count independent
      of R).

    ``TOMBO_TPU_DP_GATHER=1`` is the back-compat spelling of "gather".
    All three are bit-identical (pure data movement); measured on-device
    (scripts/kernel_layout_bench.py, B=512/L=1k/bw=300): shift 3155
    reads/s DP-only vs loop 2449 at R=32 — shift is the default on real
    TPU backends, loop elsewhere (interpret-mode tests exercise both)."""
    import os
    v = os.environ.get("TOMBO_TPU_DP_VARIANT")
    if v:
        if v not in ("loop", "gather", "shift"):
            raise ValueError(
                "TOMBO_TPU_DP_VARIANT must be loop/gather/shift, got %r"
                % v)
        return v
    if os.environ.get("TOMBO_TPU_DP_GATHER", "0") == "1":
        return "gather"
    try:
        if jax.default_backend() == "tpu":
            return "shift"
    except Exception:  # backend probe must never break the CPU path
        pass
    return "loop"


def _shift_rows(full: jnp.ndarray, shift: jnp.ndarray,
                out_w: int, max_shift: int = None) -> jnp.ndarray:
    """Vectorized per-row window extraction: ``out[i, q] = full[i,
    shift[i] + q]`` valid for ``q <= out_w`` (returns (R, out_w + 128)).

    Two-level barrel shifter over uniform rotations: rotate-left by
    128 * 2^b for each set bit b of ``shift // 128`` (selected per row
    with ``jnp.where``), statically narrow to ``out_w + 128`` lanes,
    then rotate-left by 2^b for each set bit of ``shift % 128``.  Every
    primitive is a static-amount ``pltpu.roll`` + per-row select, so it
    vectorizes across the read dimension — unlike the R sequential
    dynamic slices of the "loop" variant.

    Requires ``shift >= 0`` and ``shift + out_w + 128 <= full.shape[1]``
    (so rotation wrap-around never contaminates the window).
    ``max_shift`` (static) bounds the shift values, dropping coarse roll
    levels the caller knows can never fire.
    """
    R, W = full.shape
    coarse = shift // 128
    fine = shift - coarse * 128
    x = full
    b = 0
    lim = W if max_shift is None else min(W, max_shift + 1)
    while (128 << b) < lim:
        amt = 128 << b
        rolled = pltpu.roll(x, W - amt, 1)
        x = jnp.where((coarse >> b) & 1 == 1, rolled, x)
        b += 1
    Wn = out_w + 128
    xn = x[:, :Wn]
    for b in range(7):
        amt = 1 << b
        rolled = pltpu.roll(xn, Wn - amt, 1)
        xn = jnp.where((fine >> b) & 1 == 1, rolled, xn)
    return xn


def _gather_em_window(variant, em_ref, band_start, lanes, bwp, E_tot,
                      win_ref, gather_row):
    """Per-read event-mean band window: win[i, q] = em[i, bs_i + bwp + q]
    for q < bwp, expressed per the selected gather variant (all three
    bit-identical; shared by the fused and seq-chunked kernels)."""
    if variant == "gather":
        return jnp.take_along_axis(
            em_ref[:, :], jnp.clip(band_start + bwp + lanes, 0, E_tot - 1),
            axis=1)
    if variant == "shift":
        return _shift_rows(em_ref[:, :], band_start + bwp, bwp)[:, :bwp]
    for i in range(em_ref.shape[0]):
        w_row = gather_row(em_ref, i, band_start[i, 0] + bwp)
        win_ref[pl.ds(i, 1), :] = w_row[:, :bwp]
    return win_ref[:, :]


def _gather_diag_skip(variant, fwdpad_ref, diff, lanes, bwp, W_f, W_seg,
                      dw_ref, sw_ref, gather_row):
    """Previous-row windows for the recurrence: diag[q] = fwd[q + diff - 1]
    and skip[q] = fwd[q + diff], read from the neg-padded forward row
    (fwd stored at lane offset 128)."""
    if variant == "gather":
        base_idx = 128 + diff + lanes
        diag_w = jnp.take_along_axis(
            fwdpad_ref[:, :], jnp.clip(base_idx - 1, 0, W_f - 1), axis=1)
        skip_w = jnp.take_along_axis(
            fwdpad_ref[:, :], jnp.clip(base_idx, 0, W_f - 1), axis=1)
        return diag_w, skip_w
    if variant == "shift":
        # one barrel-shifted window covers both: lane q holds
        # fwdpad[127 + diff + q] = fwd[q + diff - 1]
        row = _shift_rows(fwdpad_ref[:, :], 127 + diff, bwp)
        return row[:, :bwp], pltpu.roll(row, row.shape[1] - 1, 1)[:, :bwp]
    for i in range(fwdpad_ref.shape[0]):
        row = gather_row(fwdpad_ref, i, 127 + diff[i, 0])
        dw_ref[pl.ds(i, 1), :] = row[:, :bwp]
        sw_ref[pl.ds(i, 1), :] = pltpu.roll(row, W_seg - 1, 1)[:, :bwp]
    return dw_ref[:, :], sw_ref[:, :]


def _make_kernel(p: DpParams, R: int, L: int, P: int, E_tot: int,
                 bwp: int, band_bound_thresh: int, variant: str = None):
    bw = p.bandwidth
    half_bw = bw // 2
    variant = variant or _dp_variant()
    neg = float(NEG_LARGE)
    mask_fill = float(p.mask_fill_z_score)
    z_shift = float(p.z_shift)
    skip_pen = float(p.skip_pen)
    stay_pen = float(p.stay_pen)
    max_half_z = float(p.max_half_z_score)
    W_seg = bwp + 256          # aligned gather window (off<128 + band + 1)
    W_f = 2 * bwp + 256        # fwdpad: fwd stored at offset 128

    def gather_row(ref, i, start):
        """ref[i, start : start+bwp+1] via aligned slice + sub-128 roll.

        Returns a (1, W_seg) vector whose lane q is ref[i, start + q]
        for q <= bwp."""
        base = pl.multiple_of((start // 128) * 128, 128)
        seg = ref[pl.ds(i, 1), pl.ds(base, W_seg)]
        return pltpu.roll(seg, W_seg - (start - base), 1)

    TILE = 128
    tiled = L % TILE == 0 and L >= TILE
    # sliding event-mean window (shift variant): per-read (R, W_win) VMEM
    # copy refreshed only when the band approaches its right edge, so the
    # per-row barrel shifter runs over W_win lanes instead of E_tot
    W_win = bwp + 3 * TILE
    slide = variant == "shift" and os.environ.get(
        "TOMBO_TPU_DP_SLIDE", "0") == "1"
    max_fine = W_win - bwp - TILE    # refresh keeps shift <= this

    def kernel(em_ref, nev_ref, rm_ref, rs_ref, sl_ref, ps_ref, pv_ref,
               pe_ref, sr_ref,
               segs_ref, banderr_ref, bounderr_ref, ffwd_ref,
               moves_ref, bs_ref, segsacc_ref, fwdpad_ref, win_ref, dw_ref,
               sw_ref, rmt_ref, rst_ref, bst_ref, segt_ref, emw_ref):
        lanes = _lane_iota(R, bwp)
        lanes_L = _lane_iota(R, L)
        lanes_P = _lane_iota(R, P)
        lanes_T = _lane_iota(R, TILE)
        lane_lt_bw = lanes < bw

        nev = nev_ref[:, :]          # (R, 1) i32
        sl = sl_ref[:, :]
        pv = pv_ref[:, :]
        sr = sr_ref[:, :]
        rm = rm_ref[:, :]            # (R, L)
        rs = rs_ref[:, :]
        ps = ps_ref[:, :]            # (R, P)
        pe = pe_ref[:, :]

        init_fwd = jnp.where(lane_lt_bw, 0.0, neg)
        fwdpad_ref[:, :] = jnp.full((R, W_f), neg, jnp.float32)
        # move codes pack 2-bit, 16 rows per int32 word (values {0,1,2});
        # 16x less VMEM than one int32 per row, which is what lets the
        # read-block R ride the grid path at production bandwidths
        moves_ref[:, :, :] = jnp.zeros(moves_ref.shape, jnp.int32)

        if slide:
            # initialize each read's window at its first band start; the
            # (R, 1) base vector rides the loop carry (Mosaic forbids
            # scalar stores to VMEM, but vector-lane extracts are fine)
            ewb0 = ((ps[:, 0:1].astype(jnp.int32) + bwp) // TILE) * TILE
            for i in range(R):
                base0 = pl.multiple_of(ewb0[i, 0], TILE)
                emw_ref[pl.ds(i, 1), :] = em_ref[pl.ds(i, 1),
                                                 pl.ds(base0, W_win)]
        else:
            ewb0 = jnp.zeros((R, 1), jnp.int32)

        def fwd_body(r, carry):
            fwd, prev_start, band_err, final_fwd, ewb = carry
            active = r < sl                                   # (R, 1)
            is_prefix = r < sr

            if tiled:
                # per-row column reads of the (R, L) level arrays cost
                # O(L) lanes; staging 128-wide tiles makes them O(TILE)
                @pl.when(r % TILE == 0)
                def _():
                    tb = pl.multiple_of((r // TILE) * TILE, TILE)
                    rmt_ref[:, :] = rm_ref[:, pl.ds(tb, TILE)]
                    rst_ref[:, :] = rs_ref[:, pl.ds(tb, TILE)]

            # --- adaptive band placement (reference: pyx:342-358)
            amax = _first_argmax(fwd, bw)
            adapt_start = prev_start + amax - half_bw + 1
            adapt_start = jnp.maximum(adapt_start, prev_start)
            overrun = adapt_start >= nev
            band_err = band_err | (
                overrun & (r < sl - 2) & active & (~is_prefix)
            ).astype(jnp.int32)
            adapt_start = jnp.minimum(adapt_start, nev - 1)

            pref_idx = jnp.minimum(r, P - 1)
            pref_start = _col_i(ps, lanes_P, pref_idx)
            band_start = jnp.where(is_prefix, pref_start, adapt_start)
            band_start = jnp.where(active, band_start, prev_start)

            # --- masked winsorized z-scores for the band row
            lo = jnp.where(is_prefix, jnp.maximum(pv, 0), 0)
            hi = jnp.where(is_prefix,
                           jnp.minimum(_col_i(pe, lanes_P, pref_idx), nev),
                           nev)
            if slide:
                # slide any read's window whose band ran past the fine-
                # shift range (band starts are monotone, so the window
                # only ever moves right)
                bsv = band_start + bwp
                move = (bsv - ewb > max_fine).astype(jnp.int32)
                # one vector->scalar sync per row (per-read extracts are
                # expensive); when ANY read outruns its window, re-base
                # every read to its current band for maximum runway
                am = jnp.max(move)
                nbv = (bsv // TILE) * TILE
                ewb = jnp.where(am == 1, nbv, ewb)

                @pl.when(am == 1)
                def _():
                    for i in range(R):
                        nb = pl.multiple_of(nbv[i, 0], TILE)
                        emw_ref[pl.ds(i, 1), :] = em_ref[pl.ds(i, 1),
                                                         pl.ds(nb, W_win)]
                win = _shift_rows(emw_ref[:, :], bsv - ewb,
                                  bwp, max_shift=max_fine + TILE - 1)[:, :bwp]
            else:
                win = _gather_em_window(variant, em_ref, band_start, lanes,
                                        bwp, E_tot, win_ref, gather_row)
            if tiled:
                mu = _col_f(rmt_ref[:, :], lanes_T, r % TILE)
                sd = _col_f(rst_ref[:, :], lanes_T, r % TILE)
            else:
                mu = _col_f(rm, lanes_L, r)
                sd = _col_f(rs, lanes_L, r)
            z = jnp.abs((win - mu) / sd)
            if max_half_z > 0:
                z = jnp.minimum(z, max_half_z)
            shifted = z_shift - z
            abs_pos = band_start + lanes
            valid = (abs_pos >= lo) & (abs_pos < hi) & lane_lt_bw
            shifted = jnp.where(valid, shifted, mask_fill)

            # --- first band position special case (reference: pyx:392-401)
            diff = jnp.clip(band_start - prev_start, 0, bwp)
            same = diff == 0
            fwdpad_ref[:, pl.ds(128, bwp)] = fwd
            diag_w, skip_w = _gather_diag_skip(
                variant, fwdpad_ref, diff, lanes, bwp, W_f, W_seg,
                dw_ref, sw_ref, gather_row)
            diag_score = diag_w + shifted
            skip_score = skip_w - skip_pen

            first_skip = fwd[:, 0:1] - skip_pen
            first_diag = diag_w[:, 0:1] + shifted[:, 0:1]
            first_val = jnp.where(same, first_skip, first_diag)
            first_move = jnp.where(same, 1, 2)

            # --- max-plus closure of the stay recurrence
            lane0 = lanes == 0
            d = jnp.maximum(diag_score, skip_score)
            s = jnp.where(lane0, 0.0, shifted - stay_pen)
            c = _cumsum_lanes(s)
            u = jnp.where(lane0, first_val, d - c)
            run = _cummax_lanes_f(u)
            new_fwd = jnp.where(lane0, first_val, c + run)

            stay_score = jnp.where(
                lane0, neg,
                pltpu.roll(new_fwd, 1, 1) - stay_pen + shifted)
            moves = jnp.zeros((R, bwp), jnp.int32)
            moves = jnp.where(diag_score > stay_score, 2, moves)
            moves = jnp.where(
                skip_score > jnp.maximum(stay_score, diag_score), 1, moves)
            moves = jnp.where(lane0, first_move, moves)
            moves = jnp.where(lane_lt_bw, moves, 0)
            new_fwd = jnp.where(lane_lt_bw, new_fwd, neg)

            new_fwd = jnp.where(active, new_fwd, fwd)
            moves = jnp.where(active, moves, 0)
            final_fwd = jnp.where(r == sl - 1, new_fwd, final_fwd)

            # --- store raw move codes (2-bit packed); the traceback
            # resolves the "last non-stay position <= p" query with a
            # masked reduce (cheaper than a cummax per forward row)
            word = r // 16
            sh = 2 * (r % 16)
            prev_w = moves_ref[:, pl.ds(word, 1), :].reshape(R, bwp)
            moves_ref[:, pl.ds(word, 1), :] = (
                prev_w | (moves << sh)).reshape(R, 1, bwp)
            if tiled:
                # stage band starts in a 128-wide tile; flush once per
                # TILE rows (O(L^2) lane traffic -> O(L * TILE))
                bst_ref[:, :] = jnp.where(lanes_T == r % TILE, band_start,
                                          bst_ref[:, :])

                @pl.when(r % TILE == TILE - 1)
                def _():
                    tb = pl.multiple_of((r // TILE) * TILE, TILE)
                    bs_ref[:, pl.ds(tb, TILE)] = bst_ref[:, :]
            else:
                bs_ref[:, :] = jnp.where(lanes_L == r, band_start,
                                         bs_ref[:, :])

            return new_fwd, band_start, band_err, final_fwd, ewb

        fwd, last_start, band_err, final_fwd, _ = lax.fori_loop(
            0, L, fwd_body,
            (init_fwd, ps_ref[:, 0:1].astype(jnp.int32),
             jnp.zeros((R, 1), jnp.int32),
             jnp.full((R, bwp), neg, jnp.float32), ewb0))

        # ------------------------------------------------ traceback
        top = _first_argmax(final_fwd, bw)
        init_event_pos = top + _col_i(bs_ref[:, :], lanes_L, sl - 1)
        segsacc_ref[:, :] = jnp.zeros((R, L + 1), jnp.int32)

        def tb_body(t, carry):
            event_pos, bound_err = carry
            r = L - 1 - t
            active = r < sl
            if tiled:
                # r descends: re-stage the band-start tile on tile entry
                # and zero the segment tile (inactive rows write nothing)
                @pl.when(r % TILE == TILE - 1)
                def _():
                    tb = pl.multiple_of((r // TILE) * TILE, TILE)
                    bst_ref[:, :] = bs_ref[:, pl.ds(tb, TILE)]
                    segt_ref[:, :] = jnp.zeros((R, TILE), jnp.int32)
                bs_row = _col_i(bst_ref[:, :], lanes_T, r % TILE)
            else:
                bs_row = _col_i(bs_ref[:, :], lanes_L, r)
            bp = jnp.clip(event_pos - bs_row, 0, bw - 1)
            mv_row = (moves_ref[:, pl.ds(r // 16, 1), :].reshape(R, bwp)
                      >> (2 * (r % 16))) & 3
            # last non-stay position <= bp (lane 0 is always non-stay on
            # active rows, so the max is well-defined)
            cand = jnp.where((lanes <= bp) & (mv_row != 0), lanes, -1)
            pos = jnp.clip(jnp.max(cand, axis=1, keepdims=True), 0, bw - 1)
            mv_at = _col_i(mv_row, lanes, pos)
            bp2 = jnp.where(mv_at == 2, pos - 1, pos)
            bound_err = bound_err | (
                active &
                (jnp.minimum(bp2, bw - bp2 - 1) < band_bound_thresh)
            ).astype(jnp.int32)
            new_event_pos = jnp.where(active, bs_row + bp2, event_pos)
            if tiled:
                segt_ref[:, :] = jnp.where(
                    (lanes_T == r % TILE) & active, new_event_pos + 1,
                    segt_ref[:, :])

                @pl.when(r % TILE == 0)
                def _():
                    tb = pl.multiple_of((r // TILE) * TILE, TILE)
                    segsacc_ref[:, pl.ds(tb, TILE)] = segt_ref[:, :]
            else:
                lanes_L1 = _lane_iota(R, L + 1)
                segsacc_ref[:, :] = jnp.where(
                    (lanes_L1 == r) & active, new_event_pos + 1,
                    segsacc_ref[:, :])
            return new_event_pos, bound_err

        event_pos, bound_err = lax.fori_loop(
            0, L, tb_body,
            (init_event_pos, jnp.zeros((R, 1), jnp.int32)))

        lanes_L1 = _lane_iota(R, L + 1)
        segs_ref[:, :] = jnp.where(lanes_L1 == sl, init_event_pos + 1,
                                   segsacc_ref[:, :])
        banderr_ref[:, :] = band_err
        bounderr_ref[:, :] = bound_err
        ffwd_ref[:, :] = final_fwd

    return kernel


def _fused_scratch(R: int, L: int, bwp: int):
    """Scratch set for the fused kernel (shared by the grid and
    whole-array call paths; must match the kernel signature)."""
    return [
        pltpu.VMEM((R, (L + 15) // 16, bwp), jnp.int32),  # 2-bit moves
        pltpu.VMEM((R, L), jnp.int32),           # band starts
        pltpu.VMEM((R, L + 1), jnp.int32),       # segs accumulator
        pltpu.VMEM((R, 2 * bwp + 256), jnp.float32),  # padded fwd row
        pltpu.VMEM((R, bwp), jnp.float32),       # window assembly
        pltpu.VMEM((R, bwp), jnp.float32),       # diag assembly
        pltpu.VMEM((R, bwp), jnp.float32),       # skip assembly
        pltpu.VMEM((R, 128), jnp.float32),       # ref-mean tile
        pltpu.VMEM((R, 128), jnp.float32),       # ref-sd tile
        pltpu.VMEM((R, 128), jnp.int32),         # band-start tile
        pltpu.VMEM((R, 128), jnp.int32),         # seg tile
        pltpu.VMEM((R, bwp + 384), jnp.float32),  # sliding em window
    ]


def _pallas_dp_block(ins, kernel, R: int, L: int, bwp: int,
                     interpret: bool = False):
    """One whole-array (grid-1) kernel invocation over an R-read slice."""
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[full] * 9,
        out_specs=(full, full, full, full),
        out_shape=(
            jax.ShapeDtypeStruct((R, L + 1), jnp.int32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
            jax.ShapeDtypeStruct((R, bwp), jnp.float32),
        ),
        scratch_shapes=_fused_scratch(R, L, bwp),
        interpret=interpret,
    )(*ins)


# --------------------------------------------------------------------------
# Seq-axis-chunked variant: long reads / save-bandwidth lane
# --------------------------------------------------------------------------
#
# The fused kernel above keeps the whole (R, L, bwp) move-code matrix in
# VMEM, which caps read length at a few kb (at the DNA save bandwidth 1500
# even R=1 blows the ~16 MB budget past L ~ 2000).  Real nanopore reads run
# 10-100 kb (reference handles unbounded L by streaming rows,
# tombo/_c_dynamic_programming.pyx:314).  This pair of kernels tiles the
# sequence axis instead:
#
# * forward kernel: grid over L/Lc chunks; the carried DP state (forward
#   row, band start, band-error flag, final row) lives in VMEM scratch,
#   which persists across sequential TPU grid steps; each chunk's move
#   codes are written to an HBM-backed int8 output block (4x smaller than
#   the fused kernel's int32 scratch, and not VMEM-resident at all);
# * traceback kernel: the same grid iterated through a reversed index_map,
#   carrying the walking event position in scratch and re-reading each
#   chunk's move codes.
#
# Per-chunk VMEM is R*Lc*bwp*(4+1) bytes (int32 staging buffer + int8
# block; single-row dynamic sublane stores only lower for 32-bit types, so
# rows accumulate in int32 and convert once per chunk), independent of L.


def _make_fwd_chunk_kernel(p: DpParams, R: int, Lc: int, L: int, P: int,
                           bwp: int, E_tot: int, variant: str = None):
    bw = p.bandwidth
    half_bw = bw // 2
    variant = variant or _dp_variant()
    neg = float(NEG_LARGE)
    mask_fill = float(p.mask_fill_z_score)
    z_shift = float(p.z_shift)
    skip_pen = float(p.skip_pen)
    stay_pen = float(p.stay_pen)
    max_half_z = float(p.max_half_z_score)
    W_seg = bwp + 256
    W_f = 2 * bwp + 256

    def gather_row(ref, i, start):
        base = pl.multiple_of((start // 128) * 128, 128)
        seg = ref[pl.ds(i, 1), pl.ds(base, W_seg)]
        return pltpu.roll(seg, W_seg - (start - base), 1)

    def kernel(em_ref, nev_ref, rm_ref, rs_ref, sl_ref, ps_ref, pv_ref,
               pe_ref, sr_ref,
               moves_ref, bstarts_ref, banderr_ref, ffwd_ref, lastbs_ref,
               fwd_ref, pstart_ref, berr_ref, ffacc_ref, lbs_ref,
               mv_buf_ref, bs_buf_ref, fwdpad_ref, win_ref, dw_ref, sw_ref):
        l_idx = pl.program_id(0)
        base_r = l_idx * Lc
        lanes = _lane_iota(R, bwp)
        lanes_Lc = _lane_iota(R, Lc)
        lanes_P = _lane_iota(R, P)
        lane_lt_bw = lanes < bw

        nev = nev_ref[:, :]
        sl = sl_ref[:, :]
        pv = pv_ref[:, :]
        sr = sr_ref[:, :]
        rm = rm_ref[:, :]            # (R, Lc) this chunk's ref levels
        rs = rs_ref[:, :]
        ps = ps_ref[:, :]
        pe = pe_ref[:, :]

        @pl.when(l_idx == 0)
        def _init():
            fwd_ref[:, :] = jnp.where(lane_lt_bw, 0.0, neg)
            pstart_ref[:, :] = ps[:, 0:1].astype(jnp.int32)
            berr_ref[:, :] = jnp.zeros((R, 1), jnp.int32)
            ffacc_ref[:, :] = jnp.full((R, bwp), neg, jnp.float32)
            lbs_ref[:, :] = jnp.zeros((R, 1), jnp.int32)

        fwdpad_ref[:, :] = jnp.full((R, W_f), neg, jnp.float32)
        bs_buf_ref[:, :] = jnp.zeros((R, Lc), jnp.int32)

        def fwd_body(r_local, carry):
            fwd, prev_start, band_err, final_fwd, last_bs = carry
            r = base_r + r_local
            active = r < sl
            is_prefix = r < sr

            amax = _first_argmax(fwd, bw)
            adapt_start = prev_start + amax - half_bw + 1
            adapt_start = jnp.maximum(adapt_start, prev_start)
            overrun = adapt_start >= nev
            band_err = band_err | (
                overrun & (r < sl - 2) & active & (~is_prefix)
            ).astype(jnp.int32)
            adapt_start = jnp.minimum(adapt_start, nev - 1)

            pref_idx = jnp.minimum(r, P - 1)
            pref_start = _col_i(ps, lanes_P, pref_idx)
            band_start = jnp.where(is_prefix, pref_start, adapt_start)
            band_start = jnp.where(active, band_start, prev_start)

            lo = jnp.where(is_prefix, jnp.maximum(pv, 0), 0)
            hi = jnp.where(is_prefix,
                           jnp.minimum(_col_i(pe, lanes_P, pref_idx), nev),
                           nev)
            win = _gather_em_window(variant, em_ref, band_start, lanes,
                                    bwp, E_tot, win_ref, gather_row)
            mu = _col_f(rm, lanes_Lc, r_local)
            sd = _col_f(rs, lanes_Lc, r_local)
            z = jnp.abs((win - mu) / sd)
            if max_half_z > 0:
                z = jnp.minimum(z, max_half_z)
            shifted = z_shift - z
            abs_pos = band_start + lanes
            valid = (abs_pos >= lo) & (abs_pos < hi) & lane_lt_bw
            shifted = jnp.where(valid, shifted, mask_fill)

            diff = jnp.clip(band_start - prev_start, 0, bwp)
            same = diff == 0
            fwdpad_ref[:, pl.ds(128, bwp)] = fwd
            diag_w, skip_w = _gather_diag_skip(
                variant, fwdpad_ref, diff, lanes, bwp, W_f, W_seg,
                dw_ref, sw_ref, gather_row)
            diag_score = diag_w + shifted
            skip_score = skip_w - skip_pen

            first_skip = fwd[:, 0:1] - skip_pen
            first_diag = diag_w[:, 0:1] + shifted[:, 0:1]
            first_val = jnp.where(same, first_skip, first_diag)
            first_move = jnp.where(same, 1, 2)

            lane0 = lanes == 0
            d = jnp.maximum(diag_score, skip_score)
            s = jnp.where(lane0, 0.0, shifted - stay_pen)
            c = _cumsum_lanes(s)
            u = jnp.where(lane0, first_val, d - c)
            run = _cummax_lanes_f(u)
            new_fwd = jnp.where(lane0, first_val, c + run)

            stay_score = jnp.where(
                lane0, neg,
                pltpu.roll(new_fwd, 1, 1) - stay_pen + shifted)
            moves = jnp.zeros((R, bwp), jnp.int32)
            moves = jnp.where(diag_score > stay_score, 2, moves)
            moves = jnp.where(
                skip_score > jnp.maximum(stay_score, diag_score), 1, moves)
            moves = jnp.where(lane0, first_move, moves)
            moves = jnp.where(lane_lt_bw, moves, 0)
            new_fwd = jnp.where(lane_lt_bw, new_fwd, neg)

            new_fwd = jnp.where(active, new_fwd, fwd)
            moves = jnp.where(active, moves, 0)
            final_fwd = jnp.where(r == sl - 1, new_fwd, final_fwd)
            last_bs = jnp.where(r == sl - 1, band_start, last_bs)

            mv_buf_ref[:, pl.ds(r_local, 1), :] = moves.reshape(R, 1, bwp)
            bs_buf_ref[:, :] = jnp.where(lanes_Lc == r_local, band_start,
                                         bs_buf_ref[:, :])
            return new_fwd, band_start, band_err, final_fwd, last_bs

        fwd, prev_start, band_err, final_fwd, last_bs = lax.fori_loop(
            0, Lc, fwd_body,
            (fwd_ref[:, :], pstart_ref[:, :], berr_ref[:, :],
             ffacc_ref[:, :], lbs_ref[:, :]))

        fwd_ref[:, :] = fwd
        pstart_ref[:, :] = prev_start
        berr_ref[:, :] = band_err
        ffacc_ref[:, :] = final_fwd
        lbs_ref[:, :] = last_bs

        moves_ref[:, :, :] = mv_buf_ref[:, :, :].astype(jnp.int8)
        bstarts_ref[:, :] = bs_buf_ref[:, :]
        banderr_ref[:, :] = band_err
        ffwd_ref[:, :] = final_fwd
        lastbs_ref[:, :] = last_bs

    return kernel


def _make_tb_chunk_kernel(R: int, Lc: int, L: int, bw: int, bwp: int,
                          band_bound_thresh: int):
    n_chunks = L // Lc

    def kernel(moves_ref, bstarts_ref, sl_ref, ffwd_ref, lastbs_ref,
               segs_ref, bounderr_ref, initpos_ref,
               epos_ref, berr_ref, mv_buf_ref, seg_buf_ref):
        l_idx = pl.program_id(0)
        chunk = n_chunks - 1 - l_idx
        base_r = chunk * Lc
        lanes = _lane_iota(R, bwp)
        lanes_Lc = _lane_iota(R, Lc)
        sl = sl_ref[:, :]

        @pl.when(l_idx == 0)
        def _init():
            top = _first_argmax(ffwd_ref[:, :], bw)
            epos_ref[:, :] = top + lastbs_ref[:, :]
            berr_ref[:, :] = jnp.zeros((R, 1), jnp.int32)

        mv_buf_ref[:, :, :] = moves_ref[:, :, :].astype(jnp.int32)
        seg_buf_ref[:, :] = jnp.zeros((R, Lc), jnp.int32)
        bs = bstarts_ref[:, :]

        def tb_body(t, carry):
            event_pos, bound_err = carry
            r_local = Lc - 1 - t
            r = base_r + r_local
            active = r < sl
            bs_row = _col_i(bs, lanes_Lc, r_local)
            bp = jnp.clip(event_pos - bs_row, 0, bw - 1)
            mv_row = mv_buf_ref[:, pl.ds(r_local, 1), :].reshape(R, bwp)
            cand = jnp.where((lanes <= bp) & (mv_row != 0), lanes, -1)
            pos = jnp.clip(jnp.max(cand, axis=1, keepdims=True), 0, bw - 1)
            mv_at = _col_i(mv_row, lanes, pos)
            bp2 = jnp.where(mv_at == 2, pos - 1, pos)
            bound_err = bound_err | (
                active &
                (jnp.minimum(bp2, bw - bp2 - 1) < band_bound_thresh)
            ).astype(jnp.int32)
            new_event_pos = jnp.where(active, bs_row + bp2, event_pos)
            seg_buf_ref[:, :] = jnp.where(
                (lanes_Lc == r_local) & active, new_event_pos + 1,
                seg_buf_ref[:, :])
            return new_event_pos, bound_err

        event_pos, bound_err = lax.fori_loop(
            0, Lc, tb_body, (epos_ref[:, :], berr_ref[:, :]))
        epos_ref[:, :] = event_pos
        berr_ref[:, :] = bound_err

        segs_ref[:, :] = seg_buf_ref[:, :]
        bounderr_ref[:, :] = bound_err
        top = _first_argmax(ffwd_ref[:, :], bw)
        initpos_ref[:, :] = top + lastbs_ref[:, :]

    return kernel


def _chunked_dp_block(ins, p: DpParams, R: int, L: int, Lc: int, P: int,
                      bwp: int, band_bound_thresh: int,
                      interpret: bool = False, variant: str = None):
    """Forward + traceback over one R-read slice, chunked along the
    sequence axis (grid = L/Lc sequential steps per kernel)."""
    n_chunks = L // Lc
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fwd_kernel = _make_fwd_chunk_kernel(p, R, Lc, L, P, bwp,
                                        ins[0].shape[1], variant)
    chunk3 = pl.BlockSpec((R, Lc, bwp), lambda l: (0, l, 0),
                          memory_space=pltpu.VMEM)
    chunk2 = pl.BlockSpec((R, Lc), lambda l: (0, l),
                          memory_space=pltpu.VMEM)
    fixed = lambda c: pl.BlockSpec((R, c), lambda l: (0, 0),
                                   memory_space=pltpu.VMEM)
    moves, bstarts, band_err, ffwd, last_bs = pl.pallas_call(
        fwd_kernel,
        grid=(n_chunks,),
        in_specs=[
            fixed(ins[0].shape[1]),     # em (full)
            fixed(1),                   # n_events
            chunk2,                     # ref_means
            chunk2,                     # ref_sds
            fixed(1),                   # seq_lens
            fixed(P),                   # prefix_starts
            fixed(1),                   # prefix_valid_start
            fixed(P),                   # prefix_end
            fixed(1),                   # start_rows
        ],
        out_specs=(chunk3, chunk2, fixed(1), fixed(bwp), fixed(1)),
        out_shape=(
            jax.ShapeDtypeStruct((R, L, bwp), jnp.int8),
            jax.ShapeDtypeStruct((R, L), jnp.int32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
            jax.ShapeDtypeStruct((R, bwp), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, bwp), jnp.float32),       # carried fwd row
            pltpu.VMEM((R, 1), jnp.int32),           # carried band start
            pltpu.VMEM((R, 1), jnp.int32),           # band-error acc
            pltpu.VMEM((R, bwp), jnp.float32),       # final fwd acc
            pltpu.VMEM((R, 1), jnp.int32),           # last band start acc
            pltpu.VMEM((R, Lc, bwp), jnp.int32),     # move staging
            pltpu.VMEM((R, Lc), jnp.int32),          # band-start staging
            pltpu.VMEM((R, 2 * bwp + 256), jnp.float32),
            pltpu.VMEM((R, bwp), jnp.float32),
            pltpu.VMEM((R, bwp), jnp.float32),
            pltpu.VMEM((R, bwp), jnp.float32),
        ],
        interpret=interpret,
    )(*ins)

    tb_kernel = _make_tb_chunk_kernel(R, Lc, L, p.bandwidth, bwp,
                                      band_bound_thresh)
    rchunk3 = pl.BlockSpec((R, Lc, bwp), lambda l: (0, n_chunks - 1 - l, 0),
                           memory_space=pltpu.VMEM)
    rchunk2 = pl.BlockSpec((R, Lc), lambda l: (0, n_chunks - 1 - l),
                           memory_space=pltpu.VMEM)
    segs_lo, bound_err, init_pos = pl.pallas_call(
        tb_kernel,
        grid=(n_chunks,),
        in_specs=[rchunk3, rchunk2, fixed(1), fixed(bwp), fixed(1)],
        out_specs=(rchunk2, fixed(1), fixed(1)),
        out_shape=(
            jax.ShapeDtypeStruct((R, L), jnp.int32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, 1), jnp.int32),           # carried event pos
            pltpu.VMEM((R, 1), jnp.int32),           # bound-error acc
            pltpu.VMEM((R, Lc, bwp), jnp.int32),     # move staging
            pltpu.VMEM((R, Lc), jnp.int32),          # segs staging
        ],
        interpret=interpret,
    )(moves, bstarts, ins[4], ffwd, last_bs)
    return segs_lo, band_err, bound_err, ffwd, init_pos


def plan_dp_layout(B: int, L: int, E: int, bandwidth: int,
                   vmem_budget: int = 12 * 2 ** 20):
    """Choose the kernel layout for a padded (B, L, E) DP problem.

    Returns ("fused", r_blk) when the whole (r_blk, L, bwp) move matrix
    fits in the VMEM budget, else ("chunked", R, Lc) with the sequence
    axis tiled.  The chunked layout always exists (Lc floors at 128 and R
    at 1), so no shape routes back to the host path for capacity reasons.
    """
    bwp = _round_up(bandwidth, 128)
    E_tot = _round_up(E + 2 * bwp + 384, 128)

    def fused_vmem(r):
        # move codes are 2-bit packed: ceil(L/16) int32 words per lane
        return r * (((L + 15) // 16) * bwp * 4 + E_tot * 4 + (L + 1) * 8 +
                    L * 4 + bwp * 4 * 5 + 2 * bwp * 4 + 1024)

    # larger read blocks amortize the sequential per-row latency across
    # more lanes; 32 measured best on v5e (64 regresses via VMEM pressure)
    r_blk = 32
    while r_blk > 1 and fused_vmem(r_blk) > vmem_budget:
        r_blk //= 2
    if fused_vmem(r_blk) <= vmem_budget:
        return ("fused", r_blk)

    def chunked_vmem(r, lc):
        return r * (lc * bwp * 5 + E_tot * 4 + lc * 16 + bwp * 4 * 6 +
                    2 * bwp * 4 + 1024)

    for r in (8, 4, 2, 1):
        if B % r != 0:
            continue
        lc = min(L, 1024)
        while lc > 128 and chunked_vmem(r, lc) > vmem_budget:
            lc //= 2
        if chunked_vmem(r, lc) <= vmem_budget:
            return ("chunked", r, lc)
    return ("chunked", 1, 128)


@functools.partial(
    jax.jit,
    static_argnames=("params", "n_rows", "prefix_rows", "band_bound_thresh",
                     "block_reads", "chunk_rows", "interpret", "variant"))
def adaptive_banded_dp_tb_chunked(
        event_means: jnp.ndarray, n_events: jnp.ndarray,
        ref_means: jnp.ndarray, ref_sds: jnp.ndarray,
        seq_lens: jnp.ndarray, prefix_starts: jnp.ndarray,
        prefix_valid_start: jnp.ndarray, prefix_end: jnp.ndarray,
        start_rows: jnp.ndarray, params: DpParams,
        n_rows: int, prefix_rows: int, band_bound_thresh: int,
        block_reads: int = 8, chunk_rows: int = 512,
        interpret: bool = False, variant: str = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sequence-axis-chunked forward + traceback for long reads.

    Same contract as :func:`adaptive_banded_dp_tb`; works for any L
    (VMEM use is independent of read length — SURVEY.md §5.7's seq-axis
    tiling with carried (band_start, fwd row) state).
    """
    B, E = event_means.shape
    L, P = n_rows, prefix_rows
    bw = params.bandwidth
    bwp = _round_up(bw, 128)
    R = min(block_reads, B)
    assert B % R == 0, (B, R)
    Lc = min(chunk_rows, L)
    assert L % Lc == 0, (L, Lc)

    right = _round_up(E + 2 * bwp + 384, 128) - (E + bwp)
    em = jnp.pad(event_means.astype(jnp.float32), ((0, 0), (bwp, right)))
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    col = lambda x: i32(x).reshape(B, 1)
    ins = (em, col(n_events), ref_means.astype(jnp.float32),
           ref_sds.astype(jnp.float32), col(seq_lens), i32(prefix_starts),
           col(prefix_valid_start), i32(prefix_end), col(start_rows))

    outs = []
    for b0 in range(0, B, R):
        outs.append(_chunked_dp_block(
            tuple(a[b0:b0 + R] for a in ins), params, R, L, Lc, P, bwp,
            band_bound_thresh, interpret, variant))
    segs_lo, band_err, bound_err, ffwd, init_pos = (
        jnp.concatenate([o[i] for o in outs]) for i in range(5))

    # segs[r] = boundary of base r for r < seq_len; segs[seq_len] is the
    # top-row event position (reference: pyx:290-293)
    segs = jnp.concatenate(
        [segs_lo, jnp.zeros((B, 1), segs_lo.dtype)], axis=1)
    segs = jax.vmap(lambda s, n, v: s.at[n].set(v))(
        segs, jnp.asarray(seq_lens, jnp.int32), init_pos[:, 0] + 1)
    return (segs, band_err[:, 0] != 0, bound_err[:, 0] != 0, ffwd)


def adaptive_banded_dp_tb_sharded(
        mesh, axis_name: str, dp_args, params: DpParams,
        n_rows: int, prefix_rows: int, band_bound_thresh: int,
        layout, interpret: bool = False):
    """Run the fused/chunked Pallas DP data-parallel over a device mesh.

    ``dp_args`` is the 9-tuple of batch-axis arrays accepted by
    :func:`adaptive_banded_dp_tb`; the batch axis shards over
    ``axis_name`` and each device runs the kernel on its local shard (the
    recurrence is independent per read, so no collectives are needed —
    the mesh expression of the reference's read-level process pool,
    tombo/resquiggle.py:1859-1948).  The global batch must divide evenly
    by the mesh size and each shard by ``layout``'s block_reads."""
    from jax import shard_map
    from jax.sharding import PartitionSpec

    if layout[0] == "fused":
        fn = functools.partial(
            adaptive_banded_dp_tb, params=params, n_rows=n_rows,
            prefix_rows=prefix_rows, band_bound_thresh=band_bound_thresh,
            block_reads=layout[1], interpret=interpret)
    else:
        fn = functools.partial(
            adaptive_banded_dp_tb_chunked, params=params, n_rows=n_rows,
            prefix_rows=prefix_rows, band_bound_thresh=band_bound_thresh,
            block_reads=layout[1], chunk_rows=layout[2],
            interpret=interpret)
    spec = PartitionSpec(axis_name)
    return shard_map(
        fn, mesh=mesh, in_specs=(spec,) * 9,
        out_specs=(spec, spec, spec, spec),
        check_vma=False)(*dp_args)


@functools.partial(
    jax.jit,
    static_argnames=("params", "n_rows", "prefix_rows", "band_bound_thresh",
                     "block_reads", "interpret", "variant"))
def adaptive_banded_dp_tb(
        event_means: jnp.ndarray,       # (B, E) padded, pre-clipped, f32
        n_events: jnp.ndarray,          # (B,)
        ref_means: jnp.ndarray,         # (B, L)
        ref_sds: jnp.ndarray,           # (B, L)
        seq_lens: jnp.ndarray,          # (B,)
        prefix_starts: jnp.ndarray,     # (B, P)
        prefix_valid_start: jnp.ndarray,  # (B,)
        prefix_end: jnp.ndarray,        # (B, P) pre-clipped to int32
        start_rows: jnp.ndarray,        # (B,)
        params: DpParams,
        n_rows: int, prefix_rows: int, band_bound_thresh: int,
        block_reads: int = 8, interpret: bool = False, variant: str = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused forward + traceback.  Returns (segs (B, L+1) int32,
    band_error (B,) bool, bound_error (B,) bool, final_fwd (B, bwp) f32).

    Drop-in replacement for ``dp.adaptive_banded_dp`` followed by
    ``dp.banded_traceback`` (same row/band semantics; see module
    docstring), minus the move-matrix round-trip through HBM."""
    B, E = event_means.shape
    L, P = n_rows, prefix_rows
    bw = params.bandwidth
    bwp = _round_up(bw, 128)
    R = min(block_reads, B)
    assert B % R == 0, (B, R)

    # LEFT pad bwp (negative prefix band starts are legal); RIGHT pad
    # sized so the aligned gather window (W_seg = bwp + 256) never runs
    # off the end: max slice end = (bwp + E) + bwp + 256.
    right = _round_up(E + 2 * bwp + 384, 128) - (E + bwp)
    em = jnp.pad(event_means.astype(jnp.float32), ((0, 0), (bwp, right)))
    E_tot = em.shape[1]
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    col = lambda x: i32(x).reshape(B, 1)

    kernel = _make_kernel(params, R, L, P, E_tot, bwp, band_bound_thresh,
                          variant)
    if R < 8 and R != B:
        # Mosaic requires the sublane block dim to be a multiple of 8 or
        # equal to the array dim; for small blocks (long reads with a
        # large VMEM footprint) run one whole-array call per sub-batch
        ins = (em, col(n_events), ref_means.astype(jnp.float32),
               ref_sds.astype(jnp.float32), col(seq_lens),
               i32(prefix_starts), col(prefix_valid_start),
               i32(prefix_end), col(start_rows))
        outs = []
        for b0 in range(0, B, R):
            outs.append(_pallas_dp_block(
                tuple(a[b0:b0 + R] for a in ins), kernel, R, L, bwp,
                interpret))
        segs, band_err, bound_err, ffwd = (
            jnp.concatenate([o[i] for o in outs]) for i in range(4))
        return (segs, band_err[:, 0] != 0, bound_err[:, 0] != 0, ffwd)
    grid = (B // R,)
    bspec = lambda c: pl.BlockSpec((R, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    segs, band_err, bound_err, ffwd = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bspec(E_tot),            # em
            bspec(1),                # n_events
            bspec(L),                # ref_means
            bspec(L),                # ref_sds
            bspec(1),                # seq_lens
            bspec(P),                # prefix_starts
            bspec(1),                # prefix_valid_start
            bspec(P),                # prefix_end
            bspec(1),                # start_rows
        ],
        out_specs=(bspec(L + 1), bspec(1), bspec(1), bspec(bwp)),
        out_shape=(
            jax.ShapeDtypeStruct((B, L + 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, bwp), jnp.float32),
        ),
        scratch_shapes=_fused_scratch(R, L, bwp),
        interpret=interpret,
    )(em, col(n_events), ref_means.astype(jnp.float32),
      ref_sds.astype(jnp.float32), col(seq_lens), i32(prefix_starts),
      col(prefix_valid_start), i32(prefix_end), col(start_rows))
    return (segs, band_err[:, 0] != 0, bound_err[:, 0] != 0, ffwd)
