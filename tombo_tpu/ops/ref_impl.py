"""Trusted host (numpy) implementations of every compute kernel.

These are *behavioral* re-implementations of the reference's native kernels
(reference: tombo/_c_dynamic_programming.pyx, tombo/_c_helper.pyx), written
in vectorized numpy from the algorithm definitions.  They serve three roles:

1. golden oracles for the batched JAX/Pallas device kernels (tests assert
   device == host on identical inputs);
2. exact host fallbacks for inherently tiny / irregular work (e.g. the
   skipped-base raw-signal DP windows);
3. executable documentation of the math.

Float64 throughout, matching the reference's DP dtype.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..errors import TomboTpuError


# --------------------------------------------------------------------------
# Segment statistics (reference: tombo/_c_helper.pyx:22-87)
# --------------------------------------------------------------------------

def mean_std(values: np.ndarray) -> Tuple[float, float]:
    """Mean and population standard deviation
    (reference: tombo/_c_helper.pyx:22 ``c_mean_std``)."""
    values = np.asarray(values, dtype=np.float64)
    return float(values.mean()), float(values.std())


def new_means(norm_signal: np.ndarray, segs: np.ndarray) -> np.ndarray:
    """Per-segment means from signal and boundary positions
    (reference: tombo/_c_helper.pyx:59 ``c_new_means``).

    Implemented as a cumulative-sum difference: mean_i =
    (cs[segs[i+1]] - cs[segs[i]]) / (segs[i+1] - segs[i]).
    """
    norm_signal = np.asarray(norm_signal, dtype=np.float64)
    segs = np.asarray(segs, dtype=np.int64)
    cs = np.concatenate([[0.0], np.cumsum(norm_signal)])
    lens = np.diff(segs)
    return (cs[segs[1:]] - cs[segs[:-1]]) / lens


def new_mean_stds(norm_signal: np.ndarray, segs: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-segment means and population SDs
    (reference: tombo/_c_helper.pyx:38 ``c_new_mean_stds``)."""
    norm_signal = np.asarray(norm_signal, dtype=np.float64)
    segs = np.asarray(segs, dtype=np.int64)
    cs = np.concatenate([[0.0], np.cumsum(norm_signal)])
    cs2 = np.concatenate([[0.0], np.cumsum(norm_signal ** 2)])
    lens = np.diff(segs).astype(np.float64)
    means = (cs[segs[1:]] - cs[segs[:-1]]) / lens
    ex2 = (cs2[segs[1:]] - cs2[segs[:-1]]) / lens
    var = np.maximum(ex2 - means ** 2, 0.0)
    return means, np.sqrt(var)


def apply_outlier_thresh(raw_signal: np.ndarray, lower_lim: float,
                         upper_lim: float) -> np.ndarray:
    """Clip signal into [lower_lim, upper_lim]
    (reference: tombo/_c_helper.pyx:73 ``c_apply_outlier_thresh``)."""
    return np.clip(np.asarray(raw_signal, dtype=np.float64),
                   lower_lim, upper_lim)


# --------------------------------------------------------------------------
# Event detection / changepoint selection
# (reference: tombo/_c_helper.pyx:89-202)
# --------------------------------------------------------------------------

def cpt_scores_diff(raw_signal: np.ndarray, running_stat_width: int
                    ) -> np.ndarray:
    """DNA changepoint score: |sum(left window) - sum(right window)| of two
    adjacent ``running_stat_width`` windows at every interior position
    (score part of reference: tombo/_c_helper.pyx:89-98)."""
    raw_signal = np.asarray(raw_signal, dtype=np.float64)
    cs = np.concatenate([[0.0], np.cumsum(raw_signal)])
    w = running_stat_width
    return np.abs(2.0 * cs[w:-w] - cs[:-2 * w] - cs[2 * w:])


def cpt_scores_t_test(raw_signal: np.ndarray, running_stat_width: int
                      ) -> np.ndarray:
    """RNA changepoint score: |m1 - m2| / sqrt(ss1 + ss2) over two adjacent
    windows; a monotonic transform of the Welch t-score (score part of
    reference: tombo/_c_helper.pyx:144-179)."""
    x = np.asarray(raw_signal, dtype=np.float64)
    w = running_stat_width
    n_cands = x.shape[0] - 2 * w
    if n_cands <= 0:
        return np.empty(0, dtype=np.float64)
    cs = np.concatenate([[0.0], np.cumsum(x)])
    cs2 = np.concatenate([[0.0], np.cumsum(x ** 2)])

    def win_stats(start_off):
        s = cs[start_off + w:start_off + w + n_cands] - \
            cs[start_off:start_off + n_cands]
        s2 = cs2[start_off + w:start_off + w + n_cands] - \
            cs2[start_off:start_off + n_cands]
        m = s / w
        ss = s2 - (s * s) / w
        return m, ss

    m1, ss1 = win_stats(0)
    m2, ss2 = win_stats(w)
    denom = ss1 + ss2
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.abs(m1 - m2) / np.sqrt(denom)
    t[denom == 0] = 0.0
    return t


def greedy_select_cpts(scores: np.ndarray, min_base_obs: int,
                       num_cpts: int) -> np.ndarray:
    """Greedy top-``num_cpts`` changepoint selection with a minimum spacing
    blacklist, in descending-score order (selection part of reference:
    tombo/_c_helper.pyx:100-120).

    Candidates are visited in the exact order of ``np.argsort(scores)[::-1]``
    (so score ties resolve identically to the reference).  An accepted
    candidate at ``p`` blacklists ``[p - min_base_obs + 1, p + min_base_obs - 1]``.
    Returns *unshifted* candidate positions in acceptance order.
    """
    order = np.argsort(scores, kind="stable")[::-1]
    n_cands = scores.shape[0]
    if num_cpts <= 0:
        return np.empty(0, dtype=np.int64)
    accepted = np.empty(num_cpts, dtype=np.int64)
    blacklist = np.zeros(n_cands + 2 * min_base_obs, dtype=bool)
    n_accepted = 0
    for cand in order:
        if blacklist[cand + min_base_obs]:
            continue
        accepted[n_accepted] = cand
        n_accepted += 1
        if n_accepted == num_cpts:
            return accepted
        blacklist[cand + 1:cand + 2 * min_base_obs] = True
    raise TomboTpuError("Fewer changepoints found than requested")


def valid_cpts_w_cap(raw_signal: np.ndarray, min_base_obs: int,
                     running_stat_width: int, num_cpts: int) -> np.ndarray:
    """DNA event detection: running-difference score + capped greedy pick,
    returned sorted (reference: tombo/_c_helper.pyx:89 ``c_valid_cpts_w_cap``
    + sort wrapper tombo/tombo_helper.py:76-82).

    Note the reference treats the first accepted candidate specially (its own
    position is *not* blacklisted, only its neighborhood) — with distinct
    positions this is equivalent to the uniform rule used here.
    """
    scores = cpt_scores_diff(raw_signal, running_stat_width)
    cpts = greedy_select_cpts(scores, min_base_obs, num_cpts)
    cpts = cpts + running_stat_width
    cpts.sort()
    return cpts


def valid_cpts_w_cap_t_test(raw_signal: np.ndarray, min_base_obs: int,
                            running_stat_width: int, num_cpts: int
                            ) -> np.ndarray:
    """RNA event detection: t-score + capped greedy pick, sorted
    (reference: tombo/_c_helper.pyx:144 ``c_valid_cpts_w_cap_t_test``)."""
    scores = cpt_scores_t_test(raw_signal, running_stat_width)
    cpts = greedy_select_cpts(scores, min_base_obs, num_cpts)
    cpts = cpts + running_stat_width
    cpts.sort()
    return cpts


def valid_cpts(raw_signal: np.ndarray, min_base_obs: int,
               running_stat_width: int) -> np.ndarray:
    """Uncapped changepoint detection (reference: tombo/_c_helper.pyx:122
    ``c_valid_cpts``).  Note the reference blacklists one extra position on
    the right in this variant (range ``+min_base_obs+1``)."""
    scores = cpt_scores_diff(raw_signal, running_stat_width)
    order = np.argsort(scores, kind="stable")[::-1]
    n_cands = scores.shape[0]
    first = order[0]
    accepted = [first]
    blacklist = np.zeros(n_cands + 2 * min_base_obs + 2, dtype=bool)
    for cand in order[1:]:
        if blacklist[cand + min_base_obs]:
            continue
        accepted.append(cand)
        blacklist[cand + 1:cand + 2 * min_base_obs + 1] = True
    return np.array(accepted, dtype=np.int64) + running_stat_width


# --------------------------------------------------------------------------
# Banded dynamic programming (reference: tombo/_c_dynamic_programming.pyx)
# --------------------------------------------------------------------------

def base_z_scores(b_sig: np.ndarray, ref_mean: float, ref_sd: float,
                  do_winsorize_z: bool = False,
                  max_half_z_score: float = 10.0) -> np.ndarray:
    """Lower-tail half z-scores of observations vs one (mean, sd), optionally
    winsorized (reference: tombo/_c_dynamic_programming.pyx:17
    ``c_base_z_scores``)."""
    z = -np.abs((np.asarray(b_sig, np.float64) - ref_mean) / ref_sd)
    if do_winsorize_z:
        z = np.maximum(z, -max_half_z_score)
    return z


def process_band_row(prev_fwd: np.ndarray, shifted_z: np.ndarray,
                     first_val: float, first_move: int,
                     stay_pen: float, skip_pen: float,
                     band_starts_diff: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """One DP band row: stay/skip/diag recurrence over band positions.

    Behavioral equivalent of the sequential inner loop
    (reference: tombo/_c_dynamic_programming.pyx:202-236 ``c_process_band``),
    reformulated as a max-plus prefix scan so it vectorizes (this same
    formulation is used by the device kernel):

        fwd[p] = max(fwd[p-1] + s[p], d[p]),   s[p] = z[p] - stay_pen
        => fwd[p] = c[p] + cummax(u)[p],       c = prefix-sum of s (c[0]=0),
           u[0] = first_val, u[p] = d[p] - c[p]

    where d[p] = max(diag, skip) from the previous row with band-edge
    validity.  Move codes: 0=stay, 1=skip, 2=diag; ties resolve
    stay > diag > skip exactly as the reference's comparison chain.
    ``first_val``/``first_move`` are the externally-set position-0 values
    (reference: pyx:261-270 and pyx:392-401).
    """
    bandwidth = shifted_z.shape[0]
    diff = band_starts_diff
    p = np.arange(bandwidth)
    prev_b_pos = p + diff

    neg_inf = -np.inf
    # diagonal: prev_fwd[prev_b_pos - 1] valid iff prev_b_pos-1 in [0, bw)
    diag_idx = prev_b_pos - 1
    diag_valid = (diag_idx >= 0) & (diag_idx < bandwidth)
    diag_score = np.where(
        diag_valid, prev_fwd[np.clip(diag_idx, 0, bandwidth - 1)],
        neg_inf) + shifted_z
    # skip: prev_fwd[prev_b_pos] valid iff prev_b_pos in [0, bw)
    skip_valid = prev_b_pos < bandwidth
    skip_score = np.where(
        skip_valid, prev_fwd[np.clip(prev_b_pos, 0, bandwidth - 1)],
        neg_inf) - skip_pen

    d = np.maximum(diag_score, skip_score)

    s = shifted_z - stay_pen
    c = np.concatenate([[0.0], np.cumsum(s[1:])])
    u = d - c
    u[0] = first_val
    run = np.maximum.accumulate(u)
    fwd = c + run

    # move codes from the final fwd row (reference priority order)
    stay_score = np.empty(bandwidth)
    stay_score[0] = neg_inf
    stay_score[1:] = fwd[:-1] - stay_pen + shifted_z[1:]
    moves = np.zeros(bandwidth, dtype=np.int8)
    moves[diag_score > stay_score] = 2
    best_sd = np.maximum(stay_score, diag_score)
    moves[skip_score > best_sd] = 1
    moves[0] = first_move
    # re-assert exact fwd at position 0
    fwd[0] = first_val
    return fwd, moves


def banded_forward_pass(shifted_z_scores: np.ndarray,
                        event_starts: np.ndarray,
                        skip_pen: float, stay_pen: float
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Static-band DP over a precomputed z-score matrix
    (reference: tombo/_c_dynamic_programming.pyx:240
    ``c_banded_forward_pass``)."""
    n_bases, bandwidth = shifted_z_scores.shape
    fwd_pass = np.empty((n_bases + 1, bandwidth), dtype=np.float64)
    fwd_pass_tb = np.zeros((n_bases + 1, bandwidth), dtype=np.int8)
    fwd_pass[0] = 0.0

    for seq_pos in range(n_bases):
        diff = (event_starts[seq_pos] - event_starts[seq_pos - 1]
                if seq_pos > 0 else 0)
        if diff == 0:
            first_val = fwd_pass[seq_pos, 0] - skip_pen
            first_move = 1
        else:
            first_val = (fwd_pass[seq_pos, diff - 1] +
                         shifted_z_scores[seq_pos, 0])
            first_move = 2
        fwd_pass[seq_pos + 1], fwd_pass_tb[seq_pos + 1] = process_band_row(
            fwd_pass[seq_pos], shifted_z_scores[seq_pos], first_val,
            first_move, stay_pen, skip_pen, diff)

    return fwd_pass, fwd_pass_tb


def adaptive_banded_forward_pass(
        fwd_pass: np.ndarray, fwd_pass_tb: np.ndarray,
        event_starts: np.ndarray, event_means: np.ndarray,
        r_ref_means: np.ndarray, r_ref_sds: np.ndarray,
        z_shift: float, skip_pen: float, stay_pen: float,
        start_seq_pos: int, mask_fill_z_score: float,
        do_winsorize_z: bool, max_half_z_score: float,
        return_z_scores: bool = False) -> Optional[np.ndarray]:
    """Adaptive-band DP: place each row's band at the argmax of the previous
    forward row, compute shifted winsorized z-scores for the band, run the
    band recurrence (reference: tombo/_c_dynamic_programming.pyx:314
    ``c_adaptive_banded_forward_pass``).  Mutates ``fwd_pass``,
    ``fwd_pass_tb`` and ``event_starts`` in place, as the reference does.
    """
    n_bases = fwd_pass.shape[0] - 1
    bandwidth = fwd_pass.shape[1]
    half_bandwidth = bandwidth // 2
    n_events = event_means.shape[0]
    all_z = (np.empty((n_bases - start_seq_pos, bandwidth))
             if return_z_scores else None)

    for seq_pos in range(start_seq_pos, n_bases):
        prev_band_start = event_starts[seq_pos - 1]
        curr_band_start = (prev_band_start +
                           int(np.argmax(fwd_pass[seq_pos])) -
                           half_bandwidth + 1)
        if curr_band_start < prev_band_start:
            curr_band_start = prev_band_start
        if curr_band_start >= n_events:
            if seq_pos < n_bases - 2:
                raise TomboTpuError(
                    "Adaptive signal to sequence alignment extended beyond "
                    "raw signal")
            curr_band_start = n_events - 1
        event_starts[seq_pos] = curr_band_start

        n_valid = min(bandwidth, n_events - curr_band_start)
        z = -np.abs((event_means[curr_band_start:curr_band_start + n_valid] -
                     r_ref_means[seq_pos]) / r_ref_sds[seq_pos])
        if do_winsorize_z:
            z = np.maximum(z, -max_half_z_score)
        shifted_z = np.full(bandwidth, mask_fill_z_score, dtype=np.float64)
        shifted_z[:n_valid] = z_shift + z
        if return_z_scores:
            all_z[seq_pos - start_seq_pos] = shifted_z

        diff = curr_band_start - prev_band_start
        if diff == 0:
            first_val = fwd_pass[seq_pos, 0] - skip_pen
            first_move = 1
        else:
            first_val = fwd_pass[seq_pos, diff - 1] + shifted_z[0]
            first_move = 2
        fwd_pass[seq_pos + 1], fwd_pass_tb[seq_pos + 1] = process_band_row(
            fwd_pass[seq_pos], shifted_z, first_val, first_move,
            stay_pen, skip_pen, diff)

    return all_z


def banded_traceback(fwd_pass_tb: np.ndarray, event_starts: np.ndarray,
                     band_pos: int, band_boundary_thresh: int = -1
                     ) -> np.ndarray:
    """Walk the move matrix back from ``band_pos`` on the final row to
    produce per-base event boundaries (reference:
    tombo/_c_dynamic_programming.pyx:281 ``c_banded_traceback``)."""
    n_bases = fwd_pass_tb.shape[0] - 1
    bandwidth = fwd_pass_tb.shape[1]
    seq_poss = np.empty(n_bases + 1, dtype=np.int64)
    curr_event_pos = band_pos + event_starts[n_bases - 1]
    seq_poss[n_bases] = curr_event_pos + 1
    for curr_seq_pos in range(n_bases, 0, -1):
        band_pos = curr_event_pos - event_starts[curr_seq_pos - 1]
        while fwd_pass_tb[curr_seq_pos, band_pos] == 0:
            band_pos -= 1
        if fwd_pass_tb[curr_seq_pos, band_pos] == 2:
            band_pos -= 1
        if (band_boundary_thresh >= 0 and
                min(band_pos, bandwidth - band_pos - 1) <
                band_boundary_thresh):
            raise TomboTpuError(
                "Read event to sequence alignment extends beyond bandwidth")
        curr_event_pos = event_starts[curr_seq_pos - 1] + band_pos
        seq_poss[curr_seq_pos - 1] = curr_event_pos + 1

    return seq_poss


# --------------------------------------------------------------------------
# Raw-signal (skipped base) dynamic programming
# (reference: tombo/_c_dynamic_programming.pyx:34-183)
# --------------------------------------------------------------------------

def reg_z_scores(r_sig: np.ndarray, r_ref_means: np.ndarray,
                 r_ref_sds: np.ndarray, r_b_starts: np.ndarray,
                 reg_start: int, reg_end: int, max_base_shift: int,
                 min_obs_per_base: int,
                 max_half_z_score: Optional[float] = None
                 ) -> List[Tuple[np.ndarray, Tuple[int, int]]]:
    """Per-base signal windows (clipped so a legal min-obs path exists) with
    half z-scores vs that base's expected level
    (reference: tombo/_c_dynamic_programming.pyx:34 ``c_reg_z_scores``)."""
    do_winsorize = max_half_z_score is not None
    reg_len = reg_end - reg_start
    base_range = np.arange(reg_start, reg_end)

    sig_starts = np.empty(reg_len, dtype=np.int64)
    prev_start = None
    for idx, base_i in enumerate(base_range):
        b_start = r_b_starts[max(reg_start, base_i - max_base_shift)]
        if prev_start is not None and b_start < prev_start + min_obs_per_base:
            b_start = prev_start + min_obs_per_base
        sig_starts[idx] = b_start
        prev_start = b_start

    sig_ends = np.empty(reg_len, dtype=np.int64)
    prev_end = None
    for ridx, base_i in enumerate(base_range[::-1]):
        b_end = r_b_starts[min(reg_end, base_i + max_base_shift + 1)]
        if prev_end is not None and b_end > prev_end - min_obs_per_base:
            b_end = prev_end - min_obs_per_base
        sig_ends[reg_len - ridx - 1] = b_end
        prev_end = b_end

    out = []
    reg_sig_offset = r_b_starts[reg_start]
    for idx, base_i in enumerate(base_range):
        b_start, b_end = sig_starts[idx], sig_ends[idx]
        z = base_z_scores(r_sig[b_start:b_end], r_ref_means[base_i],
                          r_ref_sds[base_i], do_winsorize,
                          max_half_z_score if do_winsorize else 0.0)
        out.append((z, (b_start - reg_sig_offset, b_end - reg_sig_offset)))
    return out


def base_forward_pass(b_data, b_start, b_end, prev_b_data, prev_b_start,
                      prev_b_end, prev_b_fwd_data, prev_b_last_diag,
                      min_obs_per_base):
    """Raw-signal DP row update with min-obs lag enforcement
    (reference: tombo/_c_dynamic_programming.pyx:99
    ``c_base_forward_pass``)."""
    b_len = b_end - b_start
    b_fwd_data = np.empty(b_len, dtype=np.float64)
    b_last_diag = np.empty(b_len, dtype=np.int64)
    prev_cumsum = np.cumsum(prev_b_data)

    b_fwd_data[0] = b_data[0] + prev_b_fwd_data[b_start - prev_b_start - 1]
    b_last_diag[0] = 1

    for pos in range(b_start + 1, prev_b_end + 1):
        lag = 1
        while (prev_b_last_diag[pos - prev_b_start - lag] + lag
               <= min_obs_per_base):
            lag += 1
        diag_score = prev_b_fwd_data[pos - prev_b_start - lag]
        if lag > 1:
            diag_score += (prev_cumsum[pos - prev_b_start - 1] -
                           prev_cumsum[pos - prev_b_start - lag])
        stay_score = b_fwd_data[pos - b_start - 1]
        if diag_score > stay_score:
            pos_score, pos_diag = diag_score, 1
        else:
            pos_score = stay_score
            pos_diag = b_last_diag[pos - b_start - 1] + 1
        b_fwd_data[pos - b_start] = b_data[pos - b_start] + pos_score
        b_last_diag[pos - b_start] = pos_diag

    if b_end > prev_b_end + 1:
        # tail past the previous base's window: pure stay cumsum
        start_i = prev_b_end - b_start
        fwd_value = b_fwd_data[start_i]
        last_diag = b_last_diag[start_i]
        for i in range(start_i + 1, b_len):
            fwd_value += b_data[i]
            last_diag += 1
            b_fwd_data[i] = fwd_value
            b_last_diag[i] = last_diag

    return b_fwd_data, b_last_diag


def base_traceback(curr_b_data, curr_start, next_b_data, next_start,
                   next_end, sig_start, min_obs_per_base):
    """Raw-signal DP traceback of one base boundary
    (reference: tombo/_c_dynamic_programming.pyx:165 ``c_base_traceback``)."""
    curr_base_sig = 1
    for sig_pos in range(sig_start, -1, -1):
        curr_base_sig += 1
        if curr_base_sig <= min_obs_per_base or sig_pos - 1 >= next_end:
            continue
        if (sig_pos <= curr_start or
                next_b_data[sig_pos - next_start - 1] >
                curr_b_data[sig_pos - curr_start - 1]):
            return sig_pos
    raise TomboTpuError("Raw-signal traceback failed to find boundary")


def raw_forward_pass(reg_zs, min_obs_per_base):
    """Forward pass over per-base raw z-score windows
    (reference: tombo/resquiggle.py:345 ``raw_forward_pass``)."""
    prev_b_data, (prev_b_start, prev_b_end) = reg_zs[0]
    prev_b_fwd_data = np.cumsum(prev_b_data)
    prev_b_last_diag = np.full(prev_b_end - prev_b_start, min_obs_per_base,
                               dtype=np.int64)
    reg_fwd_scores = [(prev_b_fwd_data, prev_b_last_diag,
                       (prev_b_start, prev_b_end))]
    for b_data, (b_start, b_end) in reg_zs[1:]:
        b_fwd_data, prev_b_last_diag = base_forward_pass(
            b_data, b_start, b_end, prev_b_data, prev_b_start, prev_b_end,
            prev_b_fwd_data, prev_b_last_diag, min_obs_per_base)
        reg_fwd_scores.append(
            (b_fwd_data, prev_b_last_diag, (b_start, b_end)))
        prev_b_data, prev_b_fwd_data, prev_b_start, prev_b_end = (
            b_data, b_fwd_data, b_start, b_end)
    return reg_fwd_scores


def raw_traceback(reg_fwd_scores, min_obs_per_base):
    """Traceback over raw-signal forward scores
    (reference: tombo/resquiggle.py:382 ``raw_traceback``)."""
    new_segs = np.empty(len(reg_fwd_scores) - 1, dtype=np.int64)
    curr_b_data, _, (curr_start, curr_end) = reg_fwd_scores[-1]
    next_b_data, _, (next_start, next_end) = reg_fwd_scores[-2]
    new_segs[-1] = base_traceback(
        curr_b_data, curr_start, next_b_data, next_start, next_end,
        curr_end - 1, min_obs_per_base)
    for base_pos in range(len(reg_fwd_scores) - 3, -1, -1):
        curr_b_data, curr_start = next_b_data, next_start
        next_b_data, _, (next_start, next_end) = reg_fwd_scores[base_pos]
        new_segs[base_pos] = base_traceback(
            curr_b_data, curr_start, next_b_data, next_start, next_end,
            new_segs[base_pos + 1] - 1, min_obs_per_base)
    return new_segs


# --------------------------------------------------------------------------
# Likelihood ratios (reference: tombo/_c_helper.pyx:277-358)
# --------------------------------------------------------------------------

def calc_llh_ratio(reg_means, reg_ref_means, reg_alt_means,
                   reg_ref_vars, reg_alt_vars) -> float:
    """Standard log-likelihood ratio
    (reference: tombo/_c_helper.pyx:277 ``c_calc_llh_ratio``)."""
    ref_z = (reg_means - reg_ref_means) ** 2 / reg_ref_vars
    alt_z = (reg_means - reg_alt_means) ** 2 / reg_alt_vars
    return float(np.sum(alt_z) + np.sum(np.log(reg_alt_vars)) -
                 np.sum(ref_z) - np.sum(np.log(reg_ref_vars)))


def calc_llh_ratio_const_var(reg_means, reg_ref_means, reg_alt_means,
                             const_var) -> float:
    """Constant-variance LLR (reference: tombo/_c_helper.pyx:298
    ``c_calc_llh_ratio_const_var``)."""
    diff = ((reg_means - reg_alt_means) ** 2 -
            (reg_means - reg_ref_means) ** 2)
    return float(np.sum(diff / const_var))


def calc_scaled_llh_ratio_const_var(reg_means, reg_ref_means, reg_alt_means,
                                    const_var, scale_factor,
                                    density_height_factor,
                                    density_height_power) -> float:
    """Outlier-robust scaled LLR — the default alt-model statistic
    (reference: tombo/_c_helper.pyx:313
    ``c_calc_scaled_llh_ratio_const_var``; math documented at
    docs/modified_base_detection.rst:44-50)."""
    ref_mean = np.asarray(reg_ref_means, np.float64)
    alt_mean = np.asarray(reg_alt_means, np.float64)
    obs = np.asarray(reg_means, np.float64)
    valid = ref_mean != alt_mean
    if not np.any(valid):
        return 0.0
    ref_mean, alt_mean, obs = ref_mean[valid], alt_mean[valid], obs[valid]
    scale_mean = (alt_mean + ref_mean) / 2
    scale_diff = obs - scale_mean
    means_diff = np.abs(alt_mean - ref_mean)
    contrib = (np.exp(-scale_diff ** 2 / (scale_factor * const_var)) *
               ((obs - alt_mean) ** 2 - (obs - ref_mean) ** 2) /
               (const_var * means_diff ** density_height_power *
                density_height_factor))
    return float(np.sum(contrib))


# --------------------------------------------------------------------------
# Theil-Sen slopes (reference: tombo/_c_helper.pyx:362-377)
# --------------------------------------------------------------------------

def compute_slopes(r_event_means: np.ndarray, r_model_means: np.ndarray,
                   max_slope: float = 1000.0) -> np.ndarray:
    """All-pairs slopes for the Theil-Sen estimator
    (reference: tombo/_c_helper.pyx:362 ``c_compute_slopes``).  Pairs with
    equal event means get ``max_slope``.  Returned in (i<j) lexicographic
    pair order, matching ``itertools.combinations``."""
    n = r_event_means.shape[0]
    iu = np.triu_indices(n, k=1)
    de = r_event_means[iu[0]] - r_event_means[iu[1]]
    dm = r_model_means[iu[0]] - r_model_means[iu[1]]
    with np.errstate(divide="ignore", invalid="ignore"):
        slopes = dm / de
    slopes[de == 0] = max_slope
    return slopes


# --------------------------------------------------------------------------
# Rolling percentile difference (RNA stall metric, percentile method)
# (reference: tombo/_c_helper.pyx:221-275)
# --------------------------------------------------------------------------

def compute_running_pctl_diffs(arr: np.ndarray, window_size: int,
                               lower_pctl: float, upper_pctl: float
                               ) -> np.ndarray:
    """Rolling-window (upper - lower) percentile difference
    (reference: tombo/_c_helper.pyx:221 ``c_compute_running_pctl_diffs``).

    The reference maintains an incrementally-sorted window; here we use a
    vectorized strided partition which produces the same order-statistic
    values (indices ``int((w-1)*pctl/100)`` of the sorted window).
    """
    arr = np.asarray(arr)
    w = int(window_size)
    lo_idx = int((w - 1) * lower_pctl / 100.0)
    hi_idx = int((w - 1) * upper_pctl / 100.0)
    n_out = arr.shape[0] - w + 1
    if n_out <= 0:
        return np.empty(0, dtype=arr.dtype)
    windows = np.lib.stride_tricks.sliding_window_view(arr, w)
    part = np.partition(windows, (lo_idx, hi_idx), axis=1)
    return part[:, hi_idx] - part[:, lo_idx]
