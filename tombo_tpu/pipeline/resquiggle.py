"""Re-squiggle: assign raw signal to genomic sequence.

Single-read reference path (numpy + native host kernels), behaviorally
matching the reference pipeline (reference: tombo/resquiggle.py).  The
batched TPU lane (tombo_tpu/pipeline/batch.py) produces identical results and
is cross-validated against this path in tests.

Call flow mirrors the reference (SURVEY.md §3.1):
    map_read -> resquiggle_read
        -> segment_signal (normalize + event detection)
        -> find_adaptive_base_assignment (start discovery + adaptive DP)
        -> resolve_skipped_bases_with_raw (raw-signal deletion fix)
        -> Theil-Sen sequence-fitted rescaling (<= 3 iterations)
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .. import config
from ..config import (DEL_FIX_WINDOW, EXTRA_SIG_FACTOR, MASK_BASES,
                      MASK_FILL_Z_SCORE, MAX_DEL_FIX_WINDOW, MAX_RAW_CPTS,
                      MIN_EVENT_TO_SEQ_RATIO, ResquiggleParams,
                      SIG_MATCH_THRESH, START_CLIP_PARAMS)
from ..errors import TomboTpuError
from ..ops import ref_impl
from ..native import greedy_cpts_batch
from ..types import (AlignInfo, DpResults, GenomeLocation, ResquiggleResults,
                     ScaleValues, SeqSampleType, SequenceData)
from ..seq import rev_comp


# --------------------------------------------------------------------------
# Normalization (host path; reference: tombo/tombo_stats.py:482-573)
# --------------------------------------------------------------------------

def normalize_raw_signal(all_raw_signal, read_start_rel_to_raw=0,
                         read_obs_len=None, norm_type="median",
                         outlier_thresh=None, channel_info=None,
                         scale_values: Optional[ScaleValues] = None,
                         const_scale=None, event_means=None,
                         model_means=None, model_inv_vars=None):
    """Normalize raw signal (reference: tombo/tombo_stats.py:482
    ``normalize_raw_signal``).  Returns (norm_signal, ScaleValues).

    ``pA_raw`` converts DAC values via channel offset/range/digitisation;
    ``pA`` additionally fits a method-of-moments k-mer correction from
    basecaller event means vs pore-model means (reference:
    tombo/tombo_stats.py:528-541, nanopolish-style drift correction)."""
    if read_obs_len is None:
        read_obs_len = all_raw_signal.shape[0] - read_start_rel_to_raw
    raw_signal = np.asarray(
        all_raw_signal[read_start_rel_to_raw:
                       read_start_rel_to_raw + read_obs_len], np.float64)

    if scale_values is None:
        if norm_type == "none":
            shift, scale = 0.0, 1.0
        elif norm_type in ("pA_raw", "pA"):
            if channel_info is None:
                raise TomboTpuError("pA normalization requires channel info")
            shift = -1.0 * channel_info.offset
            scale = channel_info.digitisation / channel_info.range
            if norm_type == "pA":
                if event_means is None or model_means is None:
                    raise TomboTpuError(
                        "pA normalization requires basecaller event means "
                        "and a pore model")
                shift, scale, _, _ = calc_kmer_fitted_shift_scale(
                    shift, scale, event_means, model_means, model_inv_vars,
                    method="mom")
        elif norm_type == "median":
            shift = float(np.median(raw_signal))
            scale = float(np.median(np.abs(raw_signal - shift)))
        elif norm_type == "median_const_scale":
            assert const_scale is not None
            shift = float(np.median(raw_signal))
            scale = float(const_scale)
        elif norm_type == "robust_median":
            shift = float(np.mean(np.percentile(
                raw_signal, config.ROBUST_QUANTS)))
            scale = float(np.median(np.abs(raw_signal - shift)))
        else:
            raise TomboTpuError("Invalid normalization type: " + norm_type)
    else:
        shift, scale = scale_values.shift, scale_values.scale

    norm_signal = (raw_signal - shift) / scale

    lower_lim, upper_lim = None, None
    if outlier_thresh is not None or scale_values is not None:
        if outlier_thresh is not None:
            read_med = np.median(norm_signal)
            read_mad = np.median(np.abs(norm_signal - read_med))
            lower_lim = read_med - read_mad * outlier_thresh
            upper_lim = read_med + read_mad * outlier_thresh
        else:
            lower_lim = scale_values.lower_lim
            upper_lim = scale_values.upper_lim
        if lower_lim is not None and upper_lim is not None:
            norm_signal = np.clip(norm_signal, lower_lim, upper_lim)

    return norm_signal, ScaleValues(shift, scale, lower_lim, upper_lim,
                                    outlier_thresh)


def get_scale_values_from_events(all_raw_signal, valid_cpts, outlier_thresh,
                                 num_events=None, max_frac_events=None
                                 ) -> ScaleValues:
    """RNA event-based scale estimation avoiding the adapter
    (reference: tombo/tombo_stats.py:217-233)."""
    if num_events is not None or max_frac_events is not None:
        if (num_events is None or
                valid_cpts.shape[0] * max_frac_events < num_events):
            num_events = int(valid_cpts.shape[0] * max_frac_events)
        valid_cpts = valid_cpts[:num_events]
    event_means = ref_impl.new_means(
        np.asarray(all_raw_signal, np.float64), valid_cpts)
    read_med = float(np.median(event_means))
    read_mad = float(np.median(np.abs(event_means - read_med)))
    return ScaleValues(shift=read_med, scale=read_mad,
                       lower_lim=-outlier_thresh, upper_lim=outlier_thresh,
                       outlier_thresh=None)


# --------------------------------------------------------------------------
# Stall identification (reference: tombo/tombo_stats.py:269-368)
# --------------------------------------------------------------------------

def identify_stalls(all_raw_signal, stall_params, return_metric=False):
    """Find pore-stall intervals via the running mean-difference (default) or
    rolling-percentile methods (reference: tombo/tombo_stats.py:269
    ``identify_stalls``)."""
    sp = stall_params
    x = np.asarray(all_raw_signal)
    if x.shape[0] < sp.window_size:
        return ([], np.full(x.shape[0], np.nan)) if return_metric else []

    stall_metric = np.full(x.shape, np.nan, dtype=np.float64)
    start_offset = int(sp.window_size * 0.5)
    end_offset = x.shape[0] - sp.window_size + start_offset + 1

    if sp.lower_pctl is not None and sp.upper_pctl is not None:
        stall_metric[start_offset:end_offset] = \
            ref_impl.compute_running_pctl_diffs(
                x, sp.window_size, sp.lower_pctl, sp.upper_pctl)
    elif sp.n_windows is not None and sp.mini_window_size is not None:
        assert sp.window_size == sp.mini_window_size * sp.n_windows
        # moving averages of mini windows
        ma = np.cumsum(np.asarray(x, np.float64))
        ma[sp.mini_window_size:] = (ma[sp.mini_window_size:] -
                                    ma[:-sp.mini_window_size])
        ma = ma[sp.mini_window_size - 1:] / sp.mini_window_size
        offsets = [
            ma[int(sp.mini_window_size * off):
               int(-sp.mini_window_size * (sp.n_windows - off - 1))]
            for off in range(sp.n_windows - 1)] + [
                ma[int(sp.mini_window_size * (sp.n_windows - 1)):]]
        diffs = [np.abs(offsets[i] - offsets[j])
                 for i in range(sp.n_windows)
                 for j in range(i + 1, sp.n_windows)]
        diff_sums = diffs[0].copy()
        for d in diffs:
            diff_sums += d
        stall_metric[start_offset:end_offset] = diff_sums / len(diffs)
    else:
        raise TomboTpuError(
            "Must provide method specific parameters for stall detection")

    with np.errstate(invalid="ignore"):
        below = stall_metric <= sp.threshold
    stall_locs = np.where(np.diff(np.concatenate([[False], below])))[0]
    if below[-1]:
        stall_locs = np.concatenate([stall_locs, [stall_metric.shape[0]]])
    stall_locs = stall_locs.reshape(-1, 2)
    stall_locs = stall_locs[
        (np.diff(stall_locs) > sp.min_consecutive_obs).flatten()]
    if stall_locs.shape[0] == 0:
        return ([], stall_metric) if return_metric else []

    expand_width = (sp.window_size // 2) - sp.edge_buffer
    if expand_width > 0:
        stall_locs[:, 0] -= expand_width
        stall_locs[:, 1] += expand_width
        merged = []
        prev = stall_locs[0]
        for curr in stall_locs:
            if curr[0] > prev[1]:
                merged.append(prev)
                prev = curr
            else:
                prev[1] = curr[1]
        merged.append(prev)
        stall_locs = merged

    return (stall_locs, stall_metric) if return_metric else stall_locs


def remove_stall_cpts(stall_ints, valid_cpts):
    """Drop changepoints inside stall intervals
    (reference: tombo/tombo_stats.py:1576-1597)."""
    if len(stall_ints) == 0:
        return valid_cpts
    keep = np.ones(valid_cpts.shape[0], dtype=bool)
    for start, end in stall_ints:
        keep &= ~((valid_cpts > start) & (valid_cpts < end))
    return valid_cpts[keep]


# --------------------------------------------------------------------------
# Event detection wrappers (scores + native greedy selection)
# --------------------------------------------------------------------------

def valid_cpts_w_cap(signal, min_base_obs, running_stat_width, num_cpts):
    scores = ref_impl.cpt_scores_diff(signal, running_stat_width)
    cpts, status = greedy_cpts_batch(
        scores[None], np.array([scores.shape[0]]), np.array([num_cpts]),
        shift=running_stat_width, min_base_obs=min_base_obs)
    if status[0] != 0:
        raise TomboTpuError("Fewer changepoints found than requested")
    return cpts[0]


def valid_cpts_w_cap_t_test(signal, min_base_obs, running_stat_width,
                            num_cpts):
    scores = ref_impl.cpt_scores_t_test(signal, running_stat_width)
    cpts, status = greedy_cpts_batch(
        scores[None], np.array([scores.shape[0]]), np.array([num_cpts]),
        shift=running_stat_width, min_base_obs=min_base_obs)
    if status[0] != 0:
        raise TomboTpuError("Fewer changepoints found than requested")
    return cpts[0]


def compute_num_events(signal_len, seq_len, mean_obs_per_event,
                       min_event_to_seq_ratio=MIN_EVENT_TO_SEQ_RATIO):
    """Reference: tombo/tombo_stats.py:1558-1574."""
    return max(signal_len // mean_obs_per_event,
               int(seq_len * min_event_to_seq_ratio))


def segment_signal(map_res: ResquiggleResults, num_events: int,
                   rsqgl_params: ResquiggleParams, outlier_thresh=None,
                   const_scale=None):
    """Normalize and segment raw signal (reference:
    tombo/resquiggle.py:1057-1120 ``segment_signal``)."""
    raw = np.asarray(map_res.raw_signal, np.float64)
    if rsqgl_params.use_t_test_seg:
        valid_cpts = valid_cpts_w_cap_t_test(
            raw, rsqgl_params.min_obs_per_base,
            rsqgl_params.running_stat_width, num_events)
        if map_res.stall_ints is not None:
            valid_cpts = remove_stall_cpts(map_res.stall_ints, valid_cpts)
        if map_res.scale_values is not None:
            norm_signal, new_scale_values = normalize_raw_signal(
                raw, scale_values=map_res.scale_values)
        elif const_scale is not None:
            norm_signal, new_scale_values = normalize_raw_signal(
                raw, norm_type="median_const_scale",
                outlier_thresh=outlier_thresh, const_scale=const_scale)
        else:
            if config.USE_RNA_EVENT_SCALE:
                scale_values = get_scale_values_from_events(
                    raw, valid_cpts, outlier_thresh,
                    num_events=config.RNA_SCALE_NUM_EVENTS,
                    max_frac_events=config.RNA_SCALE_MAX_FRAC_EVENTS)
            else:
                scale_values = None
            norm_signal, new_scale_values = normalize_raw_signal(
                raw, scale_values=scale_values)
    else:
        if map_res.scale_values is not None:
            norm_signal, new_scale_values = normalize_raw_signal(
                raw, scale_values=map_res.scale_values)
        elif const_scale is not None:
            norm_signal, new_scale_values = normalize_raw_signal(
                raw, norm_type="median_const_scale",
                outlier_thresh=outlier_thresh, const_scale=const_scale)
        else:
            norm_signal, new_scale_values = normalize_raw_signal(
                raw, norm_type="median", outlier_thresh=outlier_thresh)
        valid_cpts = valid_cpts_w_cap(
            norm_signal, rsqgl_params.min_obs_per_base,
            rsqgl_params.running_stat_width, num_events)
        if map_res.stall_ints is not None:
            valid_cpts = remove_stall_cpts(map_res.stall_ints, valid_cpts)

    return valid_cpts, norm_signal, new_scale_values


# --------------------------------------------------------------------------
# Sequence-fitted rescaling (reference: tombo/tombo_stats.py:370-450)
# --------------------------------------------------------------------------

def calc_kmer_fitted_shift_scale(prev_shift, prev_scale, r_event_means,
                                 r_model_means, r_model_inv_vars=None,
                                 method="theil_sen",
                                 rng: Optional[np.random.Generator] = None):
    """Theil-Sen / robust / method-of-moments sequence-fitted scaling
    (reference: tombo/tombo_stats.py:370 ``calc_kmer_fitted_shift_scale``)."""
    if method == "theil_sen":
        n = r_model_means.shape[0]
        if n > config.MAX_POINTS_FOR_THEIL_SEN:
            if rng is None:
                rng = np.random.default_rng(0)
            samp = rng.choice(n, config.MAX_POINTS_FOR_THEIL_SEN,
                              replace=False)
            r_model_means = r_model_means[samp]
            r_event_means = r_event_means[samp]
        slope = float(np.median(ref_impl.compute_slopes(
            r_event_means, r_model_means)))
        inter = float(np.median(r_model_means - slope * r_event_means))
        if slope == 0:
            raise TomboTpuError(
                "Read failed sequence-based signal re-scaling parameter "
                "estimation.")
        scale_corr_factor = 1.0 / slope
        shift_corr_factor = -inter / slope
    elif method == "mom":
        mmv = r_model_means * r_model_inv_vars
        mmv_sum = mmv.sum()
        coef = np.array([[r_model_inv_vars.sum(), mmv_sum],
                         [mmv_sum, (mmv * r_model_means).sum()]])
        rev = r_event_means * r_model_inv_vars
        dep = np.array([rev.sum(), (rev * r_model_means).sum()])
        shift_corr_factor, scale_corr_factor = np.linalg.solve(coef, dep)
    elif method == "robust":
        from scipy import optimize

        def objective(x):
            return np.sum(np.abs((r_event_means - x[0]) / x[1] -
                                 r_model_means))
        shift_corr_factor, scale_corr_factor = optimize.minimize(
            objective, np.array([0, 1]), method="nelder-mead",
            options={"xatol": 1e-8}).x
    else:
        raise TomboTpuError(
            "Invalid k-mer fitted normalization method: " + method)

    shift = prev_shift + shift_corr_factor * prev_scale
    scale = prev_scale * scale_corr_factor
    return shift, scale, shift_corr_factor, scale_corr_factor


def get_read_seg_score(r_means, r_ref_means, r_ref_sds) -> float:
    """Mean half z-score of observed vs expected levels
    (reference: tombo/tombo_stats.py:2327-2339)."""
    return float(np.mean(np.abs((r_means - r_ref_means) / r_ref_sds)))


def score_valid_bases(read_tb, event_means, r_ref_means, r_ref_sds) -> float:
    """Matching score over non-deleted bases
    (reference: tombo/tombo_stats.py:2341-2362)."""
    valid_bases = np.where(np.diff(read_tb) != 0)[0]
    if valid_bases.shape[0] == 0:
        raise TomboTpuError("Invalid path through read start")
    base_means = np.array([
        event_means[s:e].mean()
        for s, e in zip(read_tb[:-1], read_tb[1:]) if s != e])
    return get_read_seg_score(base_means, r_ref_means[valid_bases],
                              r_ref_sds[valid_bases])


# --------------------------------------------------------------------------
# Start-of-read discovery + adaptive assignment
# (reference: tombo/resquiggle.py:547-1050)
# --------------------------------------------------------------------------

def build_masked_start_plan(n_events: int, mapped_start_offset: int,
                            rsqgl_params: ResquiggleParams,
                            events_per_base: float,
                            mask_bases: int = MASK_BASES):
    """Compute the start-masked static band plan: band starts + per-row mask
    boundaries (the planning half of reference: tombo/resquiggle.py:607-677
    ``_get_masked_start_fwd_pass``).  Returns
    (band_event_starts, valid_start, row_end) — events < valid_start or >=
    row_end[row] score ``mask_fill``."""
    if n_events - mapped_start_offset < rsqgl_params.bandwidth:
        raise TomboTpuError(
            "Read sequence to signal matching starts too far into events "
            "for full adaptive assignment")
    half_bandwidth = rsqgl_params.bandwidth // 2
    band_events_start_pos = (
        0 if half_bandwidth <= mapped_start_offset
        else mapped_start_offset - half_bandwidth)

    tmp_seq_len = max(half_bandwidth, mask_bases,
                      int((half_bandwidth + 1) / events_per_base)) + 1
    band_event_starts = np.linspace(
        band_events_start_pos,
        band_events_start_pos + tmp_seq_len * events_per_base,
        tmp_seq_len).astype(np.int64)
    # first row whose band start reaches the mapped start (+2); the band
    # always reaches mapped_start_offset by construction, so the argmax of
    # the boolean mask is the first hit
    first_hit = int(np.argmax(band_event_starts >= mapped_start_offset))
    mask_seq_len = max(mask_bases, first_hit + 2)
    band_event_starts = band_event_starts[:mask_seq_len]

    mask_start_pos = np.linspace(
        mapped_start_offset + 1,
        band_event_starts[mask_bases - 1] + rsqgl_params.bandwidth,
        mask_bases).astype(np.int64)
    # per-row exclusive end of unmasked events
    row_end = np.full(band_event_starts.shape[0], np.int64(n_events))
    row_end[:mask_bases] = np.minimum(mask_start_pos, n_events)
    return band_event_starts, mapped_start_offset, row_end


def _masked_start_fwd_pass(event_means, r_ref_means, r_ref_sds,
                           mapped_start_offset, rsqgl_params,
                           events_per_base,
                           mask_fill_z_score=MASK_FILL_Z_SCORE,
                           mask_bases=MASK_BASES):
    """Start-masked static-band forward pass (numpy path; reference:
    tombo/resquiggle.py:607-683)."""
    band_event_starts, valid_start, row_end = build_masked_start_plan(
        event_means.shape[0], mapped_start_offset, rsqgl_params,
        events_per_base, mask_bases)
    bw = rsqgl_params.bandwidth
    do_winsorize = rsqgl_params.max_half_z_score is not None

    n_rows = band_event_starts.shape[0]
    shifted_z = np.empty((n_rows, bw))
    for row in range(n_rows):
        start = band_event_starts[row]
        abs_pos = start + np.arange(bw)
        window = event_means[np.clip(abs_pos, 0, event_means.shape[0] - 1)]
        z = np.abs((window - r_ref_means[row]) / r_ref_sds[row])
        if do_winsorize:
            z = np.minimum(z, rsqgl_params.max_half_z_score)
        row_z = rsqgl_params.z_shift - z
        invalid = (abs_pos < valid_start) | (abs_pos >= row_end[row])
        row_z[invalid] = mask_fill_z_score
        shifted_z[row] = row_z

    fwd_pass, fwd_pass_tb = ref_impl.banded_forward_pass(
        shifted_z, band_event_starts, rsqgl_params.skip_pen,
        rsqgl_params.stay_pen)
    return fwd_pass, fwd_pass_tb, band_event_starts, shifted_z


def find_seq_start_in_events(event_means, r_ref_means, r_ref_sds,
                             rsqgl_params, num_bases, num_events,
                             seq_samp_type: Optional[SeqSampleType] = None):
    """Locate expected levels' start within observed events
    (reference: tombo/resquiggle.py:685-752)."""
    if event_means.shape[0] < num_events + num_bases:
        raise TomboTpuError("Read too short for start/end discovery")
    if r_ref_means.shape[0] < num_bases:
        raise TomboTpuError("Genomic mapping too short for start/end "
                            "discovery")

    start_z = np.empty((num_bases, num_events))
    for pos in range(num_bases):
        z = np.abs((event_means[pos:pos + num_events] - r_ref_means[pos]) /
                   r_ref_sds[pos])
        if rsqgl_params.max_half_z_score is not None:
            z = np.minimum(z, rsqgl_params.max_half_z_score)
        start_z[pos] = rsqgl_params.z_shift - z
    starts = np.arange(num_bases, dtype=np.int64)
    fwd, tb = ref_impl.banded_forward_pass(
        start_z, starts, rsqgl_params.skip_pen, rsqgl_params.stay_pen)
    top = int(np.argmax(fwd[-1]))
    start_tb = ref_impl.banded_traceback(tb, starts, top)
    if (seq_samp_type is not None and
            score_valid_bases(start_tb, event_means, r_ref_means, r_ref_sds)
            > SIG_MATCH_THRESH[seq_samp_type.name]):
        raise TomboTpuError(
            "Poor raw to expected signal matching in beginning of read.")
    events_per_base = (start_tb[-1] - start_tb[0]) / len(start_tb)
    return int(start_tb[0]), events_per_base


def find_static_base_assignment(event_means, r_ref_means, r_ref_sds,
                                rsqgl_params):
    """Short-read static-band assignment
    (reference: tombo/resquiggle.py:547-600).

    Routed through one native C++ call (bit-identical to the numpy path
    below, tests/test_native.py) — the per-row python band loop costs
    ~0.2 s/read on the host lane; the native pass is ~100x faster."""
    from ..native import static_base_assignment as _native_static
    res = _native_static(
        event_means, r_ref_means, r_ref_sds, rsqgl_params.z_shift,
        rsqgl_params.skip_pen, rsqgl_params.stay_pen,
        rsqgl_params.max_half_z_score)
    if res is not None:
        return res
    seq_len = r_ref_means.shape[0]
    events_len = event_means.shape[0]
    mask_len = min(seq_len, events_len) // 4
    band_event_starts = np.concatenate([
        np.zeros(seq_len - mask_len * 2),
        np.linspace(0, mask_len, mask_len * 2)]).astype(np.int64)
    bandwidth = events_len - mask_len

    shifted_z = np.empty((band_event_starts.shape[0], bandwidth))
    for seq_pos, event_pos in enumerate(band_event_starts):
        z = np.abs((event_means[event_pos:event_pos + bandwidth] -
                    r_ref_means[seq_pos]) / r_ref_sds[seq_pos])
        if rsqgl_params.max_half_z_score is not None:
            z = np.minimum(z, rsqgl_params.max_half_z_score)
        shifted_z[seq_pos, :] = rsqgl_params.z_shift - z

    fwd, tb = ref_impl.banded_forward_pass(
        shifted_z, band_event_starts, rsqgl_params.skip_pen,
        rsqgl_params.stay_pen)
    top = int(np.argmax(fwd[-1]))
    return ref_impl.banded_traceback(tb, band_event_starts, top)


def _trim_traceback(read_tb, events_len):
    """Clip invalid positions off the traceback ends
    (reference: tombo/resquiggle.py:754-764)."""
    i = 0
    while read_tb[i] < 0:
        read_tb[i] = 0
        i += 1
    j = 1
    while read_tb[-j] > events_len:
        read_tb[-j] = events_len
        j += 1
    return read_tb


def get_rel_raw_coords(valid_cpts, seq_events):
    """Raw coordinates relative to assigned-signal start
    (reference: tombo/resquiggle.py:858-864)."""
    seq_segs = valid_cpts[seq_events]
    read_start_rel_to_raw = int(seq_segs[0])
    return seq_segs - read_start_rel_to_raw, read_start_rel_to_raw


def _debug_dp_dir():
    """Directory for per-read DP dumps, from ``TOMBO_TPU_DEBUG_DP``.

    The TPU build's analog of the reference's compiled-in ``_DEBUG_DP_*``
    flags (reference: tombo/resquiggle.py:83-307): instead of editing
    module constants and re-running, set ``TOMBO_TPU_DEBUG_DP=<dir>`` and
    the single-read path writes one ``.npz`` per read with the forward
    pass, traceback codes, band positions, traced path and band-edge
    margins; render with ``scripts/debug_dp_plot.py``."""
    import os
    return os.environ.get("TOMBO_TPU_DEBUG_DP")


def _dump_dp_debug(read_id, fwd_pass, fwd_pass_tb, band_event_starts,
                   read_tb, event_means, r_ref_means, r_ref_sds,
                   events_start_clip, rsqgl_params):
    import os
    out_dir = _debug_dp_dir()
    os.makedirs(out_dir, exist_ok=True)
    # distance of the optimal path from each band edge per base — the
    # data behind the reference's _DEBUG_BANDWIDTH tuning output
    path_pos = read_tb[1:] - band_event_starts[:read_tb.shape[0] - 1]
    lower_margin = path_pos
    upper_margin = rsqgl_params.bandwidth - 1 - path_pos
    fn = os.path.join(
        out_dir, "dp_debug.%s.npz" % (read_id or "read"))
    np.savez_compressed(
        fn, fwd_pass=fwd_pass.astype(np.float32),
        fwd_pass_tb=fwd_pass_tb, band_event_starts=band_event_starts,
        read_tb=read_tb, event_means=event_means.astype(np.float32),
        ref_means=r_ref_means.astype(np.float32),
        ref_sds=r_ref_sds.astype(np.float32),
        events_start_clip=np.int64(events_start_clip),
        lower_margin=lower_margin, upper_margin=upper_margin,
        bandwidth=np.int64(rsqgl_params.bandwidth))


def find_adaptive_base_assignment(
        valid_cpts, event_means, rsqgl_params: ResquiggleParams, std_ref,
        genome_seq, start_clip_bases=None,
        seq_samp_type=SeqSampleType(config.DNA_SAMP_TYPE, False),
        read_id=None) -> DpResults:
    """Adaptive-banded signal-to-sequence assignment
    (reference: tombo/resquiggle.py:866-1050)."""

    def get_short_read_results(r_ref_means, r_ref_sds, genome_seq):
        seq_events = find_static_base_assignment(
            event_means, r_ref_means, r_ref_sds, rsqgl_params)
        seq_segs, rsrtr = get_rel_raw_coords(valid_cpts, seq_events)
        return DpResults(rsrtr, seq_segs, r_ref_means, r_ref_sds, genome_seq)

    if start_clip_bases is not None:
        raise TomboTpuError(
            "start-clip-based read start discovery is not enabled "
            "(reference hardcodes USE_START_CLIP_BASES=False)")

    dnstrm_bases = std_ref.kmer_width - std_ref.central_pos - 1
    r_ref_means, r_ref_sds = std_ref.get_exp_levels_from_seq(genome_seq)
    genome_seq = genome_seq[std_ref.central_pos:-dnstrm_bases]
    seq_len = len(genome_seq)
    if seq_len != r_ref_means.shape[0]:
        raise TomboTpuError("Discordant reference and sequence lengths.")

    if (event_means.shape[0] < rsqgl_params.start_bw +
            rsqgl_params.start_n_bases or
            seq_len < rsqgl_params.start_n_bases):
        return get_short_read_results(r_ref_means, r_ref_sds, genome_seq)
    try:
        mapped_start, events_per_base = find_seq_start_in_events(
            event_means, r_ref_means, r_ref_sds, rsqgl_params,
            rsqgl_params.start_n_bases, rsqgl_params.start_bw, seq_samp_type)
    except TomboTpuError:
        if (event_means.shape[0] < rsqgl_params.start_save_bw +
                rsqgl_params.start_n_bases):
            return get_short_read_results(r_ref_means, r_ref_sds, genome_seq)
        mapped_start, events_per_base = find_seq_start_in_events(
            event_means, r_ref_means, r_ref_sds, rsqgl_params,
            rsqgl_params.start_n_bases, rsqgl_params.start_save_bw)

    if events_per_base == 0:
        raise TomboTpuError(
            "Very poor signal quality. Read likely includes open pore.")

    half_bandwidth = rsqgl_params.bandwidth // 2
    if mapped_start < half_bandwidth:
        events_start_clip = 0
        mapped_start_offset = mapped_start
    else:
        events_start_clip = mapped_start - half_bandwidth
        mapped_start_offset = half_bandwidth

    if (int((half_bandwidth + 1) / events_per_base) >= r_ref_means.shape[0] or
            event_means.shape[0] - mapped_start_offset - events_start_clip <
            rsqgl_params.bandwidth):
        return get_short_read_results(r_ref_means, r_ref_sds, genome_seq)

    clipped_event_means = event_means[events_start_clip:]
    (start_fwd, start_tb_mat, start_event_starts, _) = \
        _masked_start_fwd_pass(
            clipped_event_means, r_ref_means, r_ref_sds,
            mapped_start_offset, rsqgl_params, events_per_base)
    start_seq_len = start_event_starts.shape[0]
    fwd_pass = np.empty((seq_len + 1, rsqgl_params.bandwidth))
    fwd_pass[:start_seq_len + 1] = start_fwd
    fwd_pass_tb = np.zeros((seq_len + 1, rsqgl_params.bandwidth), np.int8)
    fwd_pass_tb[:start_seq_len + 1] = start_tb_mat
    band_event_starts = np.empty(seq_len, dtype=np.int64)
    band_event_starts[:start_seq_len] = start_event_starts

    do_winsorize = rsqgl_params.max_half_z_score is not None
    ref_impl.adaptive_banded_forward_pass(
        fwd_pass, fwd_pass_tb, band_event_starts, clipped_event_means,
        r_ref_means, r_ref_sds, rsqgl_params.z_shift, rsqgl_params.skip_pen,
        rsqgl_params.stay_pen, start_seq_len, MASK_FILL_Z_SCORE,
        do_winsorize,
        rsqgl_params.max_half_z_score if do_winsorize else 0.0)

    top = int(np.argmax(fwd_pass[-1]))
    read_tb = ref_impl.banded_traceback(
        fwd_pass_tb, band_event_starts, top, rsqgl_params.band_bound_thresh)
    read_tb = _trim_traceback(
        read_tb, events_len=event_means.shape[0] - events_start_clip)
    seq_segs, rsrtr = get_rel_raw_coords(
        valid_cpts[events_start_clip:], read_tb)

    if _debug_dp_dir():
        _dump_dp_debug(read_id, fwd_pass, fwd_pass_tb, band_event_starts,
                       read_tb, clipped_event_means, r_ref_means,
                       r_ref_sds, events_start_clip, rsqgl_params)

    return DpResults(rsrtr, seq_segs, r_ref_means, r_ref_sds, genome_seq)


# --------------------------------------------------------------------------
# Skipped-base resolution (reference: tombo/resquiggle.py:402-540)
# --------------------------------------------------------------------------

def plan_del_fix_windows(
        dp_res: DpResults, rsqgl_params: ResquiggleParams,
        max_raw_cpts=MAX_RAW_CPTS, del_fix_window=DEL_FIX_WINDOW,
        max_del_fix_window=MAX_DEL_FIX_WINDOW,
        extra_sig_factor=EXTRA_SIG_FACTOR):
    """Window planning half of the skipped-base fix: merged/expanded
    (start, end) base windows around zero-length segments, or [] when the
    path has no deletions (reference: tombo/resquiggle.py:402-480).
    Split out so the batched lane can plan per read but run ONE native
    DP call over every window of every read in the batch."""

    def merge_windows(ws):
        merged = []
        for start, end in ws:
            if merged and start < merged[-1][1]:
                merged[-1] = (merged[-1][0], end)
            else:
                merged.append((start, end))
        return merged

    def window_too_small(start, end):
        n_events = end - start
        sig_len = dp_res.segs[end] - dp_res.segs[start]
        return sig_len <= ((n_events + 1) *
                           rsqgl_params.raw_min_obs_per_base) * \
            extra_sig_factor

    def expand_small(ws):
        out, expanded = [], False
        for start, end in ws:
            if window_too_small(start, end):
                expanded = True
                start -= 1
                end += 1
            out.append((start, end))
        return out, expanded

    def trim_ends(ws):
        if ws[0][0] < 0:
            ws[0] = (0, ws[0][1])
        if ws[-1][1] > len(dp_res.segs) - 1:
            ws[-1] = (ws[-1][0], len(dp_res.segs) - 1)
        return ws

    all_del_windows = []
    for del_pos in np.where(np.diff(dp_res.segs) == 0)[0]:
        if (all_del_windows and
                del_pos < all_del_windows[-1][1] + del_fix_window):
            all_del_windows[-1] = (all_del_windows[-1][0],
                                   del_pos + del_fix_window + 1)
        else:
            all_del_windows.append((del_pos - del_fix_window,
                                    del_pos + del_fix_window + 1))
    if not all_del_windows:
        return []

    windows_expanded = False
    all_del_windows = trim_ends(merge_windows(all_del_windows))
    for _ in range(max_del_fix_window - del_fix_window):
        all_del_windows, windows_expanded = expand_small(all_del_windows)
        if not windows_expanded:
            break
        all_del_windows = trim_ends(merge_windows(all_del_windows))

    if windows_expanded and any(
            window_too_small(s, e) for s, e in all_del_windows):
        raise TomboTpuError(
            "Not enough raw signal around potential genomic deletion(s)")
    if max_raw_cpts is not None and max(
            e - s for s, e in all_del_windows) > max_raw_cpts:
        raise TomboTpuError(
            "Read contains too many potential genomic deletions")
    return all_del_windows


def build_del_fix_inputs(dp_res: DpResults, norm_signal, windows):
    """Native raw-window DP inputs for planned windows: (signal slice,
    expected levels, SDs, evenly-spaced pseudo starts) per window."""
    return [
        (norm_signal[dp_res.segs[start]:dp_res.segs[end]],
         dp_res.ref_means[start:end], dp_res.ref_sds[start:end],
         np.linspace(0, dp_res.segs[end] - dp_res.segs[start],
                     end - start + 1, dtype=np.int64))
        for start, end in windows]


def apply_del_fix(dp_res: DpResults, norm_signal, windows, segs_list,
                  status):
    """Scatter per-window raw-DP boundaries back into the segment table
    and run the reference's validity checks
    (reference: tombo/resquiggle.py:470-500)."""
    resolved_segs = dp_res.segs.copy()
    for (start, end), reg_segs, st in zip(windows, segs_list, status):
        if st != 0:
            raise TomboTpuError(
                "Raw-signal traceback failed to find boundary")
        resolved_segs[start + 1:end] = reg_segs + dp_res.segs[start]
    if np.diff(resolved_segs).min() < 1:
        raise TomboTpuError("New segments include zero length events")
    if resolved_segs[0] < 0:
        raise TomboTpuError("New segments start with negative index")
    if resolved_segs[-1] > norm_signal.shape[0]:
        raise TomboTpuError("New segments end past raw signal values")
    return resolved_segs


def _del_fix_numpy(dp_res: DpResults, norm_signal, windows,
                   rsqgl_params: ResquiggleParams):
    """Pure-numpy fallback for the window DP (native lib unavailable)."""
    segs_list, status = [], []
    for start, end in windows:
        n_events = end - start
        sig_start, sig_end = dp_res.segs[start], dp_res.segs[end]
        pseudo_starts = np.linspace(0, sig_end - sig_start, n_events + 1,
                                    dtype=np.int64)
        reg_zs = ref_impl.reg_z_scores(
            norm_signal[sig_start:sig_end], dp_res.ref_means[start:end],
            dp_res.ref_sds[start:end], pseudo_starts, 0, n_events,
            n_events, rsqgl_params.raw_min_obs_per_base,
            max_half_z_score=rsqgl_params.max_half_z_score)
        reg_fwd = ref_impl.raw_forward_pass(
            reg_zs, rsqgl_params.raw_min_obs_per_base)
        reg_segs = ref_impl.raw_traceback(
            reg_fwd, rsqgl_params.raw_min_obs_per_base)
        if reg_segs.shape[0] != end - start - 1:
            raise TomboTpuError("Invalid segmentation results.")
        segs_list.append(reg_segs)
        status.append(0)
    return segs_list, status


def resolve_skipped_bases_with_raw(
        dp_res: DpResults, norm_signal, rsqgl_params: ResquiggleParams,
        max_raw_cpts=MAX_RAW_CPTS, del_fix_window=DEL_FIX_WINDOW,
        max_del_fix_window=MAX_DEL_FIX_WINDOW,
        extra_sig_factor=EXTRA_SIG_FACTOR):
    """Raw-signal DP in windows around skipped bases
    (reference: tombo/resquiggle.py:402 ``resolve_skipped_bases_with_raw``)."""
    windows = plan_del_fix_windows(
        dp_res, rsqgl_params, max_raw_cpts, del_fix_window,
        max_del_fix_window, extra_sig_factor)
    if not windows:
        return dp_res.segs.copy()
    from ..native import raw_windows_dp_batch
    native_out = raw_windows_dp_batch(
        build_del_fix_inputs(dp_res, norm_signal, windows),
        rsqgl_params.raw_min_obs_per_base,
        rsqgl_params.max_half_z_score)
    if native_out is None:
        native_out = _del_fix_numpy(dp_res, norm_signal, windows,
                                    rsqgl_params)
    return apply_del_fix(dp_res, norm_signal, windows, *native_out)


# --------------------------------------------------------------------------
# Full single-read re-squiggle (reference: tombo/resquiggle.py:1122-1214)
# --------------------------------------------------------------------------

def resquiggle_read(
        map_res: ResquiggleResults, std_ref,
        rsqgl_params: ResquiggleParams, outlier_thresh=None,
        all_raw_signal=None, max_raw_cpts=MAX_RAW_CPTS,
        min_event_to_seq_ratio=MIN_EVENT_TO_SEQ_RATIO, const_scale=None,
        skip_seq_scaling=False,
        seq_samp_type=SeqSampleType(config.DNA_SAMP_TYPE, False)
        ) -> ResquiggleResults:
    """Identify raw signal to genome sequence assignment for one read."""
    if all_raw_signal is not None:
        map_res = map_res.replace(raw_signal=all_raw_signal)
    if map_res.raw_signal is None:
        raise TomboTpuError(
            "Must have raw signal in order to complete re-squiggle algorithm")

    num_mapped_bases = len(map_res.genome_seq) - std_ref.kmer_width + 1
    num_events = compute_num_events(
        map_res.raw_signal.shape[0], num_mapped_bases,
        rsqgl_params.mean_obs_per_event, min_event_to_seq_ratio)
    if num_events / rsqgl_params.bandwidth > num_mapped_bases:
        raise TomboTpuError("Too much raw signal for mapped sequence")

    valid_cpts, norm_signal, new_scale_values = segment_signal(
        map_res, num_events, rsqgl_params, outlier_thresh, const_scale)
    event_means = ref_impl.new_means(norm_signal, valid_cpts)

    dp_res = find_adaptive_base_assignment(
        valid_cpts, event_means, rsqgl_params, std_ref, map_res.genome_seq,
        start_clip_bases=map_res.start_clip_bases,
        seq_samp_type=seq_samp_type,
        read_id=(map_res.align_info.read_id
                 if map_res.align_info is not None else None))
    norm_signal = norm_signal[
        dp_res.read_start_rel_to_raw:
        dp_res.read_start_rel_to_raw + dp_res.segs[-1]]

    segs = resolve_skipped_bases_with_raw(
        dp_res, norm_signal, rsqgl_params, max_raw_cpts)

    if skip_seq_scaling:
        norm_params_changed = False
    else:
        (shift, scale, shift_corr_factor,
         scale_corr_factor) = calc_kmer_fitted_shift_scale(
             new_scale_values.shift, new_scale_values.scale,
             ref_impl.new_means(norm_signal, segs), dp_res.ref_means,
             method="theil_sen")
        new_scale_values = new_scale_values.replace(
            shift=shift, scale=scale, outlier_thresh=outlier_thresh)
        norm_signal = (norm_signal - shift_corr_factor) / scale_corr_factor
        norm_params_changed = (
            np.abs(shift_corr_factor) > config.SHIFT_CHANGE_THRESH or
            np.abs(scale_corr_factor - 1) > config.SCALE_CHANGE_THRESH)

    sig_match_score = get_read_seg_score(
        ref_impl.new_means(norm_signal, segs), dp_res.ref_means,
        dp_res.ref_sds)
    if segs.shape[0] != len(dp_res.genome_seq) + 1:
        raise TomboTpuError(
            "Aligned sequence does not match number of segments produced")

    return map_res.replace(
        read_start_rel_to_raw=dp_res.read_start_rel_to_raw, segs=segs,
        genome_seq=dp_res.genome_seq, raw_signal=norm_signal,
        scale_values=new_scale_values, sig_match_score=sig_match_score,
        norm_params_changed=norm_params_changed)


def resquiggle_read_with_retries(
        map_res, std_ref, rsqgl_params, save_params, outlier_thresh=None,
        const_scale=None, skip_seq_scaling=False,
        seq_samp_type=SeqSampleType(config.DNA_SAMP_TYPE, False),
        max_scaling_iters=config.MAX_SCALING_ITERS):
    """Iterative rescaling loop + save-bandwidth retry lane
    (reference: tombo/resquiggle.py:1488-1600 ``_resquiggle_worker``)."""
    def run_iters(params):
        rsqgl_res = resquiggle_read(
            map_res, std_ref, params, outlier_thresh,
            const_scale=const_scale, skip_seq_scaling=skip_seq_scaling,
            seq_samp_type=seq_samp_type)
        n_iters = 1
        while (n_iters < max_scaling_iters and
               rsqgl_res.norm_params_changed):
            rsqgl_res = resquiggle_read(
                map_res.replace(scale_values=rsqgl_res.scale_values),
                std_ref, params, outlier_thresh, const_scale=const_scale,
                skip_seq_scaling=skip_seq_scaling,
                seq_samp_type=seq_samp_type)
            n_iters += 1
        return rsqgl_res

    try:
        return run_iters(rsqgl_params)
    except TomboTpuError:
        # failed reads are attempted again with the save bandwidth
        return run_iters(save_params)


def adjust_map_res(map_res: ResquiggleResults,
                   seq_samp_type: SeqSampleType,
                   rsqgl_params: ResquiggleParams,
                   trim_rna_adapter: bool = False) -> ResquiggleResults:
    """Pre-resquiggle signal adjustments: RNA 3'->5' signal flip, optional
    adapter trim, and stall interval identification
    (reference: tombo/resquiggle.py:1506-1530 ``adjust_map_res``)."""
    if seq_samp_type.name == config.RNA_SAMP_TYPE:
        if trim_rna_adapter:
            adapter_end = trim_rna(map_res.raw_signal, rsqgl_params)
            map_res = map_res.replace(
                raw_signal=map_res.raw_signal[adapter_end:])
        map_res = map_res.replace(raw_signal=map_res.raw_signal[::-1])
    if ((config.COLLAPSE_RNA_STALLS and
         seq_samp_type.name == config.RNA_SAMP_TYPE) or
            (config.COLLAPSE_DNA_STALLS and
             seq_samp_type.name == config.DNA_SAMP_TYPE)):
        map_res = map_res.replace(stall_ints=identify_stalls(
            map_res.raw_signal, config.DEFAULT_STALL_PARAMS))
    return map_res


def trim_rna(all_raw_signal, rsqgl_params,
             trim_rna_params=config.DEFAULT_TRIM_RNA_PARAMS) -> int:
    """Locate the end of the DNA adapter on a direct-RNA read
    (reference: tombo/tombo_stats.py:235-267 ``trim_rna``)."""
    x = np.asarray(all_raw_signal[:trim_rna_params.max_raw_obs], np.float64)
    num_events = np.int64(x.shape[0] // rsqgl_params.mean_obs_per_event)
    valid_cpts = valid_cpts_w_cap(
        x, rsqgl_params.min_obs_per_base, rsqgl_params.running_stat_width,
        int(num_events))
    _, window_sds = ref_impl.new_mean_stds(x, valid_cpts)

    w = trim_rna_params.moving_window_size
    if window_sds.shape[0] < w:
        return 0
    mov = np.convolve(window_sds, np.ones(w) / w, mode="valid")
    thresh = mov.mean() * trim_rna_params.thresh_scale
    m = trim_rna_params.min_running_values
    if mov.shape[0] < m:
        return 0
    running_mins = np.lib.stride_tricks.sliding_window_view(mov, m).min(-1)
    above = np.where(running_mins > thresh)[0]
    if above.shape[0] == 0:
        return 0
    return int(valid_cpts[above[0]])


# --------------------------------------------------------------------------
# Mapping (reference: tombo/resquiggle.py:1278-1383)
# --------------------------------------------------------------------------

def map_read(seq_data: SequenceData, aligner, std_ref,
             seq_samp_type=SeqSampleType(config.DNA_SAMP_TYPE, False),
             bc_subgrp=config.DEFAULT_BASECALL_SUBGROUP,
             seq_len_rng=None) -> ResquiggleResults:
    """Map basecalls and extract k-mer-context-expanded genome sequence
    (reference: tombo/resquiggle.py:1278 ``map_read``)."""
    alignment = aligner.map(str(seq_data.seq))
    if alignment is None:
        raise TomboTpuError("Alignment not produced")

    chrm, ref_start, ref_end = alignment.ctg, alignment.r_st, alignment.r_en
    if not (seq_len_rng is None or
            seq_len_rng[0] < ref_end - ref_start < seq_len_rng[1]):
        raise TomboTpuError(
            "Mapped location not within --sequence-length-range")
    strand = "+" if alignment.strand == 1 else "-"
    num_ins = num_del = num_aligned = 0
    for op_len, op in alignment.cigar:
        if op == 1:
            num_ins += op_len
        elif op in (2, 3):
            num_del += op_len
        elif op in (0, 7, 8):
            num_aligned += op_len
        elif op == 6:
            pass
        else:
            raise TomboTpuError("Invalid cigar operation")
    if strand == "+":
        num_start_clipped = alignment.q_st
        num_end_clipped = len(seq_data.seq) - alignment.q_en
    else:
        num_start_clipped = len(seq_data.seq) - alignment.q_en
        num_end_clipped = alignment.q_st

    align_info = AlignInfo(
        read_id=seq_data.id, subgroup=bc_subgrp,
        clip_start=num_start_clipped, clip_end=num_end_clipped,
        insertions=num_ins, deletions=num_del, matches=alignment.mlen,
        mismatches=num_aligned - alignment.mlen)

    # expand to cover model-able positions
    # (reference: tombo/resquiggle.py:1344-1358)
    dnstrm_bases = std_ref.kmer_width - std_ref.central_pos - 1
    if ((seq_samp_type.name == config.RNA_SAMP_TYPE and strand == "+") or
            (seq_samp_type.name == config.DNA_SAMP_TYPE and strand == "-" and
             config.USE_START_CLIP_BASES) or
            (seq_samp_type.name == config.DNA_SAMP_TYPE and strand == "+" and
             not config.USE_START_CLIP_BASES)):
        if ref_start < std_ref.central_pos:
            ref_start = std_ref.central_pos
        ref_seq_start = ref_start - std_ref.central_pos
        ref_seq_end = ref_end + dnstrm_bases
    else:
        if ref_start < dnstrm_bases:
            ref_start = dnstrm_bases
        ref_seq_start = ref_start - dnstrm_bases
        ref_seq_end = ref_end + std_ref.central_pos
    genome_seq = aligner.seq(chrm, ref_seq_start, ref_seq_end)
    if genome_seq is None or genome_seq == "":
        raise TomboTpuError("Invalid mapping location")
    if strand == "-":
        genome_seq = rev_comp(genome_seq)
    genome_loc = GenomeLocation(ref_start, strand, chrm)

    start_clip_bases = None
    if config.USE_START_CLIP_BASES:
        start_clip_bases = seq_data.seq[alignment.q_en:][::-1]

    return ResquiggleResults(
        align_info=align_info, genome_loc=genome_loc, genome_seq=genome_seq,
        mean_q_score=seq_data.mean_q_score,
        start_clip_bases=start_clip_bases)
