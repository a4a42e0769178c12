"""ctypes bindings for the native host library (csrc/tombo_native.cpp).

The library is built on demand with the repo Makefile; if a toolchain is
unavailable the module transparently falls back to the float64 numpy oracle
implementations (tombo_tpu/ops/ref_impl.py) — identical results, slower.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_NAME = "libtombo_native.so"
_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, _LIB_NAME)
_CSRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "csrc")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _CSRC], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        # Always invoke make (incremental; a no-op when up to date) so an
        # edited csrc/tombo_native.cpp never runs behind a stale binary.
        # Fall back to an existing library only if no toolchain is present.
        if not _try_build() and not os.path.exists(_LIB_PATH):
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        lib.greedy_cpts.restype = ctypes.c_int
        lib.greedy_cpts.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.greedy_cpts_batch.restype = None
        lib.greedy_cpts_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64]
        lib.greedy_cpts_uncapped.restype = ctypes.c_int64
        lib.greedy_cpts_uncapped.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.theil_sen_batch.restype = None
        lib.theil_sen_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_double, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
        lib.theil_sen_batch32.restype = None
        lib.theil_sen_batch32.argtypes = lib.theil_sen_batch.argtypes
        lib.theil_sen_batch_fast.restype = None
        lib.theil_sen_batch_fast.argtypes = lib.theil_sen_batch.argtypes
        lib.raw_windows_dp_batch.restype = None
        lib.raw_windows_dp_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_double, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64]
        lib.finalize_batch.restype = None
        lib.finalize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_double,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
            ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.del_fix_batch.restype = None
        lib.del_fix_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64]
        lib.resquiggle_read_baseline.restype = ctypes.c_int
        lib.resquiggle_read_baseline.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double)]
        lib.static_base_assignment.restype = ctypes.c_int
        lib.static_base_assignment.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64)]
        lib.aln_index_build.restype = ctypes.c_void_p
        lib.aln_index_build.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.aln_index_free.restype = None
        lib.aln_index_free.argtypes = [ctypes.c_void_p]
        lib.aln_map.restype = ctypes.c_int64
        lib.aln_map.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64]
        lib.pack_delta8_batch.restype = None
        lib.pack_delta8_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        lib.resquiggle_read_baseline_rna.restype = ctypes.c_int
        lib.resquiggle_read_baseline_rna.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


def _as_c(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def greedy_cpts_batch(scores: np.ndarray, n_cands: np.ndarray,
                      num_cpts: np.ndarray, shift: int, min_base_obs: int,
                      n_threads: int = 0):
    """Batched greedy changepoint selection.

    scores: (B, C) float64 padded score matrix (padding < any real score)
    n_cands, num_cpts: (B,) int64
    Returns (cpts (B, max_cpts) int64 sorted+shifted rows, status (B,) int32).
    """
    scores = np.ascontiguousarray(scores, dtype=np.float64)
    n_cands = np.ascontiguousarray(n_cands, dtype=np.int64)
    num_cpts = np.ascontiguousarray(num_cpts, dtype=np.int64)
    B, C = scores.shape
    max_cpts = int(num_cpts.max()) if B else 0
    out = np.zeros((B, max_cpts), dtype=np.int64)
    status = np.zeros(B, dtype=np.int32)

    lib = get_lib()
    if lib is not None:
        lib.greedy_cpts_batch(
            _as_c(scores, ctypes.c_double), B, C,
            _as_c(n_cands, ctypes.c_int64), _as_c(num_cpts, ctypes.c_int64),
            max_cpts, shift, min_base_obs,
            _as_c(out, ctypes.c_int64), _as_c(status, ctypes.c_int32),
            n_threads)
        return out, status

    # numpy fallback (identical semantics)
    from ..ops import ref_impl
    from ..errors import TomboTpuError
    for b in range(B):
        try:
            cpts = ref_impl.greedy_select_cpts(
                scores[b, :n_cands[b]], min_base_obs, int(num_cpts[b]))
            cpts = np.sort(cpts) + shift
            out[b, :cpts.shape[0]] = cpts
        except TomboTpuError:
            status[b] = 1
    return out, status


def greedy_cpts_uncapped(scores: np.ndarray, min_base_obs: int) -> np.ndarray:
    """Uncapped changepoint selection; returns accepted positions
    (unshifted, acceptance order)."""
    scores = np.ascontiguousarray(scores, dtype=np.float64)
    n = scores.shape[0]
    lib = get_lib()
    if lib is not None:
        out = np.empty(n, dtype=np.int64)
        count = lib.greedy_cpts_uncapped(
            _as_c(scores, ctypes.c_double), n, min_base_obs,
            _as_c(out, ctypes.c_int64))
        return out[:count]
    return _np_uncapped(scores, min_base_obs)


def pack_delta8_batch(raws, lens: np.ndarray, flat8: np.ndarray,
                      offs: np.ndarray, n_threads: int = 0):
    """Threaded int8-delta wire packing of int16 raw-signal rows
    (the batched lane's dominant host->device format; see
    pipeline/batch.py seg_pack).

    raws: list of C-contiguous int16 arrays; lens their sample counts;
    offs[i]: destination offset of read i's (lens[i]-1) deltas in flat8.
    Returns (firsts (B,) int16, exc_read, exc_pos, exc_res) or None when
    the native library is unavailable (callers keep the numpy loop).
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "pack_delta8_batch"):
        return None
    B = len(raws)
    lens = np.ascontiguousarray(lens, np.int64)
    offs64 = np.ascontiguousarray(offs, np.int64)
    firsts = np.zeros(B, np.int16)
    ptrs = (ctypes.c_void_p * B)(*(a.ctypes.data for a in raws))
    exc_cap = 4096
    while True:
        exc_read = np.empty(exc_cap, np.int32)
        exc_pos = np.empty(exc_cap, np.int32)
        exc_res = np.empty(exc_cap, np.int32)
        n_exc = np.zeros(1, np.int64)
        lib.pack_delta8_batch(
            ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
            _as_c(lens, ctypes.c_int64), B,
            _as_c(offs64, ctypes.c_int64), _as_c(flat8, ctypes.c_int8),
            _as_c(firsts, ctypes.c_int16), _as_c(exc_read, ctypes.c_int32),
            _as_c(exc_pos, ctypes.c_int32), _as_c(exc_res, ctypes.c_int32),
            exc_cap, _as_c(n_exc, ctypes.c_int64), n_threads)
        total = int(n_exc[0])
        if total <= exc_cap:
            return (firsts, exc_read[:total], exc_pos[:total],
                    exc_res[:total])
        exc_cap = int(total + 64)


def theil_sen_batch(ev: np.ndarray, mod: np.ndarray, n_points: np.ndarray,
                    max_slope: float = 1000.0, n_threads: int = 0,
                    use_f32: bool = False, use_fast: bool = False):
    """Batched Theil-Sen (median slope + median intercept) over padded
    (B, max_n) float64 arrays.  Returns (slopes (B,), intercepts (B,)).

    ``use_f32`` selects the f32 pair-buffer variant (~2x faster,
    ~1e-7-relative slope error) for the float32 production lane; the exact
    f64 path is the default (oracle-parity mode).  ``use_fast`` selects
    the expected-O(n log n) exact slope-selection variant (interval
    narrowing + inversion counting; csrc ``ts_fast``) — same selection in
    f64 comparisons, advantageous for n well above 1000."""
    ev = np.ascontiguousarray(ev, np.float64)
    mod = np.ascontiguousarray(mod, np.float64)
    n_points = np.ascontiguousarray(n_points, np.int64)
    B, max_n = ev.shape
    slopes = np.zeros(B)
    inters = np.zeros(B)
    lib = get_lib()
    if lib is not None:
        fn = (lib.theil_sen_batch_fast if use_fast
              else lib.theil_sen_batch32 if use_f32
              else lib.theil_sen_batch)
        fn(_as_c(ev, ctypes.c_double), _as_c(mod, ctypes.c_double), B,
           max_n, _as_c(n_points, ctypes.c_int64), max_slope,
           _as_c(slopes, ctypes.c_double), _as_c(inters, ctypes.c_double),
           n_threads)
        return slopes, inters
    from ..ops import ref_impl
    for b in range(B):
        n = int(n_points[b])
        sl = float(np.median(ref_impl.compute_slopes(
            ev[b, :n], mod[b, :n], max_slope)))
        slopes[b] = sl
        inters[b] = float(np.median(mod[b, :n] - sl * ev[b, :n]))
    return slopes, inters


# Error strings for csrc/resquiggle_baseline.cpp return codes; phrased to
# match the Python pipeline's failure taxonomy where a counterpart exists.
_BASELINE_ERRORS = {
    1: "Too much raw signal for mapped sequence",
    2: "Fewer changepoints than requested",
    3: "Read too short for start discovery",
    4: "Poor raw to expected signal matching at read start",
    5: "Very poor signal quality. Read likely includes open pore.",
    6: "Raw signal does not seem to correspond to the sequence from mapping.",
    7: "Traceback determined path outside band boundaries",
    8: "Read contains too many potential genomic deletions",
    9: "Invalid events found after deletion fix",
    10: "Read failed sequence-based signal re-scaling parameter estimation.",
    11: "Masked start plan failure",
}


def resquiggle_read_baseline(raw_signal: np.ndarray, ref_means: np.ndarray,
                             ref_sds: np.ndarray, params,
                             outlier_thresh: float,
                             sig_match_thresh: float,
                             max_scaling_iters: int = 3,
                             stall_ints=None):
    """Single-core end-to-end DNA re-squiggle in native C++
    (csrc/resquiggle_baseline.cpp): the honest CPU-baseline denominator for
    bench.py, mirroring the reference's compiled hot path
    (tombo/_c_dynamic_programming.pyx:202-412).

    ``params`` is a ResquiggleParams.  Returns (segs i64[seq_len+1],
    read_start_rel_to_raw, (shift, scale, lower, upper), sig_match_score)
    or raises TomboTpuError on a failed read.  Returns None when the native
    library is unavailable.
    """
    from ..config import (DEL_FIX_WINDOW, EXTRA_SIG_FACTOR,
                          MASK_BASES, MASK_FILL_Z_SCORE, MAX_DEL_FIX_WINDOW,
                          MAX_POINTS_FOR_THEIL_SEN, MAX_RAW_CPTS,
                          MIN_EVENT_TO_SEQ_RATIO, SCALE_CHANGE_THRESH,
                          SHIFT_CHANGE_THRESH)
    from ..errors import TomboTpuError
    lib = get_lib()
    if lib is None:
        return None
    raw_signal = np.ascontiguousarray(raw_signal, np.float64)
    ref_means = np.ascontiguousarray(ref_means, np.float64)
    ref_sds = np.ascontiguousarray(ref_sds, np.float64)
    seq_len = ref_means.shape[0]
    iparams = np.array([
        params.bandwidth, params.start_bw, params.start_save_bw,
        params.start_n_bases, params.running_stat_width,
        params.min_obs_per_base, params.mean_obs_per_event,
        params.raw_min_obs_per_base, params.band_bound_thresh,
        MASK_BASES, DEL_FIX_WINDOW, MAX_DEL_FIX_WINDOW, MAX_RAW_CPTS,
        max_scaling_iters, MAX_POINTS_FOR_THEIL_SEN], dtype=np.int64)
    dparams = np.array([
        params.z_shift, params.skip_pen, params.stay_pen,
        -1.0 if params.max_half_z_score is None else params.max_half_z_score,
        outlier_thresh, sig_match_thresh, MASK_FILL_Z_SCORE,
        MIN_EVENT_TO_SEQ_RATIO, EXTRA_SIG_FACTOR, SHIFT_CHANGE_THRESH,
        SCALE_CHANGE_THRESH], dtype=np.float64)
    segs = np.zeros(seq_len + 1, dtype=np.int64)
    rsrtr = np.zeros(1, dtype=np.int64)
    scale = np.zeros(4, dtype=np.float64)
    score = np.zeros(1, dtype=np.float64)
    if params.use_t_test_seg:
        # RNA lane: t-test segmentation + stall removal + event scaling
        ints = stall_ints or []
        stall_s = np.ascontiguousarray(
            [s for s, _ in ints], np.int64)
        stall_e = np.ascontiguousarray(
            [e for _, e in ints], np.int64)
        code = lib.resquiggle_read_baseline_rna(
            _as_c(raw_signal, ctypes.c_double), raw_signal.shape[0],
            _as_c(ref_means, ctypes.c_double),
            _as_c(ref_sds, ctypes.c_double), seq_len,
            _as_c(stall_s, ctypes.c_int64), _as_c(stall_e, ctypes.c_int64),
            len(ints), _as_c(iparams, ctypes.c_int64),
            _as_c(dparams, ctypes.c_double), _as_c(segs, ctypes.c_int64),
            _as_c(rsrtr, ctypes.c_int64), _as_c(scale, ctypes.c_double),
            _as_c(score, ctypes.c_double))
    else:
        code = lib.resquiggle_read_baseline(
            _as_c(raw_signal, ctypes.c_double), raw_signal.shape[0],
            _as_c(ref_means, ctypes.c_double),
            _as_c(ref_sds, ctypes.c_double),
            seq_len, _as_c(iparams, ctypes.c_int64),
            _as_c(dparams, ctypes.c_double), _as_c(segs, ctypes.c_int64),
            _as_c(rsrtr, ctypes.c_int64), _as_c(scale, ctypes.c_double),
            _as_c(score, ctypes.c_double))
    if code != 0:
        raise TomboTpuError(
            _BASELINE_ERRORS.get(code, "baseline failure %d" % code))
    return (segs, int(rsrtr[0]),
            (float(scale[0]), float(scale[1]), float(scale[2]),
             float(scale[3])), float(score[0]))


def resquiggle_read_baseline_with_retries(
        raw_signal, ref_means, ref_sds, params, save_params,
        outlier_thresh, sig_match_thresh, max_scaling_iters: int = 3,
        stall_ints=None):
    """Baseline with the reference's save-bandwidth retry lane
    (reference: tombo/resquiggle.py:1586-1588): a failed read is attempted
    once more with the larger save bandwidth."""
    from ..errors import TomboTpuError
    try:
        return resquiggle_read_baseline(
            raw_signal, ref_means, ref_sds, params, outlier_thresh,
            sig_match_thresh, max_scaling_iters, stall_ints=stall_ints)
    except TomboTpuError:
        return resquiggle_read_baseline(
            raw_signal, ref_means, ref_sds, save_params, outlier_thresh,
            sig_match_thresh, max_scaling_iters, stall_ints=stall_ints)


def _np_uncapped(scores: np.ndarray, min_base_obs: int) -> np.ndarray:
    order = np.argsort(scores, kind="stable")[::-1]
    n = scores.shape[0]
    blacklist = np.zeros(n + 2 * min_base_obs + 2, dtype=bool)
    accepted = [order[0]]
    for cand in order[1:]:
        if blacklist[cand + min_base_obs]:
            continue
        accepted.append(cand)
        blacklist[cand + 1:cand + 2 * min_base_obs + 1] = True
    return np.array(accepted, dtype=np.int64)


def static_base_assignment(event_means: np.ndarray, ref_means: np.ndarray,
                           ref_sds: np.ndarray, z_shift: float,
                           skip_pen: float, stay_pen: float,
                           max_half_z_score) -> Optional[np.ndarray]:
    """Short-read static-band base assignment in one native call
    (band plan + winsorized z-scores + static DP + traceback; reference:
    tombo/resquiggle.py:547-600).  Bit-identical to the numpy oracle path
    (tests/test_native.py); returns None when the library is unavailable
    so the caller can fall back."""
    lib = get_lib()
    if lib is None:
        return None
    ev = np.ascontiguousarray(event_means, np.float64)
    rm = np.ascontiguousarray(ref_means, np.float64)
    rs = np.ascontiguousarray(ref_sds, np.float64)
    seq_len = rm.shape[0]
    out = np.empty(seq_len + 1, np.int64)
    rc = lib.static_base_assignment(
        _as_c(ev, ctypes.c_double), ev.shape[0],
        _as_c(rm, ctypes.c_double), _as_c(rs, ctypes.c_double), seq_len,
        float(z_shift), float(skip_pen), float(stay_pen),
        int(max_half_z_score is not None),
        float(max_half_z_score if max_half_z_score is not None else -1.0),
        _as_c(out, ctypes.c_int64))
    if rc != 0:
        return None
    return out


# del_fix_batch status codes -> reference error strings
# (tombo/resquiggle.py:402-540 resolve_skipped_bases_with_raw)
DEL_FIX_ERRORS = {
    2: "Not enough raw signal around potential genomic deletion(s)",
    3: "Read contains too many potential genomic deletions",
    4: "Raw-signal traceback failed to find boundary",
    5: "New segments include zero length events",
    6: "New segments start with negative index",
    7: "New segments end past raw signal values",
}


FIT_FAILED_STATUS = 100


def finalize_batch(jobs, params, ts_mode: int, max_slope: float = 1000.0,
                   n_threads: int = 0):
    """Fused finalize for a batch of reads in ONE threaded native call:
    normalize the mapped raw slice, deletion-fix where flagged, per-base
    event means, Theil-Sen fit and rescale application (same double ops
    as the python host lane; see csrc ``finalize_batch``).

    ``jobs``: list of (raw_slice f64[S], shift, scale, lower, upper,
    ref_means f64[L], ref_sds f64[L], segs i64[L+1], has_del int,
    ts_samp i32[k] or None).  ``ts_mode``: -1 skip fit, 0 exact f64,
    1 f32 pair buffer, 2 fast selection.  Returns (segs_list, ev_list
    (pre-rescale per-base means), norm_list (rescaled normalized
    slices), slopes, inters, status) or None when the native library is
    unavailable."""
    lib = get_lib()
    if lib is None or not jobs:
        return None
    R = len(jobs)
    raw_off = np.zeros(R + 1, np.int64)
    lvl_off = np.zeros(R + 1, np.int64)
    segs_off = np.zeros(R + 1, np.int64)
    samp_off = np.zeros(R + 1, np.int64)
    for r, j in enumerate(jobs):
        raw_off[r + 1] = raw_off[r] + j[0].shape[0]
        lvl_off[r + 1] = lvl_off[r] + j[5].shape[0]
        segs_off[r + 1] = segs_off[r] + j[7].shape[0]
        samp_off[r + 1] = samp_off[r] + (
            0 if j[9] is None else j[9].shape[0])
    raw_c = np.concatenate([np.ascontiguousarray(j[0], np.float64)
                            for j in jobs])
    means_c = np.concatenate([np.ascontiguousarray(j[5], np.float64)
                              for j in jobs])
    sds_c = np.concatenate([np.ascontiguousarray(j[6], np.float64)
                            for j in jobs])
    segs_c = np.concatenate([np.ascontiguousarray(j[7], np.int64)
                             for j in jobs])
    shift = np.array([j[1] for j in jobs], np.float64)
    scale = np.array([j[2] for j in jobs], np.float64)
    lower = np.array([np.nan if j[3] is None else j[3] for j in jobs])
    upper = np.array([np.nan if j[4] is None else j[4] for j in jobs])
    has_del = np.array([j[8] for j in jobs], np.int32)
    if samp_off[-1] > 0:
        ts_samp = np.concatenate(
            [np.ascontiguousarray(j[9], np.int32) for j in jobs
             if j[9] is not None])
    else:
        ts_samp = np.zeros(1, np.int32)
    norm_out = np.empty(int(raw_off[-1]), np.float64)
    ev_out = np.empty(int(lvl_off[-1]), np.float64)
    slopes = np.zeros(R, np.float64)
    inters = np.zeros(R, np.float64)
    status = np.zeros(R, np.int32)
    mhz = params.max_half_z_score
    from ..config import (DEL_FIX_WINDOW, EXTRA_SIG_FACTOR,
                          MAX_DEL_FIX_WINDOW, MAX_RAW_CPTS)
    lib.finalize_batch(
        _as_c(raw_c, ctypes.c_double), _as_c(raw_off, ctypes.c_int64),
        _as_c(shift, ctypes.c_double), _as_c(scale, ctypes.c_double),
        _as_c(lower, ctypes.c_double), _as_c(upper, ctypes.c_double),
        _as_c(means_c, ctypes.c_double), _as_c(sds_c, ctypes.c_double),
        _as_c(lvl_off, ctypes.c_int64), _as_c(segs_c, ctypes.c_int64),
        _as_c(segs_off, ctypes.c_int64), _as_c(has_del, ctypes.c_int32),
        _as_c(ts_samp, ctypes.c_int32), _as_c(samp_off, ctypes.c_int64),
        R, params.raw_min_obs_per_base, 0 if mhz is None else 1,
        0.0 if mhz is None else float(mhz), DEL_FIX_WINDOW,
        MAX_DEL_FIX_WINDOW, EXTRA_SIG_FACTOR,
        -1 if MAX_RAW_CPTS is None else MAX_RAW_CPTS,
        float(max_slope), int(ts_mode),
        _as_c(norm_out, ctypes.c_double), _as_c(ev_out, ctypes.c_double),
        _as_c(slopes, ctypes.c_double), _as_c(inters, ctypes.c_double),
        _as_c(status, ctypes.c_int32), n_threads)
    segs_list = [segs_c[segs_off[r]:segs_off[r + 1]] for r in range(R)]
    ev_list = [ev_out[lvl_off[r]:lvl_off[r + 1]] for r in range(R)]
    norm_list = [norm_out[raw_off[r]:raw_off[r + 1]] for r in range(R)]
    return segs_list, ev_list, norm_list, slopes, inters, status


def del_fix_batch(jobs, params, n_threads: int = 0):
    """Full deletion fix (window planning + raw-signal DP + apply) for a
    batch of reads in one threaded native call.

    ``jobs`` is a list of (norm_signal f64[S], ref_means f64[L],
    ref_sds f64[L], segs i64[L+1]) tuples; ``params`` a ResquiggleParams.
    Returns (segs_list, status (R,) i32) with per-read status codes from
    ``DEL_FIX_ERRORS`` (0 = ok), or None when the native library is
    unavailable (callers fall back to the python path)."""
    lib = get_lib()
    if lib is None or not jobs:
        return None
    R = len(jobs)
    norm_off = np.zeros(R + 1, np.int64)
    lvl_off = np.zeros(R + 1, np.int64)
    segs_off = np.zeros(R + 1, np.int64)
    for r, (norm, means, sds, segs) in enumerate(jobs):
        norm_off[r + 1] = norm_off[r] + norm.shape[0]
        lvl_off[r + 1] = lvl_off[r] + means.shape[0]
        segs_off[r + 1] = segs_off[r] + segs.shape[0]
    norm_c = np.concatenate([np.ascontiguousarray(j[0], np.float64)
                             for j in jobs])
    means_c = np.concatenate([np.ascontiguousarray(j[1], np.float64)
                              for j in jobs])
    sds_c = np.concatenate([np.ascontiguousarray(j[2], np.float64)
                            for j in jobs])
    segs_c = np.concatenate([np.ascontiguousarray(j[3], np.int64)
                             for j in jobs])
    status = np.zeros(R, np.int32)
    mhz = params.max_half_z_score
    from ..config import (DEL_FIX_WINDOW, EXTRA_SIG_FACTOR,
                          MAX_DEL_FIX_WINDOW, MAX_RAW_CPTS)
    lib.del_fix_batch(
        _as_c(norm_c, ctypes.c_double), _as_c(norm_off, ctypes.c_int64),
        _as_c(means_c, ctypes.c_double), _as_c(sds_c, ctypes.c_double),
        _as_c(lvl_off, ctypes.c_int64), _as_c(segs_c, ctypes.c_int64),
        _as_c(segs_off, ctypes.c_int64), R,
        params.raw_min_obs_per_base, 0 if mhz is None else 1,
        0.0 if mhz is None else float(mhz), DEL_FIX_WINDOW,
        MAX_DEL_FIX_WINDOW, EXTRA_SIG_FACTOR,
        -1 if MAX_RAW_CPTS is None else MAX_RAW_CPTS,
        _as_c(status, ctypes.c_int32), n_threads)
    segs_list = [segs_c[segs_off[r]:segs_off[r + 1]] for r in range(R)]
    return segs_list, status


def raw_windows_dp_batch(windows, min_obs_per_base: int,
                         max_half_z_score, n_threads: int = 0):
    """Batched raw-signal deletion-window DP (native, threaded).

    ``windows`` is a list of (sig f64[S], means f64[N], sds f64[N],
    pseudo_starts i64[N+1]) tuples; returns (segs_list, status (W,) i32)
    where segs_list[w] is the i64[N-1] resolved boundaries relative to the
    window signal.  Returns None if the native library is unavailable
    (callers fall back to the numpy oracle)."""
    lib = get_lib()
    if lib is None or not windows:
        return None
    W = len(windows)
    sig_off = np.zeros(W + 1, np.int64)
    ev_off = np.zeros(W + 1, np.int64)
    ps_off = np.zeros(W + 1, np.int64)
    out_off = np.zeros(W + 1, np.int64)
    for w, (sig, means, sds, ps) in enumerate(windows):
        sig_off[w + 1] = sig_off[w] + sig.shape[0]
        ev_off[w + 1] = ev_off[w] + means.shape[0]
        ps_off[w + 1] = ps_off[w] + ps.shape[0]
        out_off[w + 1] = out_off[w] + means.shape[0] - 1
    sig_c = np.concatenate([np.ascontiguousarray(w[0], np.float64)
                            for w in windows])
    means_c = np.concatenate([np.ascontiguousarray(w[1], np.float64)
                              for w in windows])
    sds_c = np.concatenate([np.ascontiguousarray(w[2], np.float64)
                            for w in windows])
    ps_c = np.concatenate([np.ascontiguousarray(w[3], np.int64)
                           for w in windows])
    out = np.zeros(int(out_off[-1]), np.int64)
    status = np.zeros(W, np.int32)
    winsorize = 0 if max_half_z_score is None else 1
    mhz = 0.0 if max_half_z_score is None else float(max_half_z_score)
    lib.raw_windows_dp_batch(
        _as_c(sig_c, ctypes.c_double), _as_c(sig_off, ctypes.c_int64),
        _as_c(means_c, ctypes.c_double), _as_c(sds_c, ctypes.c_double),
        _as_c(ev_off, ctypes.c_int64), _as_c(ps_c, ctypes.c_int64),
        _as_c(ps_off, ctypes.c_int64), W, min_obs_per_base,
        winsorize, mhz, _as_c(out, ctypes.c_int64),
        _as_c(out_off, ctypes.c_int64), _as_c(status, ctypes.c_int32),
        n_threads)
    segs_list = [out[out_off[w]:out_off[w + 1]] for w in range(W)]
    return segs_list, status
