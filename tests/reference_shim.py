"""Import the reference tombo package's pure-Python modules for direct
A/B parity testing (VERDICT round 2, next-round item 5).

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT used here
strictly as a behavioral oracle: its pure-Python functions are executed
on random inputs and compared against tombo_tpu's implementations.

The package cannot import as-is in this environment: it requires
``pkg_resources`` (removed from modern setuptools) and its two compiled
Cython extensions (never built here — no Cython toolchain).  This shim
provides:

* a minimal ``pkg_resources`` with ``resource_filename`` resolving into
  the reference tree (used to locate the bundled k-mer model files);
* stub ``tombo._c_helper`` / ``tombo._c_dynamic_programming`` modules
  whose functions raise by default.  Tests that exercise reference code
  paths reaching a Cython kernel patch in tiny, independent numpy
  oracles written from the .pyx specifications (see ``np_compute_slopes``
  etc. below) — so the *reference's surrounding Python math* runs
  unmodified.
"""
import os
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"

# the reference predates numpy 2.0: restore the removed np.NAN alias it
# uses (e.g. tombo/tombo_stats.py calc_window_fishers_method)
if not hasattr(np, "NAN"):
    np.NAN = np.nan

_C_HELPER_NAMES = (
    "c_mean_std", "c_apply_outlier_thresh", "c_new_means",
    "c_calc_llh_ratio", "c_calc_llh_ratio_const_var",
    "c_calc_scaled_llh_ratio_const_var", "c_new_mean_stds",
    "c_compute_running_pctl_diffs", "c_compute_slopes",
    "c_valid_cpts_w_cap", "c_valid_cpts", "c_valid_cpts_w_cap_t_test",
)
_C_DP_NAMES = (
    "c_base_z_scores", "c_reg_z_scores", "c_base_forward_pass",
    "c_base_traceback", "c_argmax", "c_process_band",
    "c_banded_forward_pass", "c_banded_traceback",
    "c_adaptive_banded_forward_pass",
)


def _unavailable(name):
    def fn(*a, **k):
        raise NotImplementedError(
            "reference Cython kernel %s not built; patch a numpy oracle "
            "in the test" % name)
    fn.__name__ = name
    return fn


# ---------------------------------------------------------------------------
# numpy oracles for the handful of Cython kernels that pure-Python
# reference functions call.  Written from the .pyx sources (cited), NOT
# from tombo_tpu code — they are the independent third implementation in
# each A/B test.
# ---------------------------------------------------------------------------

def np_compute_slopes(r_event_means, r_model_means, max_slope=1000.0):
    """reference: tombo/_c_helper.pyx:362-377 ``c_compute_slopes``."""
    n = r_event_means.shape[0]
    i, j = np.triu_indices(n, 1)
    de = r_event_means[i] - r_event_means[j]
    dm = r_model_means[i] - r_model_means[j]
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(de == 0, max_slope, dm / np.where(de == 0, 1.0, de))
    return s


def np_apply_outlier_thresh(raw_signal, lower_lim, upper_lim):
    """reference: tombo/_c_helper.pyx:73-87 ``c_apply_outlier_thresh``."""
    return np.clip(raw_signal, lower_lim, upper_lim)


def np_new_means(norm_signal, new_segs):
    """reference: tombo/_c_helper.pyx:59-71 ``c_new_means``."""
    return np.array([norm_signal[s:e].mean()
                     for s, e in zip(new_segs[:-1], new_segs[1:])])


def np_compute_running_pctl_diffs(raw_signal, window_size, lower_pctl,
                                  upper_pctl):
    """reference: tombo/_c_helper.pyx:221-275 — rolling
    (upper - lower) percentile difference over ``window_size`` windows.
    Percentiles use the reference's sorted-array index convention
    (floor((n - 1) * pctl / 100))."""
    n = raw_signal.shape[0]
    out = np.empty(n - window_size + 1)
    lo_i = int((window_size - 1) * lower_pctl / 100.)
    hi_i = int((window_size - 1) * upper_pctl / 100.)
    for i in range(out.shape[0]):
        w = np.sort(raw_signal[i:i + window_size])
        out[i] = w[hi_i] - w[lo_i]
    return out


_LOADED = {}


def load_reference():
    """Import and return (tombo_stats, tombo_helper, _default_parameters)
    from /root/reference with the shims installed.  Idempotent."""
    if _LOADED:
        return (_LOADED["ts"], _LOADED["th"], _LOADED["dp"])

    if "pkg_resources" not in sys.modules:
        pr = types.ModuleType("pkg_resources")

        def resource_filename(package, path):
            return os.path.join(REF_ROOT, package.replace(".", os.sep),
                                path)

        pr.resource_filename = resource_filename
        sys.modules["pkg_resources"] = pr

    # stub the compiled extensions BEFORE any reference import
    pkg = types.ModuleType("tombo")
    pkg.__path__ = [os.path.join(REF_ROOT, "tombo")]
    sys.modules.setdefault("tombo", pkg)
    ch = types.ModuleType("tombo._c_helper")
    for n in _C_HELPER_NAMES:
        setattr(ch, n, _unavailable(n))
    sys.modules["tombo._c_helper"] = ch
    cdp = types.ModuleType("tombo._c_dynamic_programming")
    for n in _C_DP_NAMES:
        setattr(cdp, n, _unavailable(n))
    sys.modules["tombo._c_dynamic_programming"] = cdp

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # the reference calls np.seterr(all='raise') at module top (e.g.
    # tombo/tombo_stats.py:19) — a process-global that would both break
    # its own import under modern scipy (halfnorm.expect() underflows in
    # quadrature) and leak strict fp-exception state into every other
    # test.  Disable seterr for the import and restore prior settings.
    saved_err = np.geterr()
    saved_seterr = np.seterr

    def _no_seterr(*a, **k):
        return saved_err

    np.seterr = _no_seterr
    try:
        with np.errstate(all="ignore"):
            import tombo._default_parameters as r_dp  # noqa: E402
            import tombo.tombo_helper  # noqa: E402,F401
            import tombo.tombo_stats as r_ts  # noqa: E402
    finally:
        np.seterr = saved_seterr
        np.seterr(**saved_err)

    _LOADED.update({"ts": r_ts, "th": sys.modules["tombo.tombo_helper"],
                    "dp": r_dp, "c_helper": ch})
    return r_ts, sys.modules["tombo.tombo_helper"], r_dp


def patch_c_helper(**fns):
    """Point stubbed ``tombo._c_helper`` names at numpy oracles for the
    duration of a test (the reference modules hold direct references via
    ``from ._c_helper import ...`` — patch those too)."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        ts, th, _ = load_reference()
        saved = []
        for name, fn in fns.items():
            for mod in (sys.modules["tombo._c_helper"], ts, th):
                if hasattr(mod, name):
                    saved.append((mod, name, getattr(mod, name)))
                    setattr(mod, name, fn)
        try:
            yield
        finally:
            for mod, name, old in saved:
                setattr(mod, name, old)

    return ctx()


# ===========================================================================
# REFERENCE-DERIVED TEST ORACLES (transcriptions, test-only)
# ===========================================================================
# The functions below are faithful line-by-line numpy transcriptions of the
# reference's compiled band DP kernels, kept ONLY so the A/B tests can
# assert that this repo's from-spec implementations reproduce the exact
# semantics (argmax tie policy via `>` comparisons, monotone band clamp,
# band-overrun errors, winsorize/mask fill order):
#   c_argmax / c_process_band        /root/reference/tombo/_c_dynamic_programming.pyx:186-236
#   c_banded_forward_pass            pyx:240-279
#   c_banded_traceback               pyx:281-311
#   c_adaptive_banded_forward_pass   pyx:314-412
# They are NOT product code and are never imported by tombo_tpu.

def ref_c_argmax(vals):
    max_val = vals[0]
    max_pos = 0
    for pos in range(1, vals.shape[0]):
        if vals[pos] > max_val:
            max_val = vals[pos]
            max_pos = pos
    return max_pos


def ref_c_process_band(fwd_pass, fwd_pass_tb, shifted_z_scores, stay_pen,
                       skip_pen, bandwidth, band_starts_diff, seq_pos):
    for band_pos in range(1, bandwidth):
        pos_z_score = shifted_z_scores[band_pos]
        prev_b_pos = band_pos + band_starts_diff
        max_score = fwd_pass[seq_pos + 1, band_pos - 1] - stay_pen \
            + pos_z_score
        max_from = 0
        if prev_b_pos - 1 < bandwidth:
            diag_score = fwd_pass[seq_pos, prev_b_pos - 1] + pos_z_score
            if diag_score > max_score:
                max_score = diag_score
                max_from = 2
            if prev_b_pos < bandwidth:
                skip_score = fwd_pass[seq_pos, prev_b_pos] - skip_pen
                if skip_score > max_score:
                    max_score = skip_score
                    max_from = 1
        fwd_pass[seq_pos + 1, band_pos] = max_score
        fwd_pass_tb[seq_pos + 1, band_pos] = max_from


def ref_c_banded_forward_pass(shifted_z_scores, event_starts, skip_pen,
                              stay_pen):
    n_bases, bandwidth = shifted_z_scores.shape
    fwd_pass = np.empty((n_bases + 1, bandwidth))
    fwd_pass_tb = np.empty((n_bases + 1, bandwidth), dtype=np.int64)
    fwd_pass[0, :] = 0.0
    # the reference leaves tb row 0 uninitialized (np.empty) and never
    # reads it; zero it here so A/B comparisons are deterministic
    fwd_pass_tb[0, :] = 0
    for seq_pos in range(n_bases):
        if seq_pos == 0 or event_starts[seq_pos] == event_starts[seq_pos - 1]:
            fwd_pass[seq_pos + 1, 0] = fwd_pass[seq_pos, 0] - skip_pen
            fwd_pass_tb[seq_pos + 1, 0] = 1
        else:
            fwd_pass[seq_pos + 1, 0] = (
                fwd_pass[seq_pos, event_starts[seq_pos] -
                         event_starts[seq_pos - 1] - 1] +
                shifted_z_scores[seq_pos, 0])
            fwd_pass_tb[seq_pos + 1, 0] = 2
        band_starts_diff = (event_starts[seq_pos] - event_starts[seq_pos - 1]
                            if seq_pos > 0 else 0)
        ref_c_process_band(fwd_pass, fwd_pass_tb,
                           shifted_z_scores[seq_pos, :], stay_pen,
                           skip_pen, bandwidth, band_starts_diff, seq_pos)
    return fwd_pass, fwd_pass_tb


def ref_c_banded_traceback(fwd_pass_tb, event_starts, band_pos,
                           band_boundary_thresh=-1):
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
            raise NotImplementedError(
                'Read event to sequence alignment extends beyond bandwidth')
        curr_event_pos = event_starts[curr_seq_pos - 1] + band_pos
        seq_poss[curr_seq_pos - 1] = curr_event_pos + 1
    return seq_poss


def ref_c_adaptive_banded_forward_pass(
        fwd_pass, fwd_pass_tb, event_starts, event_means, r_ref_means,
        r_ref_sds, z_shift, skip_pen, stay_pen, start_seq_pos,
        mask_fill_z_score, do_winsorize_z, max_half_z_score,
        return_z_scores=False):
    n_bases = fwd_pass.shape[0] - 1
    bandwidth = fwd_pass.shape[1]
    half_bandwidth = bandwidth // 2
    n_events = event_means.shape[0]
    shifted_z_scores = np.empty(bandwidth)
    all_z = (np.empty((n_bases - start_seq_pos, bandwidth))
             if return_z_scores else None)
    for seq_pos in range(start_seq_pos, n_bases):
        prev_band_start = event_starts[seq_pos - 1]
        curr_band_start = prev_band_start + ref_c_argmax(
            fwd_pass[seq_pos]) - half_bandwidth + 1
        if curr_band_start < prev_band_start:
            curr_band_start = prev_band_start
        if curr_band_start >= n_events:
            if seq_pos < n_bases - 2:
                raise NotImplementedError(
                    'Adaptive signal to seqeunce alignment extended '
                    'beyond raw signal')
            curr_band_start = n_events - 1
        event_starts[seq_pos] = curr_band_start
        ref_mean = r_ref_means[seq_pos]
        ref_sd = r_ref_sds[seq_pos]
        band_hi = min(curr_band_start + bandwidth, n_events)
        for event_pos in range(curr_band_start, band_hi):
            pos_z_score = (event_means[event_pos] - ref_mean) / ref_sd
            if pos_z_score < 0:
                pos_z_score = -pos_z_score
            if do_winsorize_z:
                pos_z_score = min(pos_z_score, max_half_z_score)
            shifted_z_scores[event_pos - curr_band_start] = \
                z_shift - pos_z_score
        for event_pos in range(n_events - curr_band_start, bandwidth):
            shifted_z_scores[event_pos] = mask_fill_z_score
        if return_z_scores:
            all_z[seq_pos - start_seq_pos, :] = shifted_z_scores
        if curr_band_start == prev_band_start:
            fwd_pass[seq_pos + 1, 0] = fwd_pass[seq_pos, 0] - skip_pen
            fwd_pass_tb[seq_pos + 1, 0] = 1
        else:
            fwd_pass[seq_pos + 1, 0] = fwd_pass[
                seq_pos, curr_band_start - prev_band_start - 1] + \
                shifted_z_scores[0]
            fwd_pass_tb[seq_pos + 1, 0] = 2
        ref_c_process_band(fwd_pass, fwd_pass_tb, shifted_z_scores,
                           stay_pen, skip_pen, bandwidth,
                           curr_band_start - prev_band_start, seq_pos)
    if return_z_scores:
        return all_z
    return None
