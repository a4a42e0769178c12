"""Batched re-squiggle: the TPU performance lane.

Reads are bucketed by length, padded to static shapes, and driven through
device kernels in stages; each stage is one jitted call over the whole
batch.  All irregular/sequential pieces (greedy changepoint selection, tiny
deletion-fix DP windows, per-read planning) stay on the host, overlapped
with device work by construction (host prepares batch N+1 while the device
runs batch N under JAX async dispatch).

This replaces the reference's N-process × M-thread CPU fan-out
(reference: tombo/resquiggle.py:1859-1948 ``resquiggle_all_reads``) with a
single host feeding a device (and, via parallel/mesh.py, a mesh of
devices with batches sharded data-parallel).

Stage map (mirrors the single-read path in pipeline/resquiggle.py):
  A. normalize + changepoint scores + greedy selection + event means
     + start-discovery DP + validity score   [device, ONE fused call]
  B. start retry / masked band plan          [host, tiny]
  C. adaptive banded DP + traceback          [device, fused Pallas kernel]
  D. deletion fix (native C++) + Theil-Sen (native C++) + assembly [host]
  -> iterate scaling (<=3) on changed reads; failed reads retried in a
     save-bandwidth lane
Large arrays (normalized signal, scores, move rows) never cross the
host link; each stage costs one overlapped device->host fetch.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import os
import sys

from .. import config
from ..config import MASK_FILL_Z_SCORE, ResquiggleParams, SIG_MATCH_THRESH
from ..errors import TomboTpuError
from ..ops import dp as dpo
from ..ops import normalize as nrm
from ..ops import ref_impl
from ..ops import rescale as rescale_ops
from ..ops import segment as seg
from ..ops import select as sel
from ..seq import encode_seq
from ..types import ResquiggleResults, ScaleValues, SeqSampleType
from . import resquiggle as rsq


import time as _time
from collections import defaultdict as _dd

# per-stage wall-clock accumulators, enabled with TOMBO_TPU_PROFILE=1
# (the TPU-era analog of the reference's _PROFILE_* cProfile toggles,
# reference: tombo/resquiggle.py:72-73, tombo/tombo_stats.py:68-74)
STAGE_TIMINGS = _dd(float)

# host<->device transfer byte accumulators (same TOMBO_TPU_PROFILE=1
# toggle).  On link-constrained attachments the wire time, not device
# FLOPs, bounds batch latency, so the profile reports what actually
# crossed the link per direction.
TRANSFER_BYTES = _dd(int)


def _profiling() -> bool:
    return os.environ.get("TOMBO_TPU_PROFILE", "") == "1"


import threading as _threading

_STAGE_TLS = _threading.local()


def _timed_stage(name):
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*a, **k):
            if not _profiling():
                return fn(*a, **k)
            t0 = _time.perf_counter()
            prev = getattr(_STAGE_TLS, "name", None)
            _STAGE_TLS.name = name
            try:
                return fn(*a, **k)
            finally:
                _STAGE_TLS.name = prev
                STAGE_TIMINGS[name] += _time.perf_counter() - t0
        return wrapper
    return deco


class _sub:
    """Sub-stage attribution context: splits a stage's wall into named
    terms (host packing vs blocking device fetch vs native compute) so
    the bench's stage budget localizes the wall to host, wire or device
    instead of one opaque number (round-4 verdict: the single biggest
    stage line item was unattributed)."""
    __slots__ = ("name", "t0")

    def __init__(self, name):
        self.name = name

    def __enter__(self):
        if _profiling():
            self.t0 = _time.perf_counter()
        return self

    def __exit__(self, *exc):
        if _profiling():
            STAGE_TIMINGS[self.name] += _time.perf_counter() - self.t0
        return False


def jax_trace_ctx():
    """``TOMBO_TPU_JAX_PROFILE=<dir>`` wraps the batch pipeline in a
    ``jax.profiler.trace`` capture (view with TensorBoard / xprof); the
    device-level companion to the TOMBO_TPU_PROFILE wall-clock stages
    (SURVEY §5.1)."""
    import contextlib
    trace_dir = os.environ.get("TOMBO_TPU_JAX_PROFILE")
    if not trace_dir:
        return contextlib.nullcontext()
    import jax
    return jax.profiler.trace(trace_dir)


def print_stage_timings(out=None):
    import sys
    out = out or sys.stderr
    total = sum(STAGE_TIMINGS.values())
    for name, t in sorted(STAGE_TIMINGS.items(), key=lambda kv: -kv[1]):
        out.write("  %-18s %8.3f s (%4.1f%%)\n" % (
            name, t, 100 * t / total if total else 0))
    for name, b in sorted(TRANSFER_BYTES.items()):
        out.write("  %-18s %8.2f MB\n" % (name, b / 2 ** 20))


# flips permanently (per process) when a Pallas kernel fails to lower or
# execute on the active backend; the scan engine takes over
_PALLAS_BROKEN = [False]


def _use_pallas() -> bool:
    """Fused Pallas DP by default on TPU backends; scan engine elsewhere
    (Pallas interpret mode on CPU is far slower than the scan).  Override
    with TOMBO_TPU_PALLAS=0/1."""
    env = os.environ.get("TOMBO_TPU_PALLAS", "")
    if env in ("0", "1"):
        return env == "1"
    import jax
    return jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pow2_bucket(x: int, lo: int) -> int:
    """Round ``x`` up to a power-of-two bucket (>= lo).

    Every distinct padded shape is a separate XLA compile (tens of seconds
    on TPU backends), so all device-facing dimensions are padded to a small
    geometric family of buckets rather than tight multiples."""
    b = lo
    while b < x:
        b *= 2
    return b


def _sig_bucket(x: int, lo: int = 1024) -> int:
    """Signal-axis bucket: half-octave steps (pow2 and 1.5x pow2).

    The padded raw matrix dominates host->device wire bytes, so cutting
    the mean padding waste from ~33% to ~17% on this one axis is worth
    doubling its compile-cache entries (other axes stay power-of-two)."""
    b = lo
    while True:
        if x <= b:
            return b
        if x <= b + b // 2:
            return b + b // 2
        b *= 2


def _fetch(*arrs):
    """Device->host fetch with overlapped round trips.

    Each blocking ``np.asarray`` pays a full link round trip (tens of ms
    through a tunneled device); starting all copies async first overlaps
    them so a stage pays one latency instead of one per array.  Under
    TOMBO_TPU_PROFILE=1 the blocking wait is attributed to the enclosing
    stage as ``<stage>_fetch`` — on async dispatch this wait is where
    device compute + wire time surfaces, so the split separates host
    work from device/wire stall within each stage."""
    for a in arrs:
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass
    if not _profiling():
        return [np.asarray(a) for a in arrs]
    t0 = _time.perf_counter()
    out = [np.asarray(a) for a in arrs]
    stage = getattr(_STAGE_TLS, "name", None) or "other"
    STAGE_TIMINGS[stage + "_fetch"] += _time.perf_counter() - t0
    TRANSFER_BYTES["fetch"] += sum(a.nbytes for a in out)
    return out


def _fetch_packed_f32(*arrs):
    """Fetch several per-read scalar vectors as ONE stacked (k, B) f32
    device array: each separate device->host transfer pays a fixed link
    overhead (several ms through the tunnel), which dominates tiny
    fetches.  Exact for f32 values and integers < 2^24 (status codes,
    event indices, flags); the f64 oracle lane keeps per-array
    fetches."""
    stacked = jnp.stack([a.astype(jnp.float32) for a in arrs])
    (out,) = _fetch(stacked)
    return tuple(out[i] for i in range(len(arrs)))


def _fetch_row(a) -> np.ndarray:
    """Single-row on-demand fetch (rare paths: lazy cpts
    materialization, stall-overflow seg rows, static-fallback event
    means); counted so the transfer profile stays honest."""
    if not _profiling():
        return np.asarray(a)
    t0 = _time.perf_counter()
    out = np.asarray(a)
    stage = getattr(_STAGE_TLS, "name", None) or "other"
    STAGE_TIMINGS[stage + "_fetch"] += _time.perf_counter() - t0
    TRANSFER_BYTES["fetch"] += out.nbytes
    return out


def _pad_rows(arr: np.ndarray, b_pad: int) -> np.ndarray:
    """Pad the batch axis to ``b_pad`` rows by replicating row 0.

    Replication (vs zero-fill) keeps every kernel's edge cases off the pad
    rows — they compute a valid read whose outputs are discarded."""
    b = arr.shape[0]
    if b == b_pad:
        return arr
    return np.concatenate(
        [arr, np.broadcast_to(arr[0], (b_pad - b,) + arr.shape[1:])], axis=0)


def _geo_bucket(x: int, lo: int = 1 << 16, ratio: float = 1.25) -> int:
    """Geometric bucket family for the flat (ragged) signal buffer.

    A 1.25 step bounds padding waste at 20% (mean ~10%) while keeping the
    bucket set small enough that steady-state batches reuse compiled
    shapes."""
    b = lo
    while b < x:
        b = _round_up(int(b * ratio), 1024)
    return b


def _delta_wire() -> bool:
    """int8-delta raw wire format (default on): consecutive DAC samples
    differ by < 128 for ~97% of positions, so the dominant host->device
    transfer ships one int8 delta per sample plus a sparse escape list
    (position, residual) instead of dense int16 — ~1.7x less wire.
    Reconstruction (int32 cumsum after scatter-adding residuals) is
    exact."""
    return os.environ.get("TOMBO_TPU_DELTA_WIRE", "1") == "1"


@functools.partial(jax.jit, static_argnames=("S",))
def _unflatten_delta_rows(flat8, offsets, lens, firsts, exc_dest, exc_res,
                          S: int):
    """Reconstruct the padded (B, S) int16 signal matrix from the
    int8-delta ragged wire format: scatter per-read deltas into rows,
    add escape residuals at their flattened destinations, integer-cumsum
    along the signal axis.  Bit-exact inverse of the host encoder
    (pad rows beyond the true batch carry in-range garbage; every
    consumer masks by its own row index)."""
    B = offsets.shape[0]
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    lens32 = lens.astype(jnp.int32)[:, None]
    valid_d = (pos >= 1) & (pos < lens32)
    idx = offsets.astype(jnp.int32)[:, None] + pos - 1
    d = jnp.where(
        valid_d,
        jnp.take(flat8, jnp.where(valid_d, idx, 0)).astype(jnp.int32), 0)
    d = jnp.where(pos == 0, firsts.astype(jnp.int32)[:, None], d)
    d = d.reshape(B * S).at[exc_dest].add(exc_res.astype(jnp.int32))
    x = jnp.cumsum(d.reshape(B, S), axis=1)
    return jnp.where(pos < lens32, x, 0).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("S",))
def _unflatten_rows(flat, offsets, lens, S: int):
    """Scatter a flat concatenated signal buffer into the padded (B, S)
    matrix on device.  Uploading only the real samples (plus a small
    geometric-bucket pad) instead of the dense padded matrix cuts the
    dominant host->device transfer by the per-read padding waste —
    dramatic on mixed-length batches where the longest read sets S."""
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = pos < lens.astype(jnp.int32)[:, None]
    idx = offsets.astype(jnp.int32)[:, None] + pos
    out = jnp.take(flat, jnp.where(valid, idx, 0))
    return jnp.where(valid, out, jnp.zeros((), flat.dtype))


def _unflatten_rows_sharded(mesh, flat2, offsets, lens, S: int):
    """Mesh variant of ``_unflatten_rows``: each device scatters its own
    shard's flat buffer (one row of ``flat2``) into its read rows — no
    cross-device traffic, and the host uploads only each shard's real
    samples."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import READS_AXIS

    def local(f, o, l):
        return _unflatten_rows(f[0], o, l, S)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(READS_AXIS), P(READS_AXIS), P(READS_AXIS)),
        out_specs=P(READS_AXIS))(flat2, offsets, lens)


def _pack_bases(bc: np.ndarray) -> np.ndarray:
    """Pack 0..3 base codes four-per-byte (little-endian within the
    byte); the device side unpacks with two-bit shifts."""
    n4 = _round_up(bc.shape[0], 4)
    b = np.zeros(n4, np.uint8)
    b[:bc.shape[0]] = bc
    b = b.reshape(-1, 4)
    return (b[:, 0] | (b[:, 1] << 2) | (b[:, 2] << 4) |
            (b[:, 3] << 6)).astype(np.uint8)


@functools.partial(jax.jit,
                   static_argnames=("width", "k", "n_sent", "clip"))
def _codes_from_packed(packed, n_codes, width: int, k: int, n_sent: int,
                       clip: bool):
    """Derive (B, width) k-mer codes on device from 2-bit packed bases.

    Exactly reproduces the host ``seq_to_kmer_codes`` integer arithmetic
    (first base most significant) with the sentinel fill of
    ``_codes_rows``; ships width/4 + k bytes per read over the link
    instead of 2*width."""
    B, PB = packed.shape
    p = packed.astype(jnp.int32)
    bases = jnp.stack([(p >> (2 * j)) & 3 for j in range(4)],
                      axis=-1).reshape(B, PB * 4)[:, :width + k - 1]
    codes = jnp.zeros((B, width), jnp.int32)
    for j in range(k):
        codes = codes * 4 + bases[:, j:j + width]
    nc = n_codes.astype(jnp.int32)[:, None]
    if clip:
        valid = nc >= width
    else:
        valid = jnp.arange(width, dtype=jnp.int32)[None, :] < nc
    return jnp.where(valid, codes, n_sent)


@dataclass
class _ReadState:
    """Per-read mutable state as it flows through the stages."""
    idx: int
    map_res: ResquiggleResults
    raw: np.ndarray
    num_events: int
    error: Optional[str] = None
    # int16 view of integral DAC raw signal (None when non-integral);
    # computed once per batch so every segment pass uploads half-width
    # without re-scanning the padded matrix
    raw_i16: Optional[np.ndarray] = None
    # cached int8-delta encoding of raw_i16 (first, deltas, escape
    # positions, escape residuals) — see _delta_wire
    raw_d8: Optional[tuple] = None
    # stage products
    scale_values: Optional[ScaleValues] = None
    norm: Optional[np.ndarray] = None
    cpts: Optional[np.ndarray] = None
    # lazily-fetched device residency of the changepoints: (device (B, C)
    # matrix, row, count).  The (B, max_cpts) matrix is ~4 MB per batch;
    # with the fused device finalize on, no host consumer needs it, so it
    # stays on-chip and rescale passes row-gather it in place instead of
    # fetch + re-upload.  Host materialization (_cpts_of) happens only on
    # the rare static-fallback / debug paths.
    cpts_dev: Optional[tuple] = None
    # device residency of the padded raw-signal matrix from the first
    # segmentation pass: (device (B, S) matrix, row).  Rescale passes
    # row-gather it in place instead of re-uploading raw signal.
    raw_dev: Optional[tuple] = None
    event_means: Optional[np.ndarray] = None
    ref_means: Optional[np.ndarray] = None
    ref_sds: Optional[np.ndarray] = None
    # validated k-mer codes of the mapped sequence; device stages upload
    # these (L,) int16 rows and gather expected levels from the on-chip
    # model table (4x less wire than two float level rows per read)
    ref_codes: Optional[np.ndarray] = None
    # 2-bit packed base codes of the mapped sequence (4 bases/byte);
    # device stages ship these and derive the k-mer codes on-chip — 8x
    # less wire than the int16 code rows
    packed_bases: Optional[np.ndarray] = None
    genome_seq_trim: Optional[str] = None
    use_static: bool = False
    n_ev: int = 0
    dev_row: int = -1
    mapped_start: int = 0
    events_per_base: float = 0.0
    result: Optional[ResquiggleResults] = None
    # device-finalize deletion flag: False = DP path has no zero-length
    # segments (skip the raw-signal fix), None = unknown (host decides)
    has_del: Optional[bool] = None

    def delta8(self):
        """Cached int8-delta encoding of the int16 raw signal:
        (first sample, int8 deltas, escape positions, escape residuals);
        exact by construction (residual = true delta - clipped delta)."""
        if self.raw_d8 is None:
            x = self.raw_i16
            d = np.diff(x.astype(np.int32))
            c = np.clip(d, -128, 127)
            epos = np.flatnonzero(d != c)
            self.raw_d8 = (x[0] if x.size else np.int16(0),
                           c.astype(np.int8), epos.astype(np.int32),
                           (d[epos] - c[epos]).astype(np.int32))
        return self.raw_d8


_GROUP_RATIO = 2.0      # max signal-length spread within a device group
_MIN_GROUP = 24         # don't cut groups smaller than this

# device deletion-fix window buckets: windows beyond these route the read
# to the host native finalize lane (the reference errors out entirely
# above MAX_RAW_CPTS=200 events; tombo/resquiggle.py:486)
_DELFIX_NB_CAP = 32
_DELFIX_T_CAP = 512


def _length_groups(live: list) -> list:
    """Split a batch into signal-length groups before any device work.

    Every device shape scales with the batch MAX (signal samples, bases,
    events), so one far-tail read pads every read's device program: a
    single 30 kb read in a median-2.7 kb batch inflates the DP cell count
    ~12x for everyone (measured 644 -> 20 reads/s on the mixed-length
    bench).  Grouping bounds within-group length spread at _GROUP_RATIO
    (padding waste <= 2x on every axis) while keeping groups >=
    _MIN_GROUP reads so fixed per-call costs stay amortized; each group
    runs the whole pass pipeline with its own tight shape buckets.
    Rescale passes sort by the device-resident raw source first so the
    in-place row-gather reuse (one shared padded matrix per group) keeps
    working."""
    if len(live) < 2 * _MIN_GROUP:
        return [live] if live else []
    order = sorted(live, key=lambda s: (
        id(s.raw_dev[0]) if s.raw_dev is not None else 0,
        s.raw.shape[0]))
    groups, start = [], 0
    base = order[0].raw.shape[0]
    src = order[0].raw_dev
    for i, s in enumerate(order):
        new_src = (s.raw_dev is None) != (src is None) or (
            s.raw_dev is not None and src is not None and
            s.raw_dev[0] is not src[0])
        if (i - start >= _MIN_GROUP and
                (s.raw.shape[0] > base * _GROUP_RATIO or new_src)):
            groups.append(order[start:i])
            start, base = i, s.raw.shape[0]
        elif new_src:
            base = s.raw.shape[0]
        src = s.raw_dev
    groups.append(order[start:])
    return groups


@functools.partial(jax.jit, static_argnames=(
    "outlier_thresh", "w", "min_base_obs", "max_cpts"))
def _stage1_dna(raw, sig_lens, has_sv, sv_shift, sv_scale,
                sv_lower, sv_upper, num_cpts, outlier_thresh: float, w: int,
                min_base_obs: int, max_cpts: int):
    """DNA stage 1, fully fused on device: normalize (median/MAD, or
    per-read provided scale values on rescaling iterations) -> changepoint
    scores -> greedy selection -> event means.  Only the (B, max_cpts)
    changepoints and the scale scalars are meant to leave the device; the
    (B, S) normalized signal and scores stay resident."""
    raw = raw.astype(sv_shift.dtype)
    norm, shift, scale, lower, upper = nrm.normalize_median_batch(
        raw, sig_lens, outlier_thresh)
    shift = jnp.where(has_sv, sv_shift, shift)
    scale = jnp.where(has_sv, sv_scale, scale)
    lower = jnp.where(has_sv, sv_lower, lower)
    upper = jnp.where(has_sv, sv_upper, upper)
    norm_sv = jnp.clip((raw - shift[:, None]) / scale[:, None],
                       lower[:, None], upper[:, None])
    idx = jnp.arange(raw.shape[1])[None, :]
    norm_sv = jnp.where(idx < sig_lens[:, None], norm_sv, 0.0)
    norm = jnp.where(has_sv[:, None], norm_sv, norm)
    scores = seg.cpt_scores_diff_batch(norm, sig_lens, w)
    cpts, status = sel.greedy_cpts_device(
        scores, sig_lens - 2 * w + 1, num_cpts, min_base_obs, w, max_cpts)
    em = nrm.compute_base_means_batch(
        norm, cpts, num_cpts.astype(jnp.int32) - 1)
    return norm, em, cpts, status, shift, scale, lower, upper


@jax.jit
def _stage1_rna_norm(raw, sig_lens, shift, scale, lower, upper, cpts,
                     n_segs):
    """RNA stage 1b: apply host-derived scale values, event means."""
    norm = nrm.normalize_with_scale_batch(
        raw, sig_lens, shift, scale, lower, upper)
    em = nrm.compute_base_means_batch(norm, cpts, n_segs)
    return norm, em


@functools.partial(jax.jit, static_argnames=("sp", "use_pallas"))
def _stage_a_rescale(raw, sig_lens, sv_shift, sv_scale, sv_lower, sv_upper,
                     cpts, n_cpts, rm_start, rs_start,
                     sp: dpo.StartDpParams, use_pallas: bool):
    """Rescale-iteration stage A: changepoint scores are invariant under
    the affine re-normalization (the diff/t-statistic scorers scale by a
    positive constant, preserving the greedy selection), so redo passes
    reuse the first pass's changepoints and only re-normalize, recompute
    event means and re-run start discovery."""
    raw_f = raw.astype(sv_shift.dtype)
    norm = nrm.normalize_with_scale_batch(
        raw_f, sig_lens, sv_shift, sv_scale, sv_lower, sv_upper)
    em = nrm.compute_base_means_batch(norm, cpts,
                                      n_cpts.astype(jnp.int32) - 1)
    need = sp.num_bases + sp.num_events
    em_p = em
    if em_p.shape[1] < need:
        em_p = jnp.pad(em_p, ((0, 0), (0, need - em_p.shape[1])))
    start_segs, start_score, _ = _start_dp_with_score(
        em_p[:, :need], rm_start, rs_start, sp, use_pallas)
    return norm, em, start_segs, start_score


@functools.partial(jax.jit, static_argnames=(
    "outlier_thresh", "w", "min_base_obs", "max_cpts", "sp", "use_pallas",
    "use_event_scale", "scale_num_events", "scale_max_frac"))
def _stage_a_rna(raw, sig_lens, has_sv, sv_shift, sv_scale, sv_lower,
                 sv_upper, num_cpts, stall_starts, stall_ends, rm_start,
                 rs_start, outlier_thresh: float, w: int,
                 min_base_obs: int, max_cpts: int, sp: dpo.StartDpParams,
                 use_pallas: bool, use_event_scale: bool,
                 scale_num_events: int, scale_max_frac: float):
    """RNA stages 1-3 in ONE device call: t-test changepoint scores ->
    greedy selection -> stall-interval changepoint removal -> event-based
    scale estimation -> normalization -> event means -> start DP +
    validity score (reference flow: tombo/resquiggle.py:1057-1120 RNA
    branches).  Returns compacted changepoints with per-read counts."""
    raw_f = raw.astype(sv_shift.dtype)
    scores = seg.cpt_scores_t_test_batch(raw_f, sig_lens, w)
    cpts, status = sel.greedy_cpts_device(
        scores, sig_lens - 2 * w, num_cpts, min_base_obs, w, max_cpts)

    # stall removal (reference: tombo/tombo_stats.py:1576-1597): drop
    # changepoints strictly inside any stall interval, then compact
    idx = jnp.arange(max_cpts, dtype=jnp.int32)[None, :]
    in_any = jnp.any(
        (cpts[:, None, :] > stall_starts[:, :, None]) &
        (cpts[:, None, :] < stall_ends[:, :, None]), axis=1)
    valid = (idx < num_cpts[:, None].astype(jnp.int32)) & (~in_any)
    big = jnp.int32(2 ** 30)
    cpts = jnp.sort(jnp.where(valid, cpts, big), axis=1)
    n_cpts = jnp.sum(valid, axis=1).astype(jnp.int32)
    cpts = jnp.where(idx < n_cpts[:, None], cpts, 0)

    # event-based scale estimation over raw event means (reference:
    # tombo/tombo_stats.py:217-233 get_scale_values_from_events)
    if use_event_scale:
        k_sc = jnp.minimum(
            jnp.int32(scale_num_events),
            (n_cpts.astype(jnp.float32) * scale_max_frac).astype(jnp.int32))
        em_raw = nrm.compute_base_means_batch(raw_f, cpts, n_cpts - 1)
        n_means = jnp.maximum(k_sc - 1, 1)
        shift = nrm.masked_median(em_raw, n_means)
        scale = nrm.masked_mad(em_raw, shift, n_means)
        ot = (outlier_thresh if outlier_thresh is not None
              else float(nrm.POS_LARGE))
        lower = jnp.full_like(shift, -ot)
        upper = jnp.full_like(shift, ot)
    else:
        _, shift, scale, lower, upper = nrm.normalize_median_batch(
            raw_f, sig_lens, None)
        lower = jnp.full_like(shift, jnp.nan)
        upper = jnp.full_like(shift, jnp.nan)
    shift = jnp.where(has_sv, sv_shift, shift)
    scale = jnp.where(has_sv, sv_scale, scale)
    lower = jnp.where(has_sv, sv_lower, lower)
    upper = jnp.where(has_sv, sv_upper, upper)

    norm, em = _stage1_rna_norm(raw_f, sig_lens, shift, scale, lower,
                                upper, cpts, n_cpts - 1)

    need = sp.num_bases + sp.num_events
    em_p = em
    if em_p.shape[1] < need:
        em_p = jnp.pad(em_p, ((0, 0), (0, need - em_p.shape[1])))
    start_segs, start_score, _ = _start_dp_with_score(
        em_p[:, :need], rm_start, rs_start, sp, use_pallas)
    return (norm, em, cpts, n_cpts, status, shift, scale, lower, upper,
            start_segs, start_score)


@functools.partial(jax.jit, static_argnames=("n_rows",))
def _stage_finalize(cpts, rows, clips, segs_dp, seq_lens, ev_lens,
                    n_rows: int):
    """Device traceback finalize: trim + raw coordinates + deletion flag
    in the same fused program as the DP (host equivalents:
    pipeline/resquiggle.py ``_trim_traceback``/``get_rel_raw_coords``;
    reference: tombo/resquiggle.py:754-764,858-864).  Integer-exact, so
    results are bitwise identical to the host loop; ``has_del`` routes
    reads with zero-length segments to the host raw-signal deletion DP
    and lets clean reads skip window planning entirely."""
    L = n_rows
    iot_L1 = jnp.arange(L + 1, dtype=jnp.int32)[None, :]
    ev_lens = ev_lens.astype(jnp.int32)[:, None]
    seq_lens = seq_lens.astype(jnp.int32)

    # traceback trim: only leading (<0) and trailing (>events_len)
    # positions can be out of range, so a clip is exactly equivalent
    tb = jnp.clip(segs_dp.astype(jnp.int32), 0, ev_lens)
    cpts_rows = jnp.take(cpts, rows, axis=0).astype(jnp.int32)
    gather_idx = jnp.clip(clips.astype(jnp.int32)[:, None] + tb, 0,
                          cpts_rows.shape[1] - 1)
    seq_segs_abs = jnp.take_along_axis(cpts_rows, gather_idx, axis=1)
    rsrtr = seq_segs_abs[:, 0]
    seq_segs = seq_segs_abs - rsrtr[:, None]

    d = jnp.diff(seq_segs, axis=1)                        # (B, L)
    base_valid = iot_L1[:, :L] < seq_lens[:, None]
    has_del = jnp.any((d == 0) & base_valid, axis=1)
    # wire format: seq_segs[0] is always 0 (rsrtr subtracted) and rows
    # are non-decreasing, so per-base uint8 deltas reconstruct the table
    # exactly; rows with any segment > 255 samples (rare long dwells /
    # stalls at the ~7-sample DNA median) raise seg_over and are
    # refetched in full from seq_segs, which stays device-resident
    seg_over = jnp.any(d > 255, axis=1)
    seg_d8 = d.astype(jnp.uint8)
    return seq_segs, seg_d8, seg_over, rsrtr, has_del


_TS_SAMPLE_CACHE: dict = {}


def _ts_sample_idx(n: int, max_n: int) -> np.ndarray:
    """Deterministic Theil-Sen subsample for a read with n > max_n points
    (same rng(0) policy as the host lane / reference
    tombo/tombo_stats.py:398-401); cached per (n, max_n)."""
    key = (n, max_n)
    out = _TS_SAMPLE_CACHE.get(key)
    if out is None:
        out = np.random.default_rng(0).choice(
            n, max_n, replace=False).astype(np.int32)
        _TS_SAMPLE_CACHE[key] = out
    return out


@functools.partial(jax.jit, static_argnames=("do_fit", "sampled",
                                             "shift_thresh", "scale_thresh"))
def _stage_fit(norm, rows, rsrtr, seq_segs, rm, rs, seq_lens, samp, tri,
               do_fit: bool, sampled: bool, shift_thresh: float,
               scale_thresh: float):
    """Device rescale fit, fused with the DP program: event means over
    the final segment table -> exact Theil-Sen -> scale/shift corrections
    + norm-params-changed mask + signal-match score.  Replaces the host
    finalize hot path (native Theil-Sen ~1 ms/read on a 4-core host;
    reference semantics: tombo/resquiggle.py:1122-1197 fitted rescaling +
    tombo/tombo_stats.py:2327-2339 score) for reads without deletion
    windows; only per-read scalars cross the link."""
    from ..ops import rescale
    L = seq_segs.shape[1] - 1
    norm_rows = jnp.take(norm, rows.astype(jnp.int32), axis=0)
    abs_segs = jnp.clip((rsrtr[:, None] + seq_segs).astype(jnp.int32),
                        0, norm.shape[1])
    sl32 = seq_lens.astype(jnp.int32)
    em = nrm.compute_base_means_batch(norm_rows, abs_segs, sl32)
    if sampled:
        gi = jnp.clip(samp.astype(jnp.int32), 0, L - 1)
        ev = jnp.take_along_axis(em, gi, axis=1)
        mod = jnp.take_along_axis(rm, gi, axis=1)
        n_pts = jnp.minimum(sl32, samp.shape[1])
    else:
        ev, mod, n_pts = em, rm, sl32
    dt = em.dtype
    if do_fit:
        # blocked selection: bounds the pair-key buffer and is ~wire-free;
        # the fused recompute variant is far slower at production batch
        # sizes (the 32 selection rounds re-divide 5e8 pairs each)
        slope, inter = rescale.theil_sen_device(ev, mod, n_pts, block=64,
                                                tri=tri)
        fit_ok = slope != 0
        safe = jnp.where(fit_ok, slope, 1.0)
        scale_corr = (1.0 / safe).astype(dt)
        shift_corr = (-inter / safe).astype(dt)
        em_s = (em - shift_corr[:, None]) / scale_corr[:, None]
        changed = ((jnp.abs(shift_corr) > shift_thresh) |
                   (jnp.abs(scale_corr - 1.0) > scale_thresh))
    else:
        shift_corr = jnp.zeros((em.shape[0],), dt)
        scale_corr = jnp.ones((em.shape[0],), dt)
        fit_ok = jnp.ones((em.shape[0],), jnp.bool_)
        changed = jnp.zeros((em.shape[0],), jnp.bool_)
        em_s = em
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < sl32[:, None]
    score = (jnp.sum(jnp.where(valid, jnp.abs((em_s - rm) / rs), 0.0),
                     axis=1) / jnp.maximum(sl32, 1))
    # em_s are the FINAL (rescaled) event means — identical (f32 ulp) to
    # the values the writeback recomputes; kept device-resident so a
    # following detection pass never re-uploads levels
    # (stats/device_levels.py)
    return shift_corr, scale_corr, score, changed, fit_ok, em_s


@functools.partial(jax.jit, static_argnames=(
    "nb_pad", "t_pad", "min_obs", "winsorize", "do_fit", "sampled",
    "shift_thresh", "scale_thresh"))
def _stage_delfix_fit(norm, rows, rsrtr, seq_segs, rm, rs, seq_lens,
                      win_i, win_bs, win_nb, win_t, win_sig_rel,
                      max_half_z, samp, tri, nb_pad: int, t_pad: int,
                      min_obs: int, winsorize: bool, do_fit: bool,
                      sampled: bool, shift_thresh: float,
                      scale_thresh: float):
    """Fused device deletion fix + rescale fit: gather per-window signal
    and expected levels from device-resident arrays, run the batched
    raw-signal window DP (ops/delfix.py; reference:
    tombo/resquiggle.py:402-545), scatter the recovered boundaries into
    the segment table, then run the device fit on the FIXED table — the
    ordering the reference mandates (fit after the raw-signal fix,
    tombo/resquiggle.py:1168-1195).  Only window metadata goes up and
    only boundaries + per-read fit scalars come back."""
    from ..ops import delfix
    win_i = win_i.astype(jnp.int32)
    win_bs = win_bs.astype(jnp.int32)
    rows_w = jnp.take(rows.astype(jnp.int32), win_i)
    sig_abs = jnp.take(rsrtr, win_i) + win_sig_rel.astype(jnp.int32)

    def slice_row(mat, row, start, width):
        padded = jnp.pad(mat, ((0, 0), (0, width)))
        return lax.dynamic_slice(padded[row], (start,), (width,))

    sig_w = jax.vmap(
        lambda r, s: slice_row(norm, r, s, t_pad))(rows_w, sig_abs)
    mu_w = jax.vmap(
        lambda r, s: slice_row(rm, r, s, nb_pad))(win_i, win_bs)
    sd_raw = jax.vmap(
        lambda r, s: slice_row(rs, r, s, nb_pad))(win_i, win_bs)
    # pad baselines: sd rows are zero past the matrix edge; make them 1
    # so the z-score division stays finite (those lanes are masked)
    jb = jnp.arange(nb_pad, dtype=jnp.int32)[None, :]
    sd_w = jnp.where(jb < win_nb[:, None], sd_raw, jnp.ones((), rs.dtype))
    bounds, fail = delfix.raw_windows_dp(
        sig_w, mu_w, sd_w, win_t, win_nb, max_half_z,
        min_obs=min_obs, nb_pad=nb_pad, winsorize=winsorize)

    # scatter boundaries back: resolved[ws+1+j] = bound_j + segs[ws]
    seg_base = seq_segs[win_i, win_bs]
    jcols = jnp.arange(nb_pad - 1, dtype=jnp.int32)[None, :]
    valid = jcols < (win_nb[:, None] - 1)
    cols = jnp.where(valid, win_bs[:, None] + 1 + jcols,
                     jnp.int32(seq_segs.shape[1] + 1))   # OOB -> dropped
    vals = (bounds + seg_base[:, None]).astype(seq_segs.dtype)
    seq_segs_fx = seq_segs.at[win_i[:, None], cols].set(vals, mode="drop")

    fit = _stage_fit(norm, rows, rsrtr, seq_segs_fx, rm, rs, seq_lens,
                     samp, tri, do_fit=do_fit, sampled=sampled,
                     shift_thresh=shift_thresh, scale_thresh=scale_thresh)
    return (bounds, fail) + fit


@functools.partial(jax.jit, static_argnames=("out_width",))
def _gather_clip_rows(em, rows, clips, out_width: int):
    """Gather per-read event-mean rows and left-clip each by ``clips``
    (device equivalent of ``event_means[events_start_clip:]``)."""
    em_rows = em[rows]
    em_pad = jnp.pad(em_rows, ((0, 0), (0, out_width)))

    def one(row, c):
        return lax.dynamic_slice(row, (c,), (out_width,))

    return jax.vmap(one)(em_pad, clips.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("width",))
def _gather_rows_pad(src, rows, width: int):
    """Row-gather a device matrix into a new row order, padding/cropping
    the lane axis to ``width``.  Used to re-batch device-resident
    changepoints for rescale passes without a fetch + re-upload round
    trip over the host link."""
    out = jnp.take(src, rows.astype(jnp.int32), axis=0)
    if out.shape[1] >= width:
        return out[:, :width]
    return jnp.pad(out, ((0, 0), (0, width - out.shape[1])))


def _lazy_cpts() -> bool:
    """Changepoints stay device-resident when the fused device finalize
    is on (its ctx["cpts"] input is the only hot consumer); the host copy
    is materialized per read on demand (static fallback, debug)."""
    return os.environ.get("TOMBO_TPU_DEV_FINALIZE", "1") == "1"


@jax.jit
def _levels_from_codes(mt, st, codes):
    """Gather per-base expected (mean, sd) rows from the on-chip k-mer
    model table.  ``codes`` is (B, L) int; the sentinel index (table
    length - 1) maps padding positions to (1.0, 1.0), matching the
    host-built padded level matrices bit for bit (gather commutes with
    the float cast)."""
    c = codes.astype(jnp.int32)
    return jnp.take(mt, c, axis=0), jnp.take(st, c, axis=0)


def _start_dp_pallas(em_rows, rm, rs, sp: dpo.StartDpParams):
    """Start-discovery DP via the fused Pallas kernel: the static band
    moving one event per base is the adaptive kernel's prefix phase with
    ``starts = arange`` covering every row and no masking."""
    from ..ops import pallas_dp as pdp
    B = em_rows.shape[0]
    nb, ne = sp.num_bases, sp.num_events
    need = nb + ne
    dpp = dpo.DpParams(
        z_shift=sp.z_shift, skip_pen=sp.skip_pen, stay_pen=sp.stay_pen,
        mask_fill_z_score=0.0, max_half_z_score=sp.max_half_z_score,
        bandwidth=ne)
    pstarts = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32)[None, :],
                               (B, nb))
    col0 = jnp.zeros((B,), jnp.int32)
    layout = pdp.plan_dp_layout(B, nb, em_rows.shape[1], ne)
    dp_fn = (pdp.adaptive_banded_dp_tb if layout[0] == "fused"
             else functools.partial(pdp.adaptive_banded_dp_tb_chunked,
                                    chunk_rows=layout[2]))
    segs, _band_err, _bound_err, _ffwd = dp_fn(
        em_rows, jnp.full((B,), need, jnp.int32), rm, rs,
        jnp.full((B,), nb, jnp.int32), pstarts, col0,
        jnp.full((B, nb), 2 ** 31 - 1, jnp.int32),
        jnp.full((B,), nb, jnp.int32), dpp, nb, nb, -1,
        block_reads=layout[1])
    return segs


def _start_dp_with_score(em_rows, rm, rs, sp: dpo.StartDpParams,
                         use_pallas: bool):
    """Start DP + device-side validity score
    (reference: tombo/tombo_stats.py:2341-2362 ``score_valid_bases``):
    mean half z-score over non-duplicated bases of the start traceback."""
    if use_pallas:
        segs = _start_dp_pallas(em_rows, rm, rs, sp)
    else:
        segs, top, final_score = dpo.start_band_dp(em_rows, rm, rs, sp)
    B = em_rows.shape[0]
    from ..ops.precision import seq_cumsum
    cs = jnp.concatenate(
        [jnp.zeros((B, 1), em_rows.dtype), seq_cumsum(em_rows, axis=1)],
        axis=1)
    s0 = segs[:, :-1]
    s1 = segs[:, 1:]
    lens = (s1 - s0).astype(em_rows.dtype)
    valid = s1 != s0
    bmeans = jnp.where(
        valid,
        (jnp.take_along_axis(cs, s1, axis=1) -
         jnp.take_along_axis(cs, s0, axis=1)) /
        jnp.where(valid, lens, 1.0), 0.0)
    half_z = jnp.abs((bmeans - rm) / rs)
    n_valid = jnp.sum(valid, axis=1)
    score = jnp.where(
        n_valid > 0,
        jnp.sum(jnp.where(valid, half_z, 0.0), axis=1) /
        jnp.maximum(n_valid, 1), jnp.inf)
    return segs, score, n_valid


@functools.partial(jax.jit, static_argnames=("sp", "use_pallas"))
def _stage_start_dp(em, rows, rm, rs, sp: dpo.StartDpParams,
                    use_pallas: bool = False):
    need = sp.num_bases + sp.num_events
    em_p = em[rows]
    if em_p.shape[1] < need:
        em_p = jnp.pad(em_p, ((0, 0), (0, need - em_p.shape[1])))
    return _start_dp_with_score(em_p[:, :need], rm, rs, sp, use_pallas)


@functools.partial(jax.jit, static_argnames=(
    "outlier_thresh", "w", "min_base_obs", "max_cpts", "sp", "use_pallas"))
def _stage_a_dna(raw, sig_lens, has_sv, sv_shift, sv_scale, sv_lower,
                 sv_upper, num_cpts, rm_start, rs_start,
                 outlier_thresh: float, w: int, min_base_obs: int,
                 max_cpts: int, sp: dpo.StartDpParams, use_pallas: bool):
    """DNA stages 1-3 in ONE device call: normalize -> scores -> greedy
    selection -> event means -> start-discovery DP + validity score.
    One host round trip instead of two; everything large stays on
    device."""
    norm, em, cpts, status, shift, scale, lower, upper = _stage1_dna(
        raw, sig_lens, has_sv, sv_shift, sv_scale, sv_lower, sv_upper,
        num_cpts, outlier_thresh, w, min_base_obs, max_cpts)
    need = sp.num_bases + sp.num_events
    em_p = em
    if em_p.shape[1] < need:
        em_p = jnp.pad(em_p, ((0, 0), (0, need - em_p.shape[1])))
    start_segs, start_score, _ = _start_dp_with_score(
        em_p[:, :need], rm_start, rs_start, sp, use_pallas)
    return (norm, em, cpts, status, shift, scale, lower, upper,
            start_segs, start_score)


_TS_BLOCK = 64


def _build_masked_plans_batch(live, p, mask_bases=None):
    """Batched ``pipeline.resquiggle.build_masked_start_plan``: the
    start-masked static band plan for every read in one set of matrix ops
    (bit-identical to the per-read numpy version, including np.linspace's
    ``r*step + start`` evaluation and endpoint fixup; reference semantics:
    tombo/resquiggle.py:607-677).

    Returns (pstarts (B, P_max), pvalid (B,), pend (B, P_max),
    start_rows (B,), P_max); callers must already have routed away reads
    with ``n_events - mapped_start_offset < bandwidth``."""
    from .resquiggle import MASK_BASES
    if mask_bases is None:
        mask_bases = MASK_BASES
    B = len(live)
    half_bw = p.bandwidth // 2
    n_ev = np.array([s.n_ev - s.events_start_clip for s in live], np.int64)
    mso = np.array([s.mapped_start_offset for s in live], np.int64)
    epb = np.array([s.events_per_base for s in live], np.float64)
    bes_pos = np.where(half_bw <= mso, 0, mso - half_bw)

    T = np.maximum(np.maximum(half_bw, mask_bases),
                   ((half_bw + 1) / epb).astype(np.int64)) + 1
    T_max = int(T.max())
    r = np.arange(T_max, dtype=np.float64)[None, :]
    # np.linspace(start, start + T*epb, T): y = r*step + start, y[-1]=stop
    delta = T * epb
    step = delta / (T - 1)
    y = r * step[:, None] + bes_pos[:, None].astype(np.float64)
    rows = np.arange(B)
    y[rows, T - 1] = bes_pos + delta
    bes = y.astype(np.int64)

    in_T = np.arange(T_max)[None, :] < T[:, None]
    first_hit = np.argmax((bes >= mso[:, None]) & in_T, axis=1)
    P = np.maximum(mask_bases, first_hit + 2)
    P_max = _round_up(int(P.max()), 64)

    # mask_start_pos = linspace(mso+1, bes[mask_bases-1]+bw, mask_bases)
    m_start = (mso + 1).astype(np.float64)
    m_stop = (bes[:, mask_bases - 1] + p.bandwidth).astype(np.float64)
    m_step = (m_stop - m_start) / (mask_bases - 1)
    rm_ = np.arange(mask_bases, dtype=np.float64)[None, :]
    msp = rm_ * m_step[:, None] + m_start[:, None]
    msp[:, -1] = m_stop
    msp = msp.astype(np.int64)

    if P_max > bes.shape[1]:
        bes = np.pad(bes, ((0, 0), (0, P_max - bes.shape[1])))
    pstarts = bes[:, :P_max].copy()
    colP = np.arange(P_max)[None, :]
    pad_col = colP >= P[:, None]
    # pad prefix rows with the last start (rows >= start_rows unused)
    np.copyto(pstarts, bes[rows, P - 1][:, None], where=pad_col)
    pend = np.broadcast_to(n_ev[:, None], (B, P_max)).copy()
    pend[:, :mask_bases] = np.minimum(msp, n_ev[:, None])
    np.copyto(pend, n_ev[:, None], where=pad_col)
    return pstarts, mso, pend, P, P_max


@jax.jit
def _theil_sen_jit(ev, mod, n_pts, tri):
    from ..ops import rescale
    return rescale.theil_sen_device(ev, mod, n_pts, tri=tri)


def _theil_sen_device_blocks(ev, mod, n_pts):
    """Device Theil-Sen over fixed-size read blocks.

    Blocks bound the (blk, N, N) pairwise-key buffer (~270 MB at blk=64,
    N=1024) and keep one compiled shape; all blocks dispatch async first
    so their transfers and selection rounds overlap."""
    B, N = ev.shape
    Bp = _round_up(B, _TS_BLOCK)
    evp = np.zeros((Bp, N), np.float32)
    modp = np.zeros((Bp, N), np.float32)
    npts = np.zeros(Bp, np.int32)
    evp[:B] = ev
    modp[:B] = mod
    npts[:B] = n_pts
    tri = rescale_ops.tri_indices(N)
    handles = [
        _theil_sen_jit(jnp.asarray(evp[b0:b0 + _TS_BLOCK]),
                       jnp.asarray(modp[b0:b0 + _TS_BLOCK]),
                       jnp.asarray(npts[b0:b0 + _TS_BLOCK]), tri)
        for b0 in range(0, Bp, _TS_BLOCK)]
    slopes = np.concatenate([np.asarray(h[0], np.float64)
                             for h in handles])[:B]
    inters = np.concatenate([np.asarray(h[1], np.float64)
                             for h in handles])[:B]
    return slopes, inters


class BatchedResquiggler:
    """Drive batches of mapped reads through the device kernels.

    Produces results identical to ``pipeline.resquiggle.resquiggle_read``
    (up to floating-point-tie co-optimal DP paths); cross-checked in
    tests/test_batch_parity.py.
    """

    def __init__(self, std_ref, rsqgl_params: ResquiggleParams,
                 seq_samp_type: SeqSampleType,
                 outlier_thresh: Optional[float] = config.OUTLIER_THRESH,
                 dtype=jnp.float32, mesh=None, const_scale=None,
                 skip_seq_scaling: bool = False):
        self.std_ref = std_ref
        self.params = rsqgl_params
        self.seq_samp_type = seq_samp_type
        self.outlier_thresh = outlier_thresh
        self.dtype = dtype
        # --fixed-scale / --fit-global-scale: one shared scale parameter,
        # per-read median shift (reference: tombo/tombo_stats.py:505-509
        # 'median_const_scale'); scale values are derived host-side and
        # flow through the provided-scale-values stage-A path
        self.const_scale = const_scale
        # --skip-sequence-rescaling (reference: tombo/resquiggle.py:1177)
        self.skip_seq_scaling = skip_seq_scaling
        self.save_params = rsqgl_params.replace(
            bandwidth=config.load_resquiggle_parameters(
                seq_samp_type.name, use_save_bandwidth=True).bandwidth)
        # multi-chip: batches shard data-parallel on the reads axis of the
        # mesh (parallel/mesh.py); the elementwise/scan stages partition
        # through plain jit and the Pallas DP runs under shard_map
        self.mesh = mesh
        self.n_dev = (1 if mesh is None
                      else int(np.prod(mesh.devices.shape)))
        if mesh is not None:
            from ..parallel.mesh import batch_sharding
            self._bsh = batch_sharding(mesh)
        self._levels_dev = None
        # observed deletion-window counters for the device-fit gate
        # (fit results are discarded for has_del reads; see
        # _dp_and_finalize)
        self._del_seen = 0
        self._del_total = 0

    def _fit_mostly_wasted(self) -> bool:
        """True once the observed has_del rate says the device fit's
        output would be discarded for most reads (the host lane re-fits
        after the raw-signal deletion fix).  Unknown (cold start) =
        False: the first batches probe with the fit on."""
        return (self._del_total >= 64 and
                self._del_seen * 2 > self._del_total)

    def _note_del_rate(self, has_del: np.ndarray):
        self._del_total += int(has_del.shape[0])
        self._del_seen += int(np.count_nonzero(has_del))
        if self._del_total > 1 << 16:       # keep the window recent
            self._del_total //= 2
            self._del_seen //= 2

    def _levels_tab(self):
        """Device copy of the k-mer model table (means, sds) with a
        sentinel row appended: index ``n_kmers`` maps padding positions
        to (1.0, 1.0), matching the ones-padded host level matrices."""
        if self._levels_dev is None:
            m = np.append(self.std_ref.means, 1.0).astype(self.dtype)
            s = np.append(self.std_ref.sds, 1.0).astype(self.dtype)
            self._levels_dev = (jnp.asarray(m), jnp.asarray(s))
        return self._levels_dev

    def _codes_rows(self, live, B: int, B_pad: int, width: int,
                    clip: bool = False):
        """Device (B, width) k-mer code matrix for a set of reads,
        sentinel-padded.  Wire format: 2-bit packed bases (4/byte) plus a
        per-read code count; the codes are derived on-chip
        (``_codes_from_packed``), 8x less link traffic than int16 code
        rows.  ``clip=True`` crops each row to ``width`` (start-discovery
        prefix rows; shorter reads become all-sentinel rows)."""
        n_sent = self.std_ref.means.shape[0]
        k = self.std_ref.kmer_width
        if all(s.packed_bases is not None and s.ref_codes is not None
               for s in live):
            PB = _round_up(width + k - 1, 4) // 4
            packed = np.zeros((B, PB), np.uint8)
            n_codes = np.zeros(B, np.int32)
            for i, s in enumerate(live):
                pb = s.packed_bases
                m = min(PB, pb.shape[0])
                packed[i, :m] = pb[:m]
                n_codes[i] = s.ref_codes.shape[0]
            return _codes_from_packed(
                self._up(packed, B_pad), self._up(n_codes, B_pad),
                width, k, n_sent, clip)
        # dense fallback (reads without host-mapped sequences)
        dt = np.int16 if n_sent < 2 ** 15 else np.int32
        ridx = np.full((B, width), n_sent, dt)
        for i, s in enumerate(live):
            c = s.ref_codes
            if c is None:
                continue
            if clip:
                if c.shape[0] >= width:
                    ridx[i] = c[:width]
            else:
                ridx[i, :c.shape[0]] = c
        return self._up(ridx, B_pad)

    def _b_pad(self, b: int) -> int:
        """Batch-axis bucket: a power-of-two shard of >= 8 reads per
        device (so every Pallas read-block is full), times the mesh
        size."""
        per = -(-b // self.n_dev)
        return self.n_dev * _pow2_bucket(per, 8)

    def _up(self, arr, b_pad: int):
        """Pad the batch axis and place on device(s): single-device
        ``jnp.asarray`` or batch-sharded ``device_put`` over the mesh."""
        arr = _pad_rows(np.asarray(arr), b_pad)
        if self.mesh is None:
            out = jnp.asarray(arr)
        else:
            out = jax.device_put(arr, self._bsh)
        if _profiling():
            TRANSFER_BYTES["upload"] += out.nbytes
        return out

    def _cpts_of(self, s: "_ReadState") -> np.ndarray:
        """Materialize a read's changepoints on host (one-row fetch from
        the device-resident matrix; cached)."""
        if s.cpts is None and s.cpts_dev is not None:
            arr, row, n = s.cpts_dev
            s.cpts = _fetch_row(arr[row]).astype(np.int64)[:n]
        return s.cpts

    def _pallas_in_jit(self) -> bool:
        """Pallas kernels embedded in plain jitted stages (stage A start
        DP) only partition trivially; with a real mesh the scan engine is
        used there and Pallas runs only under shard_map (main DP)."""
        return _use_pallas() and self.n_dev == 1

    # ------------------------------------------------------- stage drivers
    @_timed_stage("segment")
    def _segment_batch(self, states: List[_ReadState]):
        """Stages 1-3: normalize, changepoint-select, event means."""
        p = self.params
        live = [s for s in states if s.error is None]
        if not live:
            return
        B = len(live)
        B_pad = self._b_pad(B)
        sig_lens = np.array([s.raw.shape[0] for s in live], np.int64)
        reuse_raw = (all(s.raw_dev is not None for s in live) and
                     len({id(s.raw_dev[0]) for s in live}) == 1)
        if reuse_raw:
            # rescale pass: the padded raw matrix from the first pass is
            # still on device — row-gather it in place (keeping the source
            # width, so the compiled stage shapes are reused) instead of
            # re-uploading megabytes of signal
            src = live[0].raw_dev[0]
            rows_prev = np.array([s.raw_dev[1] for s in live], np.int32)
            raw_j = _gather_rows_pad(src, self._up(rows_prev, B_pad),
                                     src.shape[1])
            for i, s in enumerate(live):
                s.dev_row = i
        else:
            S_max = _sig_bucket(max(s.raw.shape[0] for s in live))
            # raw FAST5 signal is int16 DAC values; uploading them as
            # int16 halves the dominant host->device transfer (values
            # convert to the compute dtype on device, exactly for
            # |x| < 2^15).  The per-read integrality check is cached in
            # raw_i16 at state creation, so this fills the half-width
            # buffer directly with no full-matrix scan or float64 staging
            # pass.
            if (all(s.raw_i16 is not None for s in live) and
                    self.mesh is None and _delta_wire()):
                # int8-delta ragged wire format: one delta byte per
                # sample + a sparse escape list; exact reconstruction by
                # integer cumsum on device (see _unflatten_delta_rows)
                with _sub("seg_pack"):
                    total = int(sig_lens.sum())
                    flat8 = np.zeros(_geo_bucket(total), np.int8)
                    d8_lens = np.maximum(sig_lens - 1, 0)
                    offs = np.zeros(B, np.int64)
                    np.cumsum(d8_lens[:-1], out=offs[1:])
                    from .. import native as _nat
                    raws = [np.ascontiguousarray(s.raw_i16) for s in live]
                    nat_out = _nat.pack_delta8_batch(
                        raws, sig_lens, flat8, offs)
                    if nat_out is not None:
                        # threaded native pass: diff+clip+escape extraction
                        # in one sweep (was ~0.25 ms/read of numpy loops)
                        firsts, exc_rd, exc_pos, eres_np = nat_out
                        for i, s in enumerate(live):
                            s.dev_row = i
                        n_exc = exc_rd.shape[0]
                        E_b = _geo_bucket(max(n_exc, 1), lo=1 << 10)
                        exc_dest = np.zeros(E_b, np.int32)
                        exc_res = np.zeros(E_b, np.int32)
                        if n_exc:
                            exc_dest[:n_exc] = (exc_pos + 1 +
                                                exc_rd * S_max)
                            exc_res[:n_exc] = eres_np
                    else:
                        firsts = np.zeros(B, np.int16)
                        exc_dest_l, exc_res_l = [], []
                        for i, s in enumerate(live):
                            first, d8, epos, eres = s.delta8()
                            o = offs[i]
                            flat8[o:o + d8.shape[0]] = d8
                            firsts[i] = first
                            if epos.shape[0]:
                                exc_dest_l.append(epos + 1 + i * S_max)
                                exc_res_l.append(eres)
                            s.dev_row = i
                        n_exc = sum(e.shape[0] for e in exc_dest_l)
                        E_b = _geo_bucket(max(n_exc, 1), lo=1 << 10)
                        exc_dest = np.zeros(E_b, np.int32)
                        exc_res = np.zeros(E_b, np.int32)
                        if n_exc:
                            exc_dest[:n_exc] = np.concatenate(exc_dest_l)
                            exc_res[:n_exc] = np.concatenate(exc_res_l)
                    offs = offs.astype(np.int32)
                with _sub("seg_upload"):
                    flat_j = jnp.asarray(flat8)
                    exc_d_j = jnp.asarray(exc_dest)
                    exc_r_j = jnp.asarray(exc_res)
                    if _profiling():
                        TRANSFER_BYTES["upload"] += (
                            flat_j.nbytes + exc_d_j.nbytes + exc_r_j.nbytes)
                    raw_j = _unflatten_delta_rows(
                        flat_j, self._up(offs, B_pad),
                        self._up(sig_lens.astype(np.int32), B_pad),
                        self._up(firsts, B_pad), exc_d_j, exc_r_j, S_max)
            elif (all(s.raw_i16 is not None for s in live) and
                    self.mesh is None):
                # ragged wire format: ship only the real samples as one
                # flat buffer (geometric-bucket padded) and scatter into
                # the padded (B, S) matrix on device — removes the
                # per-read padding waste from the dominant transfer
                total = int(sig_lens.sum())
                flat = np.zeros(_geo_bucket(total), np.int16)
                offs = np.zeros(B, np.int32)
                o = 0
                for i, s in enumerate(live):
                    n = s.raw_i16.shape[0]
                    flat[o:o + n] = s.raw_i16
                    offs[i] = o
                    o += n
                    s.dev_row = i
                flat_j = jnp.asarray(flat)
                if _profiling():
                    TRANSFER_BYTES["upload"] += flat_j.nbytes
                raw_j = _unflatten_rows(
                    flat_j, self._up(offs, B_pad),
                    self._up(sig_lens.astype(np.int32), B_pad), S_max)
            elif all(s.raw_i16 is not None for s in live):
                # mesh ragged wire format: one flat buffer PER SHARD
                # (row of a (D, F) batch-sharded matrix); each device
                # scatters only its own reads, host ships only real
                # samples.  Pad rows replicate read 0 (as _pad_rows), so
                # shards holding pad rows carry one shared copy of
                # read 0's signal.
                D = self.n_dev
                R = B_pad // D
                row_read = list(range(B)) + [0] * (B_pad - B)
                offs = np.zeros(B_pad, np.int32)
                lens_pad = np.zeros(B_pad, np.int32)
                plans = []
                for d in range(D):
                    uniq = {}
                    tot = 0
                    for r in range(d * R, (d + 1) * R):
                        ri = row_read[r]
                        if ri not in uniq:
                            uniq[ri] = tot
                            tot += live[ri].raw_i16.shape[0]
                    plans.append((uniq, tot))
                F = _geo_bucket(max(t for _, t in plans))
                flat2 = np.zeros((D, F), np.int16)
                for d, (uniq, _) in enumerate(plans):
                    for ri, off in uniq.items():
                        r16 = live[ri].raw_i16
                        flat2[d, off:off + r16.shape[0]] = r16
                    for r in range(d * R, (d + 1) * R):
                        ri = row_read[r]
                        offs[r] = plans[d][0][ri]
                        lens_pad[r] = live[ri].raw_i16.shape[0]
                for i, s in enumerate(live):
                    s.dev_row = i
                flat_j = jax.device_put(flat2, self._bsh)
                offs_j = jax.device_put(offs, self._bsh)
                lens2_j = jax.device_put(lens_pad, self._bsh)
                if _profiling():
                    TRANSFER_BYTES["upload"] += (
                        flat_j.nbytes + offs_j.nbytes + lens2_j.nbytes)
                raw_j = _unflatten_rows_sharded(
                    self.mesh, flat_j, offs_j, lens2_j, S_max)
            else:
                raw_pad = np.zeros((B, S_max), self.dtype)
                for i, s in enumerate(live):
                    raw_pad[i, :s.raw.shape[0]] = s.raw
                    s.dev_row = i
                raw_j = self._up(raw_pad, B_pad)
        for i, s in enumerate(live):
            s.raw_dev = (raw_j, i)
        lens_j = self._up(sig_lens, B_pad)

        w = p.running_stat_width
        num_cpts = np.array([s.num_events for s in live], np.int64)
        max_cpts = _pow2_bucket(int(num_cpts.max()), 256)
        ncpts_j = self._up(num_cpts, B_pad)

        # rescale iterations: every read carries scale values and its
        # first-pass changepoints; selection is skipped entirely.  The
        # greedy selection is invariant under the affine re-normalization
        # only in exact arithmetic — per-sample rounding perturbs score
        # ratios at the ulp level — so the float64 oracle-parity mode
        # always re-selects, matching the single-read path op for op
        # (tests/test_parity_exact.py); the f32 production lane keeps the
        # shortcut under its documented co-optimal-tie policy.
        if (self.dtype != jnp.float64 and
                all(s.map_res.scale_values is not None and
                    (s.cpts is not None or s.cpts_dev is not None)
                    for s in live)):
            return self._segment_rescale(live, raw_j, lens_j, B, B_pad,
                                         max_cpts)

        if p.use_t_test_seg:
            # RNA: scores -> selection -> stall removal -> event-based
            # scaling -> normalization -> event means -> start DP, all in
            # one fused device call (reference flow:
            # tombo/resquiggle.py:1057-1120 RNA branches)
            has_sv = np.array(
                [s.map_res.scale_values is not None for s in live])
            sv_shift = np.zeros(B); sv_scale = np.ones(B)
            sv_lower = np.full(B, np.nan)
            sv_upper = np.full(B, np.nan)
            K = max([1] + [len(s.map_res.stall_ints) for s in live
                           if s.map_res.stall_ints is not None])
            K = _round_up(K, 8)
            stall_s = np.zeros((B, K), np.int64)
            stall_e = np.zeros((B, K), np.int64)
            nb = p.start_n_bases
            for i, s in enumerate(live):
                sv = s.map_res.scale_values
                if sv is not None:
                    sv_shift[i], sv_scale[i] = sv.shift, sv.scale
                    if sv.lower_lim is not None:
                        sv_lower[i] = sv.lower_lim
                    if sv.upper_lim is not None:
                        sv_upper[i] = sv.upper_lim
                if s.map_res.stall_ints is not None:
                    for k, (st, en) in enumerate(s.map_res.stall_ints):
                        stall_s[i, k], stall_e[i, k] = st, en
            mtab, stab = self._levels_tab()
            rm_sj, rs_sj = _levels_from_codes(
                mtab, stab, self._codes_rows(live, B, B_pad, nb, clip=True))
            sp = dpo.StartDpParams(
                z_shift=p.z_shift, skip_pen=p.skip_pen,
                stay_pen=p.stay_pen,
                max_half_z_score=p.max_half_z_score or -1.0,
                num_bases=nb, num_events=p.start_bw)
            (norm_j, em_j, cpts_j, n_cpts_j, status_j, shift, scale,
             lower, upper, start_segs_j, start_score_j) = _stage_a_rna(
                raw_j, lens_j, self._up(has_sv, B_pad),
                self._up(sv_shift.astype(self.dtype), B_pad),
                self._up(sv_scale.astype(self.dtype), B_pad),
                self._up(sv_lower.astype(self.dtype), B_pad),
                self._up(sv_upper.astype(self.dtype), B_pad),
                ncpts_j, self._up(stall_s, B_pad),
                self._up(stall_e, B_pad),
                rm_sj,
                rs_sj,
                (None if self.outlier_thresh is None
                 else float(self.outlier_thresh)), w, p.min_obs_per_base,
                max_cpts, sp, self._pallas_in_jit(), config.USE_RNA_EVENT_SCALE,
                config.RNA_SCALE_NUM_EVENTS,
                float(config.RNA_SCALE_MAX_FRAC_EVENTS))
            lazy = _lazy_cpts()
            if lazy:
                (n_cpts, status, shift, scale, lower, upper,
                 start_s0, start_sN, start_score) = _fetch(
                    n_cpts_j, status_j, shift, scale, lower, upper,
                    start_segs_j[:, 0], start_segs_j[:, -1], start_score_j)
                cpts_np = None
            else:
                (cpts_np, n_cpts, status, shift, scale, lower, upper,
                 start_s0, start_sN, start_score) = _fetch(
                    cpts_j, n_cpts_j, status_j, shift, scale, lower, upper,
                    start_segs_j[:, 0], start_segs_j[:, -1], start_score_j)
                cpts_np = cpts_np.astype(np.int64)[:B]
            n_cpts = n_cpts[:B]
            status = status[:B]
            shift = shift[:B]; scale = scale[:B]
            lower = lower[:B]; upper = upper[:B]
            for i, s in enumerate(live):
                if status[i] != 0:
                    s.error = "Fewer changepoints found than requested"
                    continue
                if lazy:
                    s.cpts = None
                    s.cpts_dev = (cpts_j, i, int(n_cpts[i]))
                else:
                    s.cpts = cpts_np[i, :n_cpts[i]]
                    s.cpts_dev = None
                s.n_ev = int(n_cpts[i]) - 1
                s.norm = None          # recomputed host-side on demand
                s.event_means = None
                s.scale_values = ScaleValues(
                    float(shift[i]), float(scale[i]),
                    None if np.isnan(lower[i]) else float(lower[i]),
                    None if np.isnan(upper[i]) else float(upper[i]),
                    None)
                # stall removal may have dropped below the adaptive-DP
                # minimum: route to the static fallback
                if s.n_ev < p.start_bw + p.start_n_bases:
                    s.use_static = True
            return {"em": em_j, "norm": norm_j, "cpts": cpts_j,
                    "start": (start_s0.astype(np.int64)[:B],
                              start_sN.astype(np.int64)[:B],
                              start_score.astype(np.float64)[:B])}
        else:
            # DNA: stages 1-3 (normalize -> select -> event means -> start
            # DP + validity score) run in one fused device call; only the
            # changepoints, scale scalars and start results come back
            has_sv = np.array(
                [s.map_res.scale_values is not None for s in live])
            sv_shift = np.zeros(B); sv_scale = np.ones(B)
            sv_lower = np.full(B, -nrm.POS_LARGE)
            sv_upper = np.full(B, nrm.POS_LARGE)
            nb = p.start_n_bases
            for i, s in enumerate(live):
                sv = s.map_res.scale_values
                if sv is not None:
                    sv_shift[i], sv_scale[i] = sv.shift, sv.scale
                    if sv.lower_lim is not None:
                        sv_lower[i] = sv.lower_lim
                    if sv.upper_lim is not None:
                        sv_upper[i] = sv.upper_lim
            mt, st = self._levels_tab()
            rm_sj, rs_sj = _levels_from_codes(
                mt, st, self._codes_rows(live, B, B_pad, nb, clip=True))
            sp = dpo.StartDpParams(
                z_shift=p.z_shift, skip_pen=p.skip_pen,
                stay_pen=p.stay_pen,
                max_half_z_score=p.max_half_z_score or -1.0,
                num_bases=nb, num_events=p.start_bw)
            (norm_j, em_j, cpts_j, status_j, shift, scale, lower, upper,
             start_segs_j, start_score_j) = _stage_a_dna(
                raw_j, lens_j, self._up(has_sv, B_pad),
                self._up(sv_shift.astype(self.dtype), B_pad),
                self._up(sv_scale.astype(self.dtype), B_pad),
                self._up(sv_lower.astype(self.dtype), B_pad),
                self._up(sv_upper.astype(self.dtype), B_pad),
                ncpts_j,
                rm_sj,
                rs_sj,
                (None if self.outlier_thresh is None
                 else float(self.outlier_thresh)), w, p.min_obs_per_base,
                max_cpts, sp, self._pallas_in_jit())
            lazy = _lazy_cpts()
            if lazy:
                # the (B, max_cpts) changepoint matrix never leaves the
                # device: the fused finalize reads ctx["cpts"] on-chip and
                # rescale passes row-gather it in place
                if self.dtype != jnp.float64:
                    (status, shift, scale, lower, upper, start_s0,
                     start_sN, start_score) = _fetch_packed_f32(
                        status_j, shift, scale, lower, upper,
                        start_segs_j[:, 0], start_segs_j[:, -1],
                        start_score_j)
                else:
                    (status, shift, scale, lower, upper, start_s0,
                     start_sN, start_score) = _fetch(
                        status_j, shift, scale, lower, upper,
                        start_segs_j[:, 0], start_segs_j[:, -1],
                        start_score_j)
                cpts_np = None
            else:
                (cpts_np, status, shift, scale, lower, upper, start_s0,
                 start_sN, start_score) = _fetch(
                    cpts_j, status_j, shift, scale, lower, upper,
                    start_segs_j[:, 0], start_segs_j[:, -1], start_score_j)
                cpts_np = cpts_np.astype(np.int64)[:B]
            status = status[:B]
            shift = shift[:B]; scale = scale[:B]
            lower = lower[:B]; upper = upper[:B]
            for i, s in enumerate(live):
                if status[i] != 0:
                    s.error = "Fewer changepoints found than requested"
                    continue
                if lazy:
                    s.cpts = None
                    s.cpts_dev = (cpts_j, i, s.num_events)
                else:
                    s.cpts = cpts_np[i, :s.num_events]
                    s.cpts_dev = None
                s.n_ev = s.num_events - 1
                s.norm = None          # recomputed host-side on demand
                s.event_means = None
                prev_sv = s.map_res.scale_values
                s.scale_values = ScaleValues(
                    float(shift[i]), float(scale[i]), float(lower[i]),
                    float(upper[i]),
                    prev_sv.outlier_thresh if prev_sv is not None
                    else self.outlier_thresh)
            return {"em": em_j, "norm": norm_j, "cpts": cpts_j,
                    "start": (start_s0.astype(np.int64)[:B],
                              start_sN.astype(np.int64)[:B],
                              start_score.astype(np.float64)[:B])}
        return {"em": em_j}

    def _segment_rescale(self, live, raw_j, lens_j, B, B_pad, max_cpts):
        """Rescale-pass segmentation: reuse first-pass changepoints (the
        greedy selection is invariant under affine re-normalization) and
        only re-normalize + recompute event means + start discovery."""
        p = self.params
        nb = p.start_n_bases
        # changepoints stay on device when every live read references the
        # same device matrix: re-batch by row gather instead of paying a
        # fetch + re-upload of ~4 MB over the host link per rescale pass
        dev_srcs = {id(s.cpts_dev[0]) for s in live
                    if s.cpts_dev is not None}
        use_dev = (len(dev_srcs) == 1 and
                   all(s.cpts_dev is not None for s in live))
        if use_dev:
            n_cpts = np.array([s.cpts_dev[2] for s in live], np.int64)
            max_n = _pow2_bucket(int(n_cpts.max()), 256)
        else:
            n_cpts = np.array([self._cpts_of(s).shape[0] for s in live],
                              np.int64)
            max_n = _pow2_bucket(int(n_cpts.max()), 256)
            cpts = np.zeros((B, max_n), np.int64)
            for i, s in enumerate(live):
                cpts[i, :n_cpts[i]] = s.cpts
        sv_shift = np.zeros(B); sv_scale = np.ones(B)
        sv_lower = np.full(B, np.nan)
        sv_upper = np.full(B, np.nan)
        for i, s in enumerate(live):
            sv = s.map_res.scale_values
            sv_shift[i], sv_scale[i] = sv.shift, sv.scale
            if sv.lower_lim is not None:
                sv_lower[i] = sv.lower_lim
            if sv.upper_lim is not None:
                sv_upper[i] = sv.upper_lim
        mtab, stab = self._levels_tab()
        rm_sj, rs_sj = _levels_from_codes(
            mtab, stab, self._codes_rows(live, B, B_pad, nb, clip=True))
        sp = dpo.StartDpParams(
            z_shift=p.z_shift, skip_pen=p.skip_pen, stay_pen=p.stay_pen,
            max_half_z_score=p.max_half_z_score or -1.0,
            num_bases=nb, num_events=p.start_bw)
        if use_dev:
            rows_prev = np.array([s.cpts_dev[1] for s in live], np.int32)
            cpts_j = _gather_rows_pad(
                live[0].cpts_dev[0], self._up(rows_prev, B_pad), max_n)
        else:
            cpts_j = self._up(cpts, B_pad)
        norm_j, em_j, start_segs_j, start_score_j = _stage_a_rescale(
            raw_j, lens_j,
            self._up(sv_shift.astype(self.dtype), B_pad),
            self._up(sv_scale.astype(self.dtype), B_pad),
            self._up(sv_lower.astype(self.dtype), B_pad),
            self._up(sv_upper.astype(self.dtype), B_pad),
            cpts_j,
            self._up(n_cpts, B_pad),
            rm_sj,
            rs_sj,
            sp, self._pallas_in_jit())
        # this path only runs on the f32 lane (see caller's dtype gate)
        start_s0, start_sN, start_score = _fetch_packed_f32(
            start_segs_j[:, 0], start_segs_j[:, -1], start_score_j)
        for i, s in enumerate(live):
            s.n_ev = int(n_cpts[i]) - 1
            if use_dev:
                s.cpts_dev = (cpts_j, i, int(n_cpts[i]))
            s.norm = None
            s.event_means = None
            sv = s.map_res.scale_values
            s.scale_values = sv.replace()
        return {"em": em_j, "norm": norm_j, "cpts": cpts_j,
                "start": (start_s0.astype(np.int64)[:B],
                          start_sN.astype(np.int64)[:B],
                          start_score.astype(np.float64)[:B])}

    @_timed_stage("plan")
    def _plan_reads(self, states: List[_ReadState]):
        """Expected levels + start discovery routing.

        K-mer codes, packed bases and level rows for the whole batch are
        derived in a handful of matrix ops (one (B, Lmax) code matrix;
        the per-read python loop over ~1k-element arrays was a measured
        hot spot of the host critical path)."""
        p = self.params
        std_ref = self.std_ref
        k = std_ref.kmer_width
        dnstrm = k - std_ref.central_pos - 1
        fresh = [s for s in states
                 if s.error is None and s.ref_codes is None]
        if fresh:
            enc = [encode_seq(s.map_res.genome_seq) for s in fresh]
            lens = np.array([e.shape[0] for e in enc], np.int64)
            W = int(lens.max())
            bases = np.zeros((len(fresh), W), np.int8)
            for i, e in enumerate(enc):
                bases[i, :e.shape[0]] = e
            n_codes = lens - k + 1
            nW = W - k + 1
            codes_m = np.zeros((len(fresh), nW), np.int64)
            valid_m = np.ones((len(fresh), nW), bool)
            for j in range(k):
                win = bases[:, j:j + nW]
                codes_m = codes_m * 4 + np.maximum(win, 0)
                valid_m &= win >= 0
            col = np.arange(nW)[None, :]
            in_len = col < n_codes[:, None]
            bad_read = np.any(~valid_m & in_len, axis=1)
            codes_m[~valid_m] = -1
            means_m = std_ref.means[np.maximum(codes_m, 0)]
            sds_m = std_ref.sds[np.maximum(codes_m, 0)]
            # batched 2-bit base packing (zero-fill past each read's end,
            # matching _pack_bases)
            W4 = _round_up(W, 4)
            b4 = np.zeros((len(fresh), W4), np.uint8)
            np.copyto(b4[:, :W], bases, casting="unsafe",
                      where=np.arange(W)[None, :] < lens[:, None])
            b4 = b4.reshape(len(fresh), -1, 4)
            packed_m = (b4[:, :, 0] | (b4[:, :, 1] << 2) |
                        (b4[:, :, 2] << 4) | (b4[:, :, 3] << 6))
            for i, s in enumerate(fresh):
                if bad_read[i] or n_codes[i] <= 0:
                    s.error = ("Invalid sequence encountered from genome "
                               "sequence.")
                    continue
                n = n_codes[i]
                s.ref_codes = codes_m[i, :n]
                s.packed_bases = packed_m[i, :_round_up(int(lens[i]), 4)
                                          // 4]
                s.ref_means = means_m[i, :n]
                s.ref_sds = sds_m[i, :n]
                s.genome_seq_trim = s.map_res.genome_seq[
                    std_ref.central_pos:-dnstrm]
        for s in states:
            if s.error is not None:
                continue
            r_means = s.ref_means
            if len(s.genome_seq_trim) != r_means.shape[0]:
                s.error = "Discordant reference and sequence lengths."
                continue
            if (s.n_ev < p.start_bw + p.start_n_bases or
                    r_means.shape[0] < p.start_n_bases):
                s.use_static = True

    @_timed_stage("start")
    def _start_discovery(self, states: List[_ReadState], ctx,
                         start_bw: int, check_score: bool,
                         precomputed=None):
        """Batched static-band start discovery + validity score (device).

        Event means never leave the device: the stage-1 rows are gathered
        on-chip, and the reference's host-side ``score_valid_bases`` check
        is folded into the same jitted call.  When the fused stage-A call
        already produced start results (``precomputed``), no further
        device round trip happens here."""
        p = self.params
        live = [s for s in states if s.error is None and not s.use_static]
        if not live:
            return []
        nb = p.start_n_bases
        ne = start_bw
        need = nb + ne
        if precomputed is not None:
            rows = [s.dev_row for s in live]
            seg0 = precomputed[0][rows]
            segN = precomputed[1][rows]
            score = precomputed[2][rows]
        else:
            if ctx["em"].shape[1] < need:
                # every live read has >= need events (else use_static), but
                # the batch-wide padded width can still be smaller
                for s in live:
                    s.use_static = True
                return []
            B = len(live)
            B_pad = self._b_pad(B)
            rows = np.array([s.dev_row for s in live], np.int32)
            mtab, stab = self._levels_tab()
            rm_sj, rs_sj = _levels_from_codes(
                mtab, stab, self._codes_rows(live, B, B_pad, nb, clip=True))
            sp = dpo.StartDpParams(
                z_shift=p.z_shift, skip_pen=p.skip_pen, stay_pen=p.stay_pen,
                max_half_z_score=p.max_half_z_score or -1.0,
                num_bases=nb, num_events=ne)
            segs, score, n_valid = _stage_start_dp(
                ctx["em"], self._up(rows, B_pad),
                rm_sj,
                rs_sj,
                sp, use_pallas=self._pallas_in_jit())
            # only the first and last traceback columns are ever consumed
            # (mapped start + events-per-base slope), so only those cross
            # the link
            seg0, segN, score = _fetch(segs[:, 0], segs[:, -1], score)
            seg0 = seg0.astype(np.int64)[:B]
            segN = segN.astype(np.int64)[:B]
            score = score.astype(np.float64)[:B]

        failed = []
        thresh = SIG_MATCH_THRESH[self.seq_samp_type.name]
        for i, s in enumerate(live):
            if check_score and (not np.isfinite(score[i]) or
                                score[i] > thresh):
                # "Poor raw to expected signal matching in beginning of
                # read." / "Invalid path through read start"
                failed.append(s)
                continue
            s.events_per_base = (segN[i] - seg0[i]) / (nb + 1)
            s.mapped_start = int(seg0[i])
        return failed

    @_timed_stage("adaptive")
    def _adaptive_batch(self, states: List[_ReadState], ctx):
        """Stage 5: masked-start prefix + adaptive DP + traceback."""
        p = self.params
        live = []
        for s in states:
            if s.error is not None or s.use_static:
                continue
            if s.events_per_base == 0:
                s.error = ("Very poor signal quality. Read likely includes "
                           "open pore.")
                continue
            half_bw = p.bandwidth // 2
            if s.mapped_start < half_bw:
                s.events_start_clip = 0
                s.mapped_start_offset = s.mapped_start
            else:
                s.events_start_clip = s.mapped_start - half_bw
                s.mapped_start_offset = half_bw
            if (int((half_bw + 1) / s.events_per_base) >=
                    s.ref_means.shape[0] or
                    s.n_ev - s.mapped_start_offset -
                    s.events_start_clip < p.bandwidth):
                s.use_static = True
                continue
            if (s.n_ev - s.events_start_clip - s.mapped_start_offset <
                    p.bandwidth):
                # the only failure mode of build_masked_start_plan
                s.error = ("Read sequence to signal matching starts too "
                           "far into events for full adaptive assignment")
                continue
            live.append(s)
        if not live:
            return

        # bound the chunked path's HBM move buffer (B_pad * L * bwp int8)
        # by slicing very-long-read batches; each slice is a full device
        # call with its own tight L bucket
        bw = p.bandwidth
        bwp = _round_up(bw, 128)
        L_all = _pow2_bucket(max(s.ref_means.shape[0] for s in live), 256)
        max_b = max(8, int(1.5e9 // (L_all * bwp)))
        if len(live) > max_b:
            live.sort(key=lambda s: s.ref_means.shape[0])
            for i in range(0, len(live), max_b):
                self._adaptive_device_call(live[i:i + max_b], ctx)
            return
        self._adaptive_device_call(live, ctx)

    def _adaptive_device_call(self, live: List[_ReadState], ctx):
        p = self.params
        bw = p.bandwidth
        L_max = _pow2_bucket(max(s.ref_means.shape[0] for s in live), 256)
        E_max = _pow2_bucket(
            max(s.n_ev - s.events_start_clip for s in live) + bw, 256)
        B = len(live)
        B_pad = self._b_pad(B)

        rows = np.array([s.dev_row for s in live], np.int32)
        clips = np.array([s.events_start_clip for s in live], np.int64)
        n_events = np.array([s.n_ev - s.events_start_clip for s in live],
                            np.int64)
        seq_lens = np.array([s.ref_means.shape[0] for s in live], np.int64)
        # start-masked band plans for the whole batch in one matrix pass
        pstarts64, pvalid, pend64, start_rows, P_max = \
            _build_masked_plans_batch(live, p)
        # band-plan wire format: pend values are event indices < n_events
        # (uint16 when every read's event count fits; int32 fallback for
        # ultra-long reads); pstarts are small signed offsets (they can be
        # negative by up to half a bandwidth at the read start) shipped as
        # int16 when in range — 4x less wire than int64 either way.
        # Prefix rows >= start_rows[i] are never consumed by any DP engine
        # (is_prefix = r < start_rows), so pad fill values only need to be
        # in-range.
        max_nev = int(n_events.max())
        ps_lo = int(pstarts64.min())
        ps_hi = int(pstarts64.max())
        ps_dt = (np.int16 if -2 ** 15 <= ps_lo and ps_hi < 2 ** 15
                 else np.int32)
        pe_dt = np.uint16 if max_nev < 2 ** 16 else np.int32
        pstarts = pstarts64.astype(ps_dt)
        pend = pend64.astype(pe_dt)

        # event means gathered + left-clipped on device from stage 1
        rows_j = self._up(rows, B_pad)
        clips_j = self._up(clips, B_pad)
        em_j = _gather_clip_rows(ctx["em"], rows_j, clips_j, E_max)

        dpp = dpo.DpParams(
            z_shift=p.z_shift, skip_pen=p.skip_pen, stay_pen=p.stay_pen,
            mask_fill_z_score=MASK_FILL_Z_SCORE,
            max_half_z_score=p.max_half_z_score or -1.0, bandwidth=bw)
        seq_lens_j = self._up(seq_lens, B_pad)
        # expected levels never cross the link: ship (B, L) int16 k-mer
        # codes and gather (mean, sd) rows from the on-chip model table
        mt, st = self._levels_tab()
        rm_j, rs_j = _levels_from_codes(
            mt, st, self._codes_rows(live, B, B_pad, L_max))
        dp_args = (
            em_j,
            self._up(n_events, B_pad),
            rm_j,
            rs_j,
            seq_lens_j, self._up(pstarts, B_pad),
            self._up(pvalid, B_pad),
            self._up(pend, B_pad),
            self._up(start_rows, B_pad))
        use_pallas = _use_pallas() and not _PALLAS_BROKEN[0]
        try:
            self._dp_and_finalize(live, ctx, dp_args, rows_j, clips_j,
                                  seq_lens_j, dpp, L_max, P_max, E_max, B,
                                  B_pad, use_pallas)
        except (TomboTpuError, KeyboardInterrupt):
            raise
        except Exception as e:  # noqa: BLE001 — lowering/runtime failures
            if not use_pallas:
                raise
            # The fused Pallas kernel failed to lower or execute on this
            # backend (e.g. a Mosaic rejection of a new layout).  Fall
            # back to the lax.scan engine permanently for this process so
            # production runs and bench degrade instead of dying.
            _PALLAS_BROKEN[0] = True
            print("WARNING: Pallas DP kernel failed (%s: %s); falling "
                  "back to the XLA scan engine for this process."
                  % (type(e).__name__, str(e)[:200]), file=sys.stderr)
            for s in live:
                s.dp_segs = None
                s.error = None
            self._dp_and_finalize(live, ctx, dp_args, rows_j, clips_j,
                                  seq_lens_j, dpp, L_max, P_max, E_max, B,
                                  B_pad, False)

    def _dp_and_finalize(self, live, ctx, dp_args, rows_j, clips_j,
                         seq_lens_j, dpp, L_max, P_max, E_max, B, B_pad,
                         use_pallas):
        p = self.params
        bw = p.bandwidth
        if use_pallas:
            from ..ops import pallas_dp as pdp
            # VMEM-budgeted layout: whole-matrix fused kernel when the
            # (r_blk, L, bwp) move scratch fits, sequence-axis-chunked
            # kernels otherwise (long reads / save-bandwidth lane)
            layout = pdp.plan_dp_layout(B_pad // self.n_dev, L_max, E_max,
                                        bw)
            if self.n_dev > 1:
                # batch shards data-parallel over the mesh; each device
                # runs the kernel on its own read shard under shard_map
                segs_j, band_err, bound_err, _ = \
                    pdp.adaptive_banded_dp_tb_sharded(
                        self.mesh, "reads", dp_args, dpp, L_max, P_max,
                        p.band_bound_thresh, layout)
            elif layout[0] == "fused":
                segs_j, band_err, bound_err, _ = pdp.adaptive_banded_dp_tb(
                    *dp_args, dpp, L_max, P_max, p.band_bound_thresh,
                    block_reads=layout[1])
            else:
                segs_j, band_err, bound_err, _ = \
                    pdp.adaptive_banded_dp_tb_chunked(
                        *dp_args, dpp, L_max, P_max, p.band_bound_thresh,
                        block_reads=layout[1], chunk_rows=layout[2])
        else:
            tb, band_starts, final_fwd, band_err = dpo.adaptive_banded_dp(
                *dp_args, dpp, L_max, P_max)
            top = jnp.argmax(final_fwd, axis=1).astype(jnp.int32)
            segs_j, bound_err = dpo.banded_traceback(
                tb, band_starts, seq_lens_j, top,
                p.band_bound_thresh, bw, L_max)
        use_dev_fin = (ctx.get("cpts") is not None and
                       os.environ.get("TOMBO_TPU_DEV_FINALIZE", "1") == "1")
        if use_dev_fin:
            # fused device finalize: traceback trim + raw coordinates +
            # per-read deletion flag in the same device program; only the
            # (B, L) int16 segment deltas and per-read scalars come back
            # (the int32 table is reconstructed by exact host cumsum;
            # rare overflow rows refetch from the device-resident table)
            (seq_segs_j, seg_d8_j, seg_over_j, rsrtr_j,
             has_del_j) = _stage_finalize(
                ctx["cpts"], rows_j, clips_j, segs_j, seq_lens_j,
                dp_args[1], n_rows=L_max)
            # fused device fit: event means + exact Theil-Sen + score +
            # changed mask on device.  The reference fits AFTER the
            # raw-signal deletion fix (tombo/resquiggle.py:1168-1195), so
            # with the device deletion fix available (ops/delfix.py) the
            # fit runs in a SECOND dispatch on the fixed segment table
            # and serves every read; without it (f64 oracle mode, mesh,
            # TOMBO_TPU_DEV_DELFIX=0) the fit rides this dispatch but is
            # consumed only by no-deletion reads, gated by the observed
            # has_del rate (TOMBO_TPU_DEV_FIT=0/1 forces it off/on).
            fit_env = os.environ.get("TOMBO_TPU_DEV_FIT", "")
            use_dev_delfix = (
                self.dtype != jnp.float64 and self.mesh is None and
                ctx.get("norm") is not None and fit_env != "0" and
                os.environ.get("TOMBO_TPU_DEV_DELFIX", "1") == "1")
            use_dev_fit = (
                not use_dev_delfix and
                self.dtype != jnp.float64 and
                ctx.get("norm") is not None and fit_env != "0" and
                (fit_env == "1" or not self._fit_mostly_wasted()))
            if use_dev_fit:
                # fused rescale fit: event means + Theil-Sen + score +
                # changed mask on device (host lane kept for deletion-fix
                # reads and the f64 oracle mode)
                max_n = config.MAX_POINTS_FOR_THEIL_SEN
                # subsample only when some read actually exceeds the cap
                # (reference: tombo/tombo_stats.py:398-401); L_max alone
                # over-triggers (bucketed 1024 > 1000 for ~1000-base
                # reads) and costs a (B, 1000) int32 upload per batch
                sampled = any(s.ref_means.shape[0] > max_n for s in live)
                if sampled:
                    samp_np = np.zeros((B, max_n), np.int32)
                    for i, s in enumerate(live):
                        n = s.ref_means.shape[0]
                        if n > max_n:
                            samp_np[i] = _ts_sample_idx(n, max_n)
                        else:
                            samp_np[i, :n] = np.arange(n, dtype=np.int32)
                    samp_j = self._up(samp_np, B_pad)
                else:
                    samp_j = jnp.zeros((1, 1), jnp.int32)
                # pair-index vectors enter as runtime args (device-cached):
                # baked-in multi-MB HLO constants slow compilation badly
                tri_j = rescale_ops.tri_indices(max_n if sampled else L_max)
                (shc_j, scc_j, fscore_j, fchanged_j, fok_j,
                 _em_unused) = _stage_fit(
                    ctx["norm"], rows_j, rsrtr_j, seq_segs_j, dp_args[2],
                    dp_args[3], seq_lens_j, samp_j, tri_j,
                    do_fit=not self.skip_seq_scaling, sampled=sampled,
                    shift_thresh=float(config.SHIFT_CHANGE_THRESH),
                    scale_thresh=float(config.SCALE_CHANGE_THRESH))
            pack_ok = (self.dtype != jnp.float64 and
                       max(s.raw.shape[0] for s in live) < 2 ** 24)
            if use_dev_fit:
                if pack_ok:
                    pk = jnp.stack([a.astype(jnp.float32) for a in (
                        band_err, bound_err, seg_over_j, rsrtr_j,
                        has_del_j, shc_j, scc_j, fscore_j, fchanged_j,
                        fok_j)])
                    seg_d8, pk = _fetch(seg_d8_j, pk)
                    (band_err, bound_err, seg_over, rsrtr_np, has_del,
                     f_shc, f_scc, f_score, f_changed, f_ok) = pk
                else:
                    (band_err, bound_err, seg_d8, seg_over, rsrtr_np,
                     has_del, f_shc, f_scc, f_score, f_changed,
                     f_ok) = _fetch(
                        band_err, bound_err, seg_d8_j, seg_over_j,
                        rsrtr_j, has_del_j, shc_j, scc_j, fscore_j,
                        fchanged_j, fok_j)
            elif pack_ok:
                pk = jnp.stack([a.astype(jnp.float32) for a in (
                    band_err, bound_err, seg_over_j, rsrtr_j,
                    has_del_j)])
                seg_d8, pk = _fetch(seg_d8_j, pk)
                band_err, bound_err, seg_over, rsrtr_np, has_del = pk
            else:
                (band_err, bound_err, seg_d8, seg_over, rsrtr_np,
                 has_del) = _fetch(band_err, bound_err, seg_d8_j,
                                   seg_over_j, rsrtr_j, has_del_j)
            self._note_del_rate(has_del[:B])
            seq_segs_np = np.zeros((B, L_max + 1), np.int64)
            np.cumsum(seg_d8[:B].astype(np.int64), axis=1,
                      out=seq_segs_np[:, 1:])
            for i in np.flatnonzero(seg_over[:B]):
                seq_segs_np[i] = _fetch_row(seq_segs_j[i]).astype(np.int64)
            rsrtr_np = rsrtr_np[:B]
            has_del = has_del[:B]
        else:
            segs_np, band_err, bound_err = _fetch(
                segs_j, band_err, bound_err)
            segs_np = segs_np.astype(np.int64)[:B]
        band_err = band_err[:B]
        bound_err = bound_err[:B]

        for i, s in enumerate(live):
            if band_err[i]:
                s.error = ("Adaptive signal to sequence alignment extended "
                           "beyond raw signal")
                continue
            if bound_err[i]:
                s.error = ("Read event to sequence alignment extends beyond "
                           "bandwidth")
                continue
            L = s.ref_means.shape[0]
            if use_dev_fin:
                s.dp_segs = seq_segs_np[i, :L + 1]
                s.dp_rsrtr = int(rsrtr_np[i])
                s.has_del = bool(has_del[i])
                if use_dev_fit and not s.has_del:
                    s._dev_fit = (float(f_shc[i]), float(f_scc[i]),
                                  float(f_score[i]), bool(f_changed[i]),
                                  bool(f_ok[i]))
                continue
            read_tb = segs_np[i, :L + 1].copy()
            read_tb = rsq._trim_traceback(
                read_tb, events_len=s.n_ev - s.events_start_clip)
            seq_segs, rsrtr = rsq.get_rel_raw_coords(
                self._cpts_of(s)[s.events_start_clip:], read_tb)
            s.dp_segs = seq_segs
            s.dp_rsrtr = rsrtr

        if use_dev_fin and use_dev_delfix:
            self._delfix_and_fit(
                live, ctx, rows_j, rsrtr_j, seq_segs_j, dp_args[2],
                dp_args[3], seq_lens_j, B, B_pad)

    def _delfix_and_fit(self, live, ctx, rows_j, rsrtr_j, seq_segs_j,
                        rm_j, rs_j, seq_lens_j, B, B_pad):
        """Second device dispatch of the adaptive stage: batched raw-
        signal deletion fix + rescale fit on the FIXED segment table
        (reference ordering: tombo/resquiggle.py:1168-1195).  Windows are
        planned host-side from the fetched segment tables (cheap integer
        scans); reads whose windows exceed the device buckets route to
        the host native finalize lane unchanged."""
        import types as _pytypes
        p = self.params
        win_i, win_bs, win_nb, win_t, win_rel = [], [], [], [], []
        fit_reads = []
        w = rsq.DEL_FIX_WINDOW
        min_sig_per_base = p.raw_min_obs_per_base * rsq.EXTRA_SIG_FACTOR
        with _sub("delfix_plan"):
            for i, s in enumerate(live):
                if (s.error is not None or s.use_static or
                        not hasattr(s, "dp_segs")):
                    continue
                if not s.has_del:
                    fit_reads.append(s)
                    continue
                segs = s.dp_segs
                # vectorized fast path of plan_del_fix_windows: clusters
                # of deletions with gaps > 2w+1 map one-to-one to merged
                # windows, and a window is final unless too small (DNA
                # dwell ~7 samples/base vs a min-obs budget of ~1.1
                # samples/base makes expansion vanishingly rare) —
                # anything else falls back to the exact host planner
                dels = np.flatnonzero(np.diff(segs) == 0)
                if dels.size == 0:
                    s.has_del = False
                    fit_reads.append(s)
                    continue
                # extend the open window while del_pos < prev_del + 2w+1
                # (reference merge rule), i.e. cluster-break at gap > 2w
                brk = np.flatnonzero(np.diff(dels) > 2 * w) + 1
                first = dels[np.concatenate([[0], brk])]
                last = dels[np.concatenate([brk - 1, [dels.shape[0] - 1]])]
                ws_arr = np.maximum(first - w, 0)
                we_arr = np.minimum(last + w + 1, segs.shape[0] - 1)
                n_ev = we_arr - ws_arr
                sig_len = segs[we_arr] - segs[ws_arr]
                if np.any(sig_len <= (n_ev + 1) * min_sig_per_base):
                    # possible expansion: exact (loop) planner
                    try:
                        windows = rsq.plan_del_fix_windows(
                            _pytypes.SimpleNamespace(segs=segs), p)
                    except TomboTpuError as e:
                        s.error = str(e)
                        continue
                    if not windows:
                        s.has_del = False
                        fit_reads.append(s)
                        continue
                    ws_arr = np.array([a for a, _ in windows])
                    we_arr = np.array([b for _, b in windows])
                    n_ev = we_arr - ws_arr
                    sig_len = segs[we_arr] - segs[ws_arr]
                if (n_ev.max() > _DELFIX_NB_CAP or
                        sig_len.max() > _DELFIX_T_CAP):
                    s._host_fin = True      # host native finalize lane
                    continue
                s._del_windows = (list(zip(ws_arr.tolist(),
                                           we_arr.tolist())),
                                  len(win_i))
                win_i.extend([i] * ws_arr.shape[0])
                win_bs.extend(ws_arr.tolist())
                win_nb.extend(n_ev.tolist())
                win_t.extend(sig_len.tolist())
                win_rel.extend(segs[ws_arr].tolist())
                fit_reads.append(s)
        if not fit_reads:
            return
        NW = len(win_i)

        max_n = config.MAX_POINTS_FOR_THEIL_SEN
        sampled = any(s.ref_means.shape[0] > max_n for s in live)
        if sampled:
            samp_np = np.zeros((B, max_n), np.int32)
            for i, s in enumerate(live):
                n = s.ref_means.shape[0]
                if n > max_n:
                    samp_np[i] = _ts_sample_idx(n, max_n)
                else:
                    samp_np[i, :n] = np.arange(n, dtype=np.int32)
            samp_j = self._up(samp_np, B_pad)
        else:
            samp_j = jnp.zeros((1, 1), jnp.int32)
        L_max = seq_segs_j.shape[1] - 1
        tri_j = rescale_ops.tri_indices(max_n if sampled else L_max)

        # one fat default shape: batches flip-flopping between buckets
        # cost a compilation-cache reload (~0.3 s) per flip over the
        # tunnel, far more than the padded lanes cost to compute
        nb_pad = (16 if max(win_nb or [2]) <= 16 else _DELFIX_NB_CAP)
        t_pad = (256 if max(win_t or [2]) <= 256 else _DELFIX_T_CAP)
        # coarse window-count buckets: each (NW_pad, nb_pad, t_pad) combo
        # compiles its own program (~20-40 s cold over the tunnel), and
        # padded windows cost ~nothing, so favor few fat shapes
        NW_pad = _pow2_bucket(max(NW, 1), 512)
        wi = np.zeros(NW_pad, np.int32)
        wbs = np.zeros(NW_pad, np.int32)
        wnb = np.zeros(NW_pad, np.int32)
        wt = np.full(NW_pad, 2, np.int32)
        wrel = np.zeros(NW_pad, np.int32)
        wi[:NW] = win_i
        wbs[:NW] = win_bs
        wnb[:NW] = win_nb
        wt[:NW] = win_t
        wrel[:NW] = win_rel
        up = (jnp.asarray(wi), jnp.asarray(wbs), jnp.asarray(wnb),
              jnp.asarray(wt), jnp.asarray(wrel))
        if _profiling():
            TRANSFER_BYTES["upload"] += sum(a.nbytes for a in up)
        mhz = p.max_half_z_score
        (bounds_j, fail_j, shc_j, scc_j, fscore_j, fchanged_j, fok_j,
         em_j) = _stage_delfix_fit(
            ctx["norm"], rows_j, rsrtr_j, seq_segs_j, rm_j, rs_j,
            seq_lens_j, *up, float(mhz if mhz is not None else 0.0),
            samp_j, tri_j, nb_pad=nb_pad, t_pad=t_pad,
            min_obs=p.raw_min_obs_per_base, winsorize=mhz is not None,
            do_fit=not self.skip_seq_scaling, sampled=sampled,
            shift_thresh=float(config.SHIFT_CHANGE_THRESH),
            scale_thresh=float(config.SCALE_CHANGE_THRESH))
        pk = jnp.stack([a.astype(jnp.float32) for a in (
            shc_j, scc_j, fscore_j, fchanged_j, fok_j)])
        bounds, fail, pk = _fetch(
            bounds_j.astype(jnp.int16), fail_j, pk)
        f_shc, f_scc, f_score, f_changed, f_ok = pk

        with _sub("delfix_apply"):
            for s in fit_reads:
                dw = getattr(s, "_del_windows", None)
                if dw is not None:
                    windows, w0 = dw
                    segs = s.dp_segs
                    ok = True
                    for k, (ws, we) in enumerate(windows):
                        if fail[w0 + k]:
                            s.error = ("Raw-signal traceback failed to "
                                       "find boundary")
                            ok = False
                            break
                        segs[ws + 1:we] = (
                            bounds[w0 + k, :we - ws - 1].astype(np.int64)
                            + segs[ws])
                    if not ok:
                        continue
                    # reference validity checks
                    # (tombo/resquiggle.py:470-500 via apply_del_fix)
                    if np.diff(segs).min() < 1:
                        s.error = ("New segments include zero length "
                                   "events")
                        continue
                    if segs[0] < 0:
                        s.error = "New segments start with negative index"
                        continue
                    s.del_fixed = True
            # fit scalars: indexed by live position
            fit_ids = {id(s) for s in fit_reads}
            lvl_entries = []
            for i, s in enumerate(live):
                if (s.error is None and id(s) in fit_ids and
                        (s.has_del is False or
                         getattr(s, "del_fixed", False))):
                    s._dev_fit = (float(f_shc[i]), float(f_scc[i]),
                                  float(f_score[i]), bool(f_changed[i]),
                                  bool(f_ok[i]))
                    if f_ok[i]:
                        rid = (s.map_res.align_info.read_id
                               if s.map_res.align_info else "")
                        lvl_entries.append((rid, i,
                                            s.ref_means.shape[0]))
            if lvl_entries:
                from ..stats import device_levels
                device_levels.register_batch(em_j, lvl_entries)

    @_timed_stage("static")
    def _static_reads(self, states: List[_ReadState], ctx):
        """Short-read static-band fallback (host; rare)."""
        need = [s for s in states
                if s.error is None and s.use_static and
                s.event_means is None and ctx is not None and
                "em" in ctx]
        if need:
            # ONE gathered fetch for every static read's event means —
            # a per-read row fetch costs a full link round trip each
            # (mixed-length batches route ~10% of reads here)
            rows = np.array([s.dev_row for s in need], np.int32)
            (em_rows,) = _fetch(jnp.take(ctx["em"], jnp.asarray(rows),
                                         axis=0))
            for s, row in zip(need, em_rows):
                s.event_means = row.astype(np.float64)[:s.n_ev]
        for s in states:
            if s.error is not None or not s.use_static:
                continue
            if s.event_means is None:
                # rare path: pull this read's event means from the device
                s.event_means = _fetch_row(
                    ctx["em"][s.dev_row]).astype(np.float64)[:s.n_ev]
            try:
                seq_events = rsq.find_static_base_assignment(
                    s.event_means, s.ref_means, s.ref_sds, self.params)
                seq_segs, rsrtr = rsq.get_rel_raw_coords(
                    self._cpts_of(s), seq_events)
                s.dp_segs = seq_segs
                s.dp_rsrtr = rsrtr
            except TomboTpuError as e:
                s.error = str(e)

    @_timed_stage("finalize")
    def _finalize(self, states: List[_ReadState], skip_seq_scaling=False,
                  will_retry: bool = False):
        """Stage 6: deletion fix, rescale, score (host).

        On the f32 production lane most reads arrive already fitted by the
        fused device finalize (``_stage_fit``: event means + exact
        Theil-Sen + score + changed mask on device) and only need scalar
        bookkeeping plus normalized-signal materialization here.  The host
        lane below remains for deletion-fix reads, the f64 oracle mode and
        the static fallback; its Theil-Sen (O(n^2/2) pair slopes per read,
        n<=1000; reference: tombo/_c_helper.pyx:362,
        tombo/tombo_stats.py:370) is batched into one threaded native
        call.  ``will_retry`` marks passes that will be followed by
        another scaling iteration: reads whose norm params changed skip
        normalized-signal materialization (their result is re-computed
        next pass anyway)."""
        from ..types import DpResults
        from .. import native as native_mod
        from ..native import (DEL_FIX_ERRORS, FIT_FAILED_STATUS,
                              del_fix_batch, finalize_batch,
                              theil_sen_batch)

        # fused native finalize (f32 production lane): normalize + del
        # fix + event means + Theil-Sen + rescale application run in ONE
        # threaded C++ call (csrc ``finalize_batch``), leaving python
        # with scalar bookkeeping only.  The per-read python
        # normalize/means/assign loop was the largest host cost of the
        # whole lane (~0.6 ms/read).  The f64 oracle mode keeps the
        # python path below, op for op.
        use_native_fin = (
            self.dtype != jnp.float64 and
            os.environ.get("TOMBO_TPU_NATIVE_FINALIZE", "1") == "1" and
            native_mod.get_lib() is not None and
            hasattr(native_mod.get_lib(), "finalize_batch"))

        # pass A: deletion fix.  The device finalize already flagged reads
        # with zero-length segments (has_del); clean reads skip the fix
        # entirely, and all flagged reads run through ONE threaded native
        # call that does window planning + raw-signal DP + apply in C++
        # (the per-read python plan/build/apply loop was ~1 ms/read of
        # pure interpreter overhead on the host lane).
        pending = []
        del_jobs = []
        dev_fitted = []
        native_reads = []
        for s in states:
            if s.error is not None or s.result is not None:
                continue
            if not hasattr(s, "dp_segs"):
                s.error = s.error or "DP did not produce a path"
                continue
            dev_fit = getattr(s, "_dev_fit", None)
            if dev_fit is not None and (s.has_del is False or
                                        getattr(s, "del_fixed", False)):
                # fitted on device; defer all O(signal) host work to
                # assembly (pass C)
                s._dp_res = DpResults(
                    s.dp_rsrtr, s.dp_segs, s.ref_means, s.ref_sds,
                    s.genome_seq_trim)
                s._segs = s.dp_segs
                s._norm_signal = None
                dev_fitted.append(s)
                continue
            if use_native_fin:
                s._dp_res = DpResults(
                    s.dp_rsrtr, s.dp_segs, s.ref_means, s.ref_sds,
                    s.genome_seq_trim)
                native_reads.append(s)
                continue
            try:
                dp_res = DpResults(
                    s.dp_rsrtr, s.dp_segs, s.ref_means, s.ref_sds,
                    s.genome_seq_trim)
                if s.norm is None:
                    # the normalized signal never left the device; rebuild
                    # it host-side in float64 from the raw signal + scale
                    # values (identical formula to the device stage).
                    # Only the mapped slice is ever used downstream, and
                    # normalization is elementwise, so normalize just that
                    # slice (bitwise identical to slicing afterwards).
                    norm_signal = self._host_norm(
                        s, dp_res.read_start_rel_to_raw,
                        dp_res.read_start_rel_to_raw + int(dp_res.segs[-1]))
                else:
                    norm_signal = s.norm[
                        dp_res.read_start_rel_to_raw:
                        dp_res.read_start_rel_to_raw + dp_res.segs[-1]]
                s._dp_res = dp_res
                s._norm_signal = norm_signal
                if s.has_del is False:
                    s._segs = dp_res.segs
                else:
                    s._segs = None
                    del_jobs.append(s)
                pending.append(s)
            except TomboTpuError as e:
                s.error = str(e)

        if del_jobs:
            with _sub("finalize_native"):
                native_out = del_fix_batch(
                    [(s._norm_signal, s._dp_res.ref_means,
                      s._dp_res.ref_sds, s._dp_res.segs)
                     for s in del_jobs], self.params)
            if native_out is None:
                for s in del_jobs:
                    try:
                        s._segs = rsq.resolve_skipped_bases_with_raw(
                            s._dp_res, s._norm_signal, self.params)
                    except TomboTpuError as e:
                        s.error = str(e)
            else:
                for s, segs, st in zip(del_jobs, *native_out):
                    if st == 0:
                        s._segs = segs
                    else:
                        s.error = DEL_FIX_ERRORS.get(
                            int(st), "deletion fix failed")
            pending = [s for s in pending if s.error is None]

        if native_reads:
            max_n = config.MAX_POINTS_FOR_THEIL_SEN
            jobs = []
            for s in native_reads:
                sv = s.scale_values
                rsrtr = s.dp_rsrtr
                raw_slice = s.raw[rsrtr:rsrtr + int(s.dp_segs[-1])]
                L = s.ref_means.shape[0]
                samp = _ts_sample_idx(L, max_n) if L > max_n else None
                hd = (1 if s.has_del else
                      (0 if s.has_del is False else -1))
                jobs.append((raw_slice, sv.shift, sv.scale, sv.lower_lim,
                             sv.upper_lim, s._dp_res.ref_means,
                             s._dp_res.ref_sds, np.array(s.dp_segs),
                             hd, samp))
            ts_mode = -1 if skip_seq_scaling else 1
            with _sub("finalize_native"):
                nat = finalize_batch(jobs, self.params, ts_mode)
            (segs_l, ev_l, norm_l, slopes, inters, statuses) = nat
            for i, s in enumerate(native_reads):
                st = int(statuses[i])
                if st == FIT_FAILED_STATUS:
                    s.error = ("Read failed sequence-based signal "
                               "re-scaling parameter estimation.")
                    continue
                if st != 0:
                    s.error = DEL_FIX_ERRORS.get(st, "deletion fix failed")
                    continue
                s._segs = segs_l[i]
                s._norm_signal = norm_l[i]
                s._ev_means_pre = ev_l[i]
                if skip_seq_scaling:
                    s._norm_params_changed = False
                    continue
                slope, inter = float(slopes[i]), float(inters[i])
                scale_corr = 1.0 / slope
                shift_corr = -inter / slope
                sv = s.scale_values
                s.scale_values = sv.replace(
                    shift=sv.shift + shift_corr * sv.scale,
                    scale=sv.scale * scale_corr,
                    outlier_thresh=self.outlier_thresh)
                s._score_corr = (shift_corr, scale_corr)
                s._norm_params_changed = (
                    abs(shift_corr) > config.SHIFT_CHANGE_THRESH or
                    abs(scale_corr - 1) > config.SCALE_CHANGE_THRESH)

        # pass B: batched Theil-Sen rescale.  On the f32 production lane
        # the exact bitwise-selection fit runs on device (ops/rescale.py)
        # — on a 4-core host the O(n^2/2) pair median is the single
        # largest finalize cost (~1 ms/read); the f64 oracle-parity mode
        # keeps the host native path (bitwise-identical to the single-read
        # estimator).
        if pending and not skip_seq_scaling:
            max_n = config.MAX_POINTS_FOR_THEIL_SEN
            B = len(pending)
            ev = np.zeros((B, max_n), np.float64)
            mod = np.zeros((B, max_n), np.float64)
            n_pts = np.zeros(B, np.int64)
            for i, s in enumerate(pending):
                r_ev = ref_impl.new_means(s._norm_signal, s._segs)
                if self.dtype != jnp.float64:
                    # the rescale is affine, so the pass-C score means are
                    # derivable from these pre-rescale means without a
                    # second O(signal) sweep (f32 lane only: mean-of-
                    # transformed vs transformed-mean differ at ulp level)
                    s._ev_means_pre = r_ev
                r_mod = s._dp_res.ref_means
                n = r_mod.shape[0]
                if n > max_n:
                    samp = np.random.default_rng(0).choice(
                        n, max_n, replace=False)
                    r_ev, r_mod, n = r_ev[samp], r_mod[samp], max_n
                ev[i, :n] = r_ev
                mod[i, :n] = r_mod
                n_pts[i] = n
            # measured on-chip: the ~300 ms device fit stalls the device
            # lane (which pipelining keeps on the critical path) and loses
            # to the 4-core threaded native fit (~250 ms, overlapped);
            # TOMBO_TPU_DEV_TS=1 re-enables it for hosts with fewer cores
            if (self.dtype != jnp.float64 and self.mesh is None and
                    B >= 32 and
                    os.environ.get("TOMBO_TPU_DEV_TS", "0") == "1"):
                slopes, inters = _theil_sen_device_blocks(ev, mod, n_pts)
            else:
                slopes, inters = theil_sen_batch(
                    ev, mod, n_pts, use_f32=self.dtype != jnp.float64)
            for s, slope, inter in zip(pending, slopes, inters):
                if slope == 0:
                    s.error = ("Read failed sequence-based signal re-scaling "
                               "parameter estimation.")
                    continue
                scale_corr = 1.0 / slope
                shift_corr = -inter / slope
                sv = s.scale_values
                s.scale_values = sv.replace(
                    shift=sv.shift + shift_corr * sv.scale,
                    scale=sv.scale * scale_corr,
                    outlier_thresh=self.outlier_thresh)
                s._norm_signal = (s._norm_signal - shift_corr) / scale_corr
                s._score_corr = (shift_corr, scale_corr)
                s._norm_params_changed = (
                    abs(shift_corr) > config.SHIFT_CHANGE_THRESH or
                    abs(scale_corr - 1) > config.SCALE_CHANGE_THRESH)
        else:
            for s in pending:
                s._norm_params_changed = False

        # pass B': apply the device fit (scalar bookkeeping only)
        for s in dev_fitted:
            shc, scc, score, changed, fit_ok = s._dev_fit
            s._dev_score = score
            if skip_seq_scaling:
                s._norm_params_changed = False
                s._score_corr = None
                continue
            if not fit_ok:
                s.error = ("Read failed sequence-based signal re-scaling "
                           "parameter estimation.")
                continue
            sv = s.scale_values
            s._sv_pre = sv
            s.scale_values = sv.replace(
                shift=sv.shift + shc * sv.scale,
                scale=sv.scale * scc,
                outlier_thresh=self.outlier_thresh)
            s._score_corr = (shc, scc)
            s._norm_params_changed = changed

        # pass C: score + assemble results
        for s in pending + native_reads + dev_fitted:
            if s.error is not None:
                continue
            try:
                dp_res, segs = s._dp_res, s._segs
                if s._norm_signal is None:
                    # device-fitted read: materialize the normalized
                    # mapped slice only now (and not at all for reads
                    # that the next scaling iteration recomputes anyway).
                    # Two steps exactly as the host lane: normalize+clip
                    # with the pre-fit scale values, then apply the
                    # fitted correction.
                    if will_retry and s._norm_params_changed:
                        norm_signal = None
                    else:
                        start = dp_res.read_start_rel_to_raw
                        end = start + int(segs[-1])
                        svp = getattr(s, "_sv_pre", s.scale_values)
                        norm_signal = (s.raw[start:end] - svp.shift) \
                            / svp.scale
                        if (svp.lower_lim is not None and
                                svp.upper_lim is not None and
                                np.isfinite(svp.lower_lim) and
                                np.isfinite(svp.upper_lim)):
                            norm_signal = np.clip(
                                norm_signal, svp.lower_lim, svp.upper_lim)
                        corr = getattr(s, "_score_corr", None)
                        if corr is not None:
                            norm_signal = (norm_signal - corr[0]) / corr[1]
                else:
                    norm_signal = s._norm_signal
                if hasattr(s, "_dev_score"):
                    sig_match_score = s._dev_score
                else:
                    ev_pre = getattr(s, "_ev_means_pre", None)
                    if (ev_pre is not None and
                            ev_pre.shape[0] == segs.shape[0] - 1):
                        corr = getattr(s, "_score_corr", None)
                        score_means = ((ev_pre - corr[0]) / corr[1]
                                       if corr is not None else ev_pre)
                    else:
                        score_means = ref_impl.new_means(norm_signal, segs)
                    sig_match_score = rsq.get_read_seg_score(
                        score_means, dp_res.ref_means, dp_res.ref_sds)
                if segs.shape[0] != len(dp_res.genome_seq) + 1:
                    raise TomboTpuError(
                        "Aligned sequence does not match number of segments "
                        "produced")
                s.result = s.map_res.replace(
                    read_start_rel_to_raw=dp_res.read_start_rel_to_raw,
                    segs=segs, genome_seq=dp_res.genome_seq,
                    raw_signal=norm_signal, scale_values=s.scale_values,
                    sig_match_score=sig_match_score,
                    norm_params_changed=s._norm_params_changed)
            except TomboTpuError as e:
                s.error = str(e)

        # host-lane and failed reads must not leave stale device-cached
        # means behind: stats/device_levels.py serves detection and
        # estimation, and a surviving entry from an earlier pass would
        # no longer match what writeback records
        if self.dtype != jnp.float64:
            from ..stats import device_levels as _dl
            for s in states:
                if ((s.error is not None or
                     not hasattr(s, "_dev_score")) and
                        s.map_res.align_info is not None):
                    _dl.unregister(s.map_res.align_info.read_id)

    def _host_norm(self, s: _ReadState, start: int = 0,
                   end: Optional[int] = None) -> np.ndarray:
        """Recompute the normalized signal in float64 from raw + scale
        values (the device keeps its own copy; shipping (B, S) floats over
        the host link costs far more than recomputing them).  ``start``/
        ``end`` normalize only that raw slice."""
        sv = s.scale_values
        raw = s.raw if end is None else s.raw[start:end]
        norm = (raw - sv.shift) / sv.scale
        if (sv.lower_lim is not None and sv.upper_lim is not None and
                np.isfinite(sv.lower_lim) and np.isfinite(sv.upper_lim)):
            norm = np.clip(norm, sv.lower_lim, sv.upper_lim)
        return norm

    # ------------------------------------------------------------ run API
    def _run_pass(self, states: List[_ReadState],
                  will_retry: bool = False):
        for s in states:
            if s.error is None:
                s.n_ev = s.num_events - 1
        live = [s for s in states if s.error is None]
        for group in _length_groups(live):
            self._run_pass_group(group, will_retry)

    def _run_pass_group(self, states: List[_ReadState],
                        will_retry: bool = False):
        # planning first (expected levels need only the mapped sequence);
        # segmentation + start discovery then fuse into one device call.
        # RNA stall removal can shrink the event count below the adaptive
        # minimum after the fact; those reads are re-routed to the static
        # fallback inside _segment_batch.
        self._plan_reads(states)
        ctx = self._segment_batch(states)
        if ctx is not None:
            failed_start = self._start_discovery(
                states, ctx, self.params.start_bw, check_score=True,
                precomputed=ctx.get("start"))
            # save-bandwidth start retry without score check
            # (reference: tombo/resquiggle.py:996-1006)
            for s in failed_start:
                if (s.n_ev <
                        self.params.start_save_bw +
                        self.params.start_n_bases):
                    s.use_static = True
            retry = [s for s in failed_start if not s.use_static]
            if retry:
                still_failed = self._start_discovery(
                    retry, ctx, self.params.start_save_bw,
                    check_score=False)
                for s in still_failed:
                    s.error = "Read start discovery failed"
            self._adaptive_batch(states, ctx)
            self._static_reads(states, ctx)
        self._finalize(states, skip_seq_scaling=self.skip_seq_scaling,
                       will_retry=will_retry)

    def resquiggle_batches(self, batches, pipeline_depth: int = 3,
                           max_scaling_iters: int =
                           config.MAX_SCALING_ITERS):
        """Process an iterable of mapped-read batches through a
        ``pipeline_depth``-deep thread pipeline, yielding per-batch result
        lists in order.

        Device dispatches are asynchronous, so while one batch blocks on a
        device->host fetch another batch's host stages (planning, deletion
        fix, Theil-Sen, assembly) run concurrently — the TPU-side analog
        of the reference's pipelined I/O-thread / DP-process design
        (reference: tombo/resquiggle.py:1417-1421)."""
        import collections
        import functools
        from concurrent.futures import ThreadPoolExecutor
        run = functools.partial(self.resquiggle_batch,
                                max_scaling_iters=max_scaling_iters)
        # LAZY submission (executor.map would drain the whole input
        # iterator up front, serializing host ingest against the device):
        # keep exactly pipeline_depth batches in flight, pulling the next
        # batch from the (possibly streaming) iterator as results retire
        it = iter(batches)
        with jax_trace_ctx():
            with ThreadPoolExecutor(max_workers=pipeline_depth) as pool:
                dq = collections.deque()
                drained = False
                while not drained and len(dq) < pipeline_depth:
                    try:
                        dq.append(pool.submit(run, next(it)))
                    except StopIteration:
                        drained = True
                while dq:
                    fut = dq.popleft()
                    out = fut.result()
                    if not drained:
                        try:
                            dq.append(pool.submit(run, next(it)))
                        except StopIteration:
                            drained = True
                    yield out

    def resquiggle_batch(self, map_results: Sequence[ResquiggleResults],
                         max_scaling_iters: int = config.MAX_SCALING_ITERS
                         ) -> List[Tuple[Optional[ResquiggleResults],
                                         Optional[str]]]:
        """Re-squiggle a batch of mapped reads (raw_signal already adjusted
        via ``adjust_map_res``).  Returns per-read (result, error)."""
        states = []
        for idx, mr in enumerate(map_results):
            raw = np.asarray(mr.raw_signal, np.float64)
            if self.const_scale is not None and mr.scale_values is None:
                # fixed/global scale: per-read median shift, shared scale
                # (reference: tombo/tombo_stats.py:505-509); values derive
                # host-side and flow through the provided-scale stage-A path
                _, sv = rsq.normalize_raw_signal(
                    raw, norm_type="median_const_scale",
                    outlier_thresh=self.outlier_thresh,
                    const_scale=self.const_scale)
                mr = mr.replace(scale_values=sv)
            num_mapped_bases = (len(mr.genome_seq) -
                                self.std_ref.kmer_width + 1)
            orig = np.asarray(mr.raw_signal)
            if orig.dtype == np.int16:
                raw_i16 = orig
            elif (raw.size and np.abs(raw).max() < 2 ** 15 and
                    np.all(raw == np.trunc(raw))):
                raw_i16 = raw.astype(np.int16)
            else:
                raw_i16 = None
            st = _ReadState(idx=idx, map_res=mr, raw=raw, num_events=0,
                            raw_i16=raw_i16)
            num_events = rsq.compute_num_events(
                raw.shape[0], num_mapped_bases,
                self.params.mean_obs_per_event)
            if num_events / self.params.bandwidth > num_mapped_bases:
                st.error = "Too much raw signal for mapped sequence"
            st.num_events = num_events
            states.append(st)

        self._run_pass(states, will_retry=max_scaling_iters > 1)

        # iterative sequence-fitted rescaling
        for it in range(max_scaling_iters - 1):
            redo = [s for s in states
                    if s.result is not None and s.result.norm_params_changed]
            if not redo:
                break
            for s in redo:
                s.map_res = s.map_res.replace(
                    scale_values=s.result.scale_values)
                s.result = None
                s.scale_values = None
                s.use_static = False
                s.has_del = None
                if hasattr(s, "dp_segs"):
                    del s.dp_segs
                for attr in ("_dev_fit", "_dev_score", "_score_corr",
                             "_sv_pre", "_ev_means_pre", "del_fixed",
                             "_del_windows", "_host_fin"):
                    if hasattr(s, attr):
                        delattr(s, attr)
            self._run_pass(redo, will_retry=it < max_scaling_iters - 2)

        # failed reads retried with the save bandwidth
        # (reference: tombo/resquiggle.py:1586-1588); skip if already in the
        # save lane to avoid retry recursion
        retry = ([] if self.params.bandwidth == self.save_params.bandwidth
                 else [s for s in states if s.result is None])
        if retry:
            saver = BatchedResquiggler(
                self.std_ref, self.save_params, self.seq_samp_type,
                self.outlier_thresh, self.dtype, mesh=self.mesh,
                const_scale=self.const_scale,
                skip_seq_scaling=self.skip_seq_scaling)
            retry_map = [s.map_res.replace(scale_values=None) for s in retry]
            retry_out = saver.resquiggle_batch(
                retry_map, max_scaling_iters=max_scaling_iters)
            for s, (res, err) in zip(retry, retry_out):
                if res is not None:
                    s.result = res
                    s.error = None

        return [(s.result, s.error) for s in states]
