"""Device (TPU) lane for the modified-base detection engine.

The reference's detection hot path is compiled per-read C/Python loops
(reference: tombo/tombo_stats.py:3675-3874 per-read model tests,
:4236-4334 group level tests, :4084-4123 per-site aggregation).  Here the
same math runs as batched JAX kernels over whole regions at once:

* per-read model tests (de novo / sample-compare) operate on a dense
  (reads, span) level matrix aligned to the region's accumulator span —
  z -> two-sided p -> Fisher's-method window -> per-site (coverage,
  valid coverage, above-threshold) sums reduce along the reads axis in
  the SAME jitted program, so only three (span,) integer vectors return
  to the host;
* group level tests (KS / Mann-Whitney U / t) operate on (positions,
  max_cov) NaN-padded level matrices: per-site sorts + vmapped
  searchsorted replace the reference's per-site Python loops.

Semantics match stats/kernels.py (the host lane) and therefore the
reference; cross-checked by tests/test_stats_device.py.  The host lane
remains the per-read-statistics-file path (it needs every read's
statistic stream, not just the per-site reductions).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import betainc, gammaincc, ndtr

from .kernels import SMALLEST_PVAL


def _f() -> jnp.dtype:
    """Float dtype for the stats lane: float64 when jax x64 is enabled
    (exact parity with the scipy host lane), else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


# ---------------------------------------------------------------------------
# per-read model tests (reference: tombo/tombo_stats.py:3675-3874)
# ---------------------------------------------------------------------------

def _window_logp_sum(logp: jnp.ndarray, lag: int) -> jnp.ndarray:
    """Per-window sum of +-lag neighbors; windows reaching a NaN (or the
    array edge) become NaN — the reference's strided-window semantics
    (reference: tombo/tombo_stats.py:2262-2266), NOT a cumsum difference."""
    B, W = logp.shape
    nan = jnp.asarray(jnp.nan, logp.dtype)
    padded = jnp.pad(logp, ((0, 0), (lag, lag)), constant_values=nan)
    out = jnp.zeros_like(logp)
    for d in range(2 * lag + 1):
        out = out + lax.dynamic_slice_in_dim(padded, d, W, axis=1)
    return out


@functools.partial(jax.jit, static_argnames=("fm_offset", "clamp_after"))
def model_test_pvals(r_means, ref_means, ref_sds, valid,
                     fm_offset: int, clamp_after: bool):
    """Two-sided z-test p-values with optional Fisher's-method window.

    r_means: (B, W) span-aligned read level means; ref_means/ref_sds are
    (W,) (de novo: sequence-derived expected levels; sample-compare:
    control central levels) or (B, W).  ``valid`` masks each read's
    contributing span columns.  ``clamp_after`` applies the de novo
    SMALLEST_PVAL floor after the window (reference:
    tombo/tombo_stats.py:3860-3862)."""
    dt = _f()
    r_means = r_means.astype(dt)
    ref_means = ref_means.astype(dt)
    ref_sds = ref_sds.astype(dt)
    z = jnp.abs((r_means - ref_means) / ref_sds)
    z = jnp.where(valid, z, jnp.asarray(jnp.nan, dt))
    p = 2.0 * ndtr(-z)
    if fm_offset > 0:
        width = 2 * fm_offset + 1
        logp = jnp.log(jnp.maximum(p, SMALLEST_PVAL))
        s = _window_logp_sum(logp, fm_offset)
        p = _chi2_sf_int(-s, width)
    if clamp_after:
        p = jnp.maximum(p, SMALLEST_PVAL)
    return p


def _chi2_sf_int(x, width: int):
    """chi2.sf(2x, 2*width) == Q(width, x) for INTEGER shape, in closed
    form: Q(n, x) = e^-x * sum_{i<n} x^i/i! — a static ``width``-term
    polynomial instead of XLA's iterative Igammac loop (which dominated
    the packed detection kernel's device time; the closed form is the
    exact value the iteration approximates, so host parity only
    improves)."""
    term = jnp.ones_like(x)
    acc = jnp.ones_like(x)
    for i in range(1, width):
        term = term * (x / i)
        acc = acc + term
    return jnp.exp(-x) * acc


@functools.partial(jax.jit, static_argnames=("mode",))
def site_accumulate(stats, emit_valid, single_read_thresh: float,
                    lower_thresh: float, mode: str):
    """Dense per-site (coverage, valid coverage, above-threshold count)
    sums along the reads axis (host equivalent:
    stats/detect.py ``site_accumulators``).  ``mode``: "two_way" uses
    ``lower_thresh``, "alt" uses |stat| >= thresh, "plain" counts all."""
    ok = emit_valid & ~jnp.isnan(stats)
    cov = jnp.sum(ok, axis=0, dtype=jnp.int32)
    if mode == "two_way":
        is_valid = ok & ((stats <= lower_thresh) |
                         (stats >= single_read_thresh))
    elif mode == "alt":
        is_valid = ok & (jnp.abs(stats) >= single_read_thresh)
    else:
        is_valid = ok
    valid_cov = jnp.sum(is_valid, axis=0, dtype=jnp.int32)
    above = jnp.sum(ok & (stats >= single_read_thresh), axis=0,
                    dtype=jnp.int32)
    return cov, valid_cov, above


@functools.partial(jax.jit, static_argnames=("fm_offset", "clamp_after",
                                             "mode"))
def model_test_and_accumulate(r_means, ref_means, ref_sds, valid,
                              emit_valid, fm_offset: int,
                              clamp_after: bool,
                              single_read_thresh: float,
                              lower_thresh: float, mode: str):
    """Fused per-read test + per-site reduction: one device call per
    region block, three (W,) int vectors back."""
    p = model_test_pvals(r_means, ref_means, ref_sds, valid, fm_offset,
                         clamp_after)
    return site_accumulate(p, emit_valid, single_read_thresh,
                           lower_thresh, mode)


# ---------------------------------------------------------------------------
# packed multi-region lane
# ---------------------------------------------------------------------------
# One device dispatch per ~10^6 site-observations instead of one per
# region: reads from MANY regions ride as rows of a single (B, W_sub)
# matrix.  Regions are chopped into fixed-width SUB-SPAN columns (core
# width + fm margins), each (read, sub-span) overlap becomes one row
# tagged with its sub-span id, and the per-site reductions happen as a
# one-hot matmul over the id — an MXU contraction, no scatter.  This
# replaces the dense (B, region_span) layout whose ~80% padding (2 kb
# reads in 10 kb regions) made per-region dispatches upload-bound and
# slower than host numpy (round-3 verdict: compute_device_vs_host 0.12).

def _round_dn(x: int, m: int) -> int:
    return (x // m) * m


def _pow2_at_least(x: int, lo: int) -> int:
    b = lo
    while b < x:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=(
    "W", "fm_offset", "clamp_after", "mode", "single_read_thresh",
    "lower_thresh", "want_pvals", "any_host"))
def packed_test_and_accumulate_fused(flat, ivec, dev_src, dev_flag,
                                     dev_srow, dev_scol0, dev_sstep,
                                     ref_means, ref_sds,
                                     W: int, fm_offset: int,
                                     clamp_after: bool,
                                     single_read_thresh: float,
                                     lower_thresh: float, mode: str,
                                     want_pvals: bool, any_host: bool):
    """``packed_test_and_accumulate`` with the device-resident level
    gather folded into the SAME dispatch (fused resquiggle->detect:
    stats/device_levels.py).  ``dev_flag``/``dev_srow``/``dev_scol0``/
    ``dev_sstep`` align with ``ivec``'s rows; flagged rows build their
    (B, W) level lanes by gathering the compacted source matrix
    directly — this REPLACES the body's flat-buffer gather for those
    rows (an extra per-element pass here measured slower than the
    upload it saved), and with no host rows in the group the flat
    buffer is never touched at all."""
    m_off = ivec[1].astype(jnp.int32)[:, None]
    col = jnp.arange(W, dtype=jnp.int32)[None, :]
    rel = col - m_off                                    # (B, W)
    src_col = jnp.clip(dev_scol0[:, None] + rel * dev_sstep[:, None],
                       0, dev_src.shape[1] - 1)
    dev_vals = jnp.take_along_axis(
        jnp.take(dev_src, dev_srow, axis=0), src_col, axis=1)
    return _packed_body(flat, ivec, ref_means, ref_sds, W, fm_offset,
                        clamp_after, single_read_thresh, lower_thresh,
                        mode, want_pvals,
                        dev_vals=(dev_vals, dev_flag, any_host))


@functools.partial(jax.jit, static_argnames=(
    "W", "fm_offset", "clamp_after", "mode", "single_read_thresh",
    "lower_thresh", "want_pvals"))
def packed_test_and_accumulate(flat, ivec, ref_means, ref_sds,
                               W: int, fm_offset: int, clamp_after: bool,
                               single_read_thresh: float,
                               lower_thresh: float, mode: str,
                               want_pvals: bool):
    return _packed_body(flat, ivec, ref_means, ref_sds, W, fm_offset,
                        clamp_after, single_read_thresh, lower_thresh,
                        mode, want_pvals)


def _packed_body(flat, ivec, ref_means, ref_sds,
                 W: int, fm_offset: int, clamp_after: bool,
                 single_read_thresh: float,
                 lower_thresh: float, mode: str,
                 want_pvals: bool, dev_vals=None):
    """Fused packed-row test + per-(sub-span, site) reduction.

    Rows arrive RAGGED: ``flat`` concatenates each row's real level
    means (no padding crosses the link — a ~3x wire cut at typical
    read-span/sub-span ratios); ``offs``/``m_off``/``m_len`` place row i's
    slice at columns [m_off, m_off+m_len).  zv_lo/zv_hi bound each row's
    z-score extent (the read's lag-trimmed testing extent — the host
    lane trims means BEFORE testing, so Fisher windows never see values
    beyond it; reference: tombo/tombo_stats.py:3846); em_lo/em_hi bound
    the columns whose statistics this row CONTRIBUTES (its sub-span
    core, so sites land in exactly one sub-span); sid: (B,) sub-span id;
    ref_means/ref_sds: (S, W) per-sub-span expected levels.

    Returns (counts_u8 (S, W, 3) uint8, over (S,) bool, counts32
    (S, W, 3) int32, p (B, W)): callers fetch the uint8 counts (+
    p-values when ``want_pvals``) and re-fetch rows of the
    device-resident int32 counts only for the rare sub-spans whose
    coverage overflows a byte.  Math identical to
    :func:`model_test_pvals` + :func:`site_accumulate` (cross-checked
    by tests/test_stats_device)."""
    dt = _f()
    S = (ref_means[0] if isinstance(ref_means, tuple)
         else ref_means).shape[0]
    # row metadata rides as ONE (8, B) int32 matrix: per-array H2D
    # transfers each pay a fixed link overhead, dominating small-vector
    # uploads through the tunneled device
    offs, m_off, m_len, zv_lo, zv_hi, em_lo, em_hi, sid = (
        ivec[i] for i in range(8))
    sid = sid.astype(jnp.int32)
    col = jnp.arange(W, dtype=jnp.int32)[None, :]
    m_off = m_off.astype(jnp.int32)[:, None]
    valid_m = (col >= m_off) & (col < m_off + m_len.astype(jnp.int32)[:, None])
    if dev_vals is not None:
        dvals, dflag, any_host = dev_vals
        nan = jnp.asarray(jnp.nan, dvals.dtype)
        if any_host:
            idx = offs.astype(jnp.int32)[:, None] + (col - m_off)
            hvals = jnp.take(flat, jnp.clip(idx, 0, flat.shape[0] - 1))
            r_means = jnp.where(
                valid_m,
                jnp.where(dflag[:, None] != 0, dvals, hvals), nan)
        else:
            r_means = jnp.where(valid_m, dvals, nan)
    else:
        idx = offs.astype(jnp.int32)[:, None] + (col - m_off)
        r_means = jnp.where(
            valid_m,
            jnp.take(flat, jnp.clip(idx, 0, flat.shape[0] - 1)),
            jnp.asarray(jnp.nan, flat.dtype))
    zvalid = (col >= zv_lo.astype(jnp.int32)[:, None]) & \
             (col < zv_hi.astype(jnp.int32)[:, None])
    emit = (col >= em_lo.astype(jnp.int32)[:, None]) & \
           (col < em_hi.astype(jnp.int32)[:, None])
    if isinstance(ref_means, tuple):
        # sequence-derived expected levels (de novo): (S, W) int16 k-mer
        # codes + the on-chip model table with a NaN sentinel row — 4x
        # less ref wire than two f32 level rows per sub-span.  Table
        # gather happens at SUB-SPAN granularity (S x W positions), then
        # rows broadcast to reads by a cheap row gather.
        codes, mt, st = ref_means
        S = codes.shape[0]
        c = codes.astype(jnp.int32)
        rm_sub = jnp.take(mt, c, axis=0).astype(dt)
        rs_sub = jnp.take(st, c, axis=0).astype(dt)
        rm = jnp.take(rm_sub, sid, axis=0)
        rs = jnp.take(rs_sub, sid, axis=0)
    else:
        rm = jnp.take(ref_means, sid, axis=0).astype(dt)
        rs = jnp.take(ref_sds, sid, axis=0).astype(dt)
    z = jnp.abs((r_means.astype(dt) - rm) / rs)
    z = jnp.where(zvalid, z, jnp.asarray(jnp.nan, dt))
    p = 2.0 * ndtr(-z)
    if fm_offset > 0:
        width = 2 * fm_offset + 1
        logp = jnp.log(jnp.maximum(p, SMALLEST_PVAL))
        s = _window_logp_sum(logp, fm_offset)
        p = _chi2_sf_int(-s, width)
    if clamp_after:
        p = jnp.maximum(p, SMALLEST_PVAL)
    ok = emit & ~jnp.isnan(p)
    if mode == "two_way":
        is_valid = ok & ((p <= lower_thresh) | (p >= single_read_thresh))
    elif mode == "alt":
        is_valid = ok & (jnp.abs(p) >= single_read_thresh)
    else:
        is_valid = ok
    above = ok & (p >= single_read_thresh)
    masks = jnp.stack([ok, is_valid, above], axis=-1).astype(jnp.float32)
    oh = (sid[:, None] == jnp.arange(S, dtype=jnp.int32)[None, :]
          ).astype(jnp.float32)                      # (B, S)
    counts = jnp.einsum("bs,bwc->swc", oh, masks,
                        preferred_element_type=jnp.float32
                        ).astype(jnp.int32)
    over = jnp.any(counts > 255, axis=(1, 2))
    out_p = p if want_pvals else jnp.zeros((1, 1), dt)
    return counts.astype(jnp.uint8), over, counts, out_p


@functools.partial(jax.jit, static_argnames=("total_pad",))
def _scatter_levels_jit(flat, src, dest, srow, scol0, sstep, lens,
                        total_pad: int):
    """Expand per-row (dest, src_row, src_col0, step, len) ranges on
    device and scatter the gathered level values into the flat packed
    buffer — the wire carries ~16 bytes per read-region intersection
    instead of 4 bytes per site-observation (fused resquiggle->detect;
    reference being beaten: per-test Events re-reads,
    tombo/tombo_stats.py:3705,3803,4013)."""
    cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(lens).astype(jnp.int32)])
    e = jnp.arange(total_pad, dtype=jnp.int32)
    k = jnp.clip(jnp.searchsorted(cum, e, side="right") - 1, 0,
                 lens.shape[0] - 1)
    within = e - cum[k]
    valid = e < cum[-1]
    col = jnp.clip(scol0[k] + within * sstep[k], 0, src.shape[1] - 1)
    vals = src[srow[k], col].astype(flat.dtype)
    dest_idx = jnp.where(valid, dest[k] + within,
                         jnp.int32(flat.shape[0] + 1))
    return flat.at[dest_idx].set(vals, mode="drop")


def _scatter_dev_levels(flat_j, arr, rows_g):
    """Scatter one source array's device-resident rows into ``flat_j``;
    row-count and total-site shapes are pow2-bucketed so repeated
    dispatches reuse compiled programs."""
    R = len(rows_g)
    Rp = _pow2_at_least(R, 32)
    dest = np.zeros(Rp, np.int32)
    srow = np.zeros(Rp, np.int32)
    scol0 = np.zeros(Rp, np.int32)
    sstep = np.ones(Rp, np.int32)
    lens = np.zeros(Rp, np.int32)
    for j, (o, sr, c0, st, n) in enumerate(rows_g):
        dest[j], srow[j], scol0[j], sstep[j], lens[j] = o, sr, c0, st, n
    total = int(lens.sum())
    total_pad = _pow2_at_least(max(total, 1), 1 << 12)
    return _scatter_levels_jit(
        flat_j, arr, jnp.asarray(dest), jnp.asarray(srow),
        jnp.asarray(scol0), jnp.asarray(sstep), jnp.asarray(lens),
        total_pad)


class PackedRegionBatch:
    """Host-side packer: region jobs -> device inputs -> per-region
    dense accumulators (and per-read stat streams)."""

    def __init__(self, fm_offset: int, core: Optional[int] = None,
                 levels_table=None):
        import os
        self.fm = fm_offset
        self.core = core or int(os.environ.get(
            "TOMBO_TPU_STATS_SUBSPAN", "4096"))
        self.W = self.core + 2 * self.fm
        self.rows = []          # (means_slice | site count, ..., sid)
        self.row_dev = []       # per row: None | (arr, row, src0, step)
        self.row_meta = []      # (job_idx, read_idx, col0_abs)
        self.subs = []          # (job_idx, c_lo, c_hi, ref_m, ref_s)
        # codes mode: (means, sds) model arrays; sub-spans then carry
        # int16 k-mer code rows and the kernel gathers levels on-chip
        # (4x less ref wire than two f32 level rows per sub-span)
        self.table = levels_table
        self._table_dev = None

    def _dev_table(self):
        if self._table_dev is None:
            mt = np.append(np.asarray(self.table[0], np.float64), np.nan)
            st = np.append(np.asarray(self.table[1], np.float64), np.nan)
            dt = np.float64 if jax.config.jax_enable_x64 else np.float32
            self._table_dev = (jnp.asarray(mt.astype(dt)),
                               jnp.asarray(st.astype(dt)))
        return self._table_dev

    def add_region(self, job_idx: int, span_lo: int, span_n: int,
                   ref_means: np.ndarray, ref_sds: np.ndarray,
                   levels, place_lo: int, place_hi: int,
                   begin_lag: int, end_lag: int,
                   ref_codes: Optional[np.ndarray] = None):
        """Chop one region's span into sub-spans and emit packed rows.
        ``ref_means/ref_sds`` are (span_n,) genome-oriented arrays — or,
        when the packer was built with a ``levels_table``, ``ref_codes``
        is the (span_n,) per-position k-mer code array (-1 = invalid
        window) and expected levels gather on-chip;
        ``levels`` the region's ReadLevels."""
        fm, core = self.fm, self.core
        # per-read trimmed extents + emission bounds (the host lane's
        # clipping semantics, reference: tombo/tombo_stats.py:3783-3846)
        reads = []
        for ridx, rl in enumerate(levels):
            r = rl.r_data
            if rl.dev is not None:
                m = None          # device-resident: gathered at dispatch
            else:
                m = rl.means
                if r.strand == "-":
                    m = m[::-1]
            g_lo = max(r.start, span_lo, place_lo)
            g_hi = min(r.end, span_lo + span_n, place_hi)
            if g_hi <= g_lo:
                continue
            c_lo_r = max(r.start, place_lo)
            c_hi_r = min(r.end, place_hi)
            e_lo = max(g_lo, c_lo_r + begin_lag)
            e_hi = min(g_hi, c_hi_r - end_lag)
            if e_hi <= e_lo:
                continue
            reads.append((ridx, r.start, g_lo, g_hi, e_lo, e_hi, m,
                          rl.dev, r.strand, r.end - r.start))
        n_sub = -(-span_n // core)
        for j in range(n_sub):
            c_lo = span_lo + j * core
            c_hi = min(c_lo + core, span_lo + span_n)
            sid = len(self.subs)
            col0 = c_lo - fm
            lo = max(col0, span_lo)
            hi = min(col0 + self.W, span_lo + span_n)
            if ref_codes is not None:
                sent = self.table[0].shape[0]
                crow = np.full(self.W, sent, np.int16)
                if hi > lo:
                    cs = ref_codes[lo - span_lo:hi - span_lo]
                    crow[lo - col0:hi - col0] = np.where(
                        cs >= 0, cs, sent).astype(np.int16)
                self.subs.append((job_idx, c_lo, c_hi, crow, None))
            else:
                rm = np.full(self.W, np.nan)
                rs = np.full(self.W, np.nan)
                if hi > lo:
                    rm[lo - col0:hi - col0] = ref_means[lo - span_lo:
                                                        hi - span_lo]
                    rs[lo - col0:hi - col0] = ref_sds[lo - span_lo:
                                                      hi - span_lo]
                self.subs.append((job_idx, c_lo, c_hi, rm, rs))
            for (ridx, r_start, g_lo, g_hi, e_lo, e_hi, m, dev, strand,
                 r_len) in reads:
                m_lo = max(g_lo, col0)
                m_hi = min(g_hi, col0 + self.W)
                em_lo = max(e_lo, c_lo)
                em_hi = min(e_hi, c_hi)
                zv_lo = max(e_lo, col0)
                zv_hi = min(e_hi, col0 + self.W)
                if em_hi <= em_lo or m_hi <= m_lo:
                    continue
                if dev is not None:
                    # genome position g maps to read-centric column
                    # (g - r_start) on '+', (L-1 - (g - r_start)) on '-'
                    if strand == "-":
                        src0, step = r_len - 1 - (m_lo - r_start), -1
                    else:
                        src0, step = m_lo - r_start, 1
                    self.rows.append((m_hi - m_lo,
                                      m_lo - col0, zv_lo - col0,
                                      zv_hi - col0, em_lo - col0,
                                      em_hi - col0, sid))
                    self.row_dev.append((dev[0], int(dev[1]), src0, step))
                else:
                    self.rows.append((m[m_lo - r_start:m_hi - r_start],
                                      m_lo - col0, zv_lo - col0,
                                      zv_hi - col0, em_lo - col0,
                                      em_hi - col0, sid))
                    self.row_dev.append(None)
                self.row_meta.append((job_idx, ridx, col0))

    @staticmethod
    def _row_len(r0) -> int:
        return r0 if isinstance(r0, int) else r0.shape[0]

    def site_obs(self) -> int:
        return sum(self._row_len(r[0]) for r in self.rows)

    def dispatch(self, fm_offset, clamp_after, single_read_thresh,
                 lower_thresh, mode, want_pvals,
                 rows_per_group: int = 512):
        """Upload, run, fetch.  Returns (counts (S, W, 3) int64,
        pvals (B, W) or None).

        Sub-spans split into GROUPS of ~``rows_per_group`` rows, each its
        own kernel dispatch with async device->host copies: group g+1's
        (ragged) upload rides the link while group g's counts stream
        back, so a large region chunk approaches the upload-bound
        ceiling instead of paying serial up+down per chunk."""
        B = len(self.rows)
        S = len(self.subs)
        if B == 0:
            return None, None
        dt = np.float64 if jax.config.jax_enable_x64 else np.float32
        # contiguous row ranges per sub-span (rows were appended in sid
        # order), then sub-span groups bounded by row count
        row_sid = np.array([r[6] for r in self.rows], np.int64)
        sub_row_start = np.searchsorted(row_sid, np.arange(S + 1))
        groups = []
        g_s0 = 0
        for s in range(1, S + 1):
            if s == S or (sub_row_start[s] - sub_row_start[g_s0] >=
                          rows_per_group):
                groups.append((g_s0, s))
                g_s0 = s
        handles = []
        for g_s0, g_s1 in groups:
            r0, r1 = int(sub_row_start[g_s0]), int(sub_row_start[g_s1])
            Bg = r1 - r0
            Sg = g_s1 - g_s0
            Bp = _pow2_at_least(max(Bg, 1), 128)
            Sp = _round_up(Sg, 8)
            total = sum(self._row_len(self.rows[i][0])
                        for i in range(r0, r1))
            Fp = _pow2_at_least(max(total, 1), 1 << 12)
            flat = np.zeros(Fp, dt)
            ivec = np.zeros((8, Bp), np.int32)
            (offs, m_off, m_len, zv_lo, zv_hi, em_lo, em_hi,
             sid) = ivec
            # device-resident rows, grouped by source array: the flat
            # buffer slots are reserved here and filled by an on-chip
            # range gather after upload (fused resquiggle->detect path)
            dev_groups: dict = {}
            any_host = False
            o = 0
            for i in range(r0, r1):
                m, mo, zl, zh, el, eh, s = self.rows[i]
                j = i - r0
                n = self._row_len(m)
                if isinstance(m, int):
                    arr, srow, src0, step = self.row_dev[i]
                    dev_groups.setdefault(id(arr), (arr, []))[1].append(
                        (o, srow, src0, step, n))
                else:
                    flat[o:o + n] = m
                    any_host = True
                offs[j] = o
                m_off[j] = mo
                m_len[j] = n
                o += n
                zv_lo[j], zv_hi[j], em_lo[j], em_hi[j] = zl, zh, el, eh
                sid[j] = s - g_s0
            if self.table is not None:
                sent = self.table[0].shape[0]
                codes_m = np.full((Sp, self.W), sent, np.int16)
                for s in range(g_s0, g_s1):
                    codes_m[s - g_s0] = self.subs[s][3]
                mt, st = self._dev_table()
                ref_a = (jnp.asarray(codes_m), mt, st)
                ref_b = jnp.zeros(1, dt)
            else:
                ref_m = np.full((Sp, self.W), np.nan, dt)
                ref_s = np.full((Sp, self.W), np.nan, dt)
                for s in range(g_s0, g_s1):
                    ref_m[s - g_s0] = self.subs[s][3]
                    ref_s[s - g_s0] = self.subs[s][4]
                ref_a = jnp.asarray(ref_m)
                ref_b = jnp.asarray(ref_s)
            if len(dev_groups) == 1:
                # single compacted source (the common fused case): the
                # gather rides the test dispatch itself — zero extra
                # device calls, zero level bytes on the wire.  Metadata
                # aligns with ivec's rows.
                arr, rows_g = next(iter(dev_groups.values()))
                dflag = np.zeros(Bp, np.int32)
                dsrow = np.zeros(Bp, np.int32)
                dscol = np.zeros(Bp, np.int32)
                dstep = np.ones(Bp, np.int32)
                rg = iter(rows_g)
                for i in range(r0, r1):
                    if isinstance(self.rows[i][0], int):
                        o2, sr, c0, st2, n2 = next(rg)
                        j2 = i - r0
                        dflag[j2], dsrow[j2] = 1, sr
                        dscol[j2], dstep[j2] = c0, st2
                # all-device groups ship NO level buffer at all (a
                # 1-element dummy stands in; the body never reads it)
                flat_j = (jnp.zeros(1, dt) if not any_host
                          else jnp.asarray(flat))
                u8, over, counts32, pv = packed_test_and_accumulate_fused(
                    flat_j, jnp.asarray(ivec), arr,
                    jnp.asarray(dflag), jnp.asarray(dsrow),
                    jnp.asarray(dscol), jnp.asarray(dstep),
                    ref_a, ref_b,
                    self.W, fm_offset, clamp_after,
                    float(single_read_thresh), float(lower_thresh), mode,
                    want_pvals, any_host)
            else:
                flat_j = jnp.asarray(flat)
                for arr, rows_g in dev_groups.values():
                    flat_j = _scatter_dev_levels(flat_j, arr, rows_g)
                u8, over, counts32, pv = packed_test_and_accumulate(
                    flat_j, jnp.asarray(ivec), ref_a, ref_b,
                    self.W, fm_offset, clamp_after,
                    float(single_read_thresh), float(lower_thresh), mode,
                    want_pvals)
            for a in ((u8, over, pv) if want_pvals else (u8, over)):
                try:
                    a.copy_to_host_async()
                except AttributeError:
                    pass
            handles.append((g_s0, g_s1, r0, r1, u8, over, counts32, pv))

        counts_np = np.zeros((S, self.W, 3), np.int64)
        pv_np = (np.zeros((B, self.W),
                          np.float64 if dt is np.float64 else np.float32)
                 if want_pvals else None)
        for g_s0, g_s1, r0, r1, u8, over, counts32, pv in handles:
            Sg = g_s1 - g_s0
            u8_np = np.asarray(u8)[:Sg]
            over_np = np.asarray(over)[:Sg]
            counts_np[g_s0:g_s1] = u8_np
            for s in np.flatnonzero(over_np):
                counts_np[g_s0 + s] = np.asarray(counts32[int(s)])
            if want_pvals:
                pv_np[r0:r1] = np.asarray(pv)[:r1 - r0]
        return counts_np, pv_np

    def unpack_region(self, job_idx: int, span_lo: int, span_n: int,
                      counts: np.ndarray):
        """Per-region dense (cov, valid, above) accumulators from the
        fetched sub-span counts."""
        cov = np.zeros(span_n, np.int64)
        valid = np.zeros(span_n, np.int64)
        above = np.zeros(span_n, np.int64)
        fm = self.fm
        for s, (j, c_lo, c_hi, _, _) in enumerate(self.subs):
            if j != job_idx:
                continue
            n = c_hi - c_lo
            sl = slice(c_lo - span_lo, c_hi - span_lo)
            cov[sl] = counts[s, fm:fm + n, 0]
            valid[sl] = counts[s, fm:fm + n, 1]
            above[sl] = counts[s, fm:fm + n, 2]
        return cov, valid, above

    def read_streams(self, job_idx: int, pvals: np.ndarray):
        """Per-read (positions, stats) streams for one region from the
        fetched p-value matrix (per-read statistics files).  Returns
        {read_idx: (poss, stats)} with positions ascending."""
        out = {}
        for i, (j, ridx, col0) in enumerate(self.row_meta):
            if j != job_idx:
                continue
            _, _, _, _, e_lo, e_hi, _ = self.rows[i]
            p_row = pvals[i, e_lo:e_hi]
            keep = ~np.isnan(p_row)
            poss = np.arange(col0 + e_lo, col0 + e_hi)[keep]
            st = p_row[keep].astype(np.float64)
            if ridx in out:
                p0, s0 = out[ridx]
                out[ridx] = (np.concatenate([p0, poss]),
                             np.concatenate([s0, st]))
            else:
                out[ridx] = (poss, st)
        return out


# ---------------------------------------------------------------------------
# alt-model scaled log-likelihood ratios
# (reference: tombo/_c_helper.pyx:313 c_calc_scaled_llh_ratio_const_var,
#  :298 c_calc_llh_ratio_const_var; math documented in
#  docs/modified_base_detection.rst:44-50)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("standard", "scale", "height",
                                             "power"))
def alt_llhr(means_w, ref_means_w, alt_means_w, const_var,
             standard: bool, scale: float, height: float, power: float):
    """Per-motif-hit (scaled) log-likelihood ratios over stacked (H, k)
    windows — the reference's hottest compiled stats kernel, batched
    across every hit of every read of a region chunk in one dispatch.
    Host equivalent: the numpy branch of
    ``stats.detect.compute_alt_model_read_stats``."""
    dt = _f()
    m = means_w.astype(dt)
    ref = ref_means_w.astype(dt)
    alt = alt_means_w.astype(dt)
    cv = const_var.astype(dt)
    if standard:
        return (jnp.square(m - alt).sum(-1) -
                jnp.square(m - ref).sum(-1)) / cv
    scale_var = cv[:, None] * scale
    coef = height * jnp.power(cv, power)
    return (jnp.exp(-jnp.square(m - ref) / scale_var) -
            jnp.exp(-jnp.square(m - alt) / scale_var)).sum(-1) * coef


# ---------------------------------------------------------------------------
# group (level) tests (reference: tombo/tombo_stats.py:4236-4334)
# ---------------------------------------------------------------------------

def _kolmogorov_sf(x):
    """Kolmogorov distribution survival function (scipy
    ``kstwobign.sf``): series 2*sum_k (-1)^(k-1) exp(-2 k^2 x^2) for
    large x; Jacobi-theta form of the CDF for small x where that series
    converges slowly."""
    dt = x.dtype
    x = jnp.maximum(x, jnp.asarray(1e-8, dt))
    k = jnp.arange(1, 26, dtype=dt)
    sf_big = 2.0 * jnp.sum(
        jnp.where(k[None, :] % 2 == 1, 1.0, -1.0) *
        jnp.exp(-2.0 * (k[None, :] * x[:, None]) ** 2), axis=1)
    j = jnp.arange(1, 21, dtype=dt)
    w = jnp.sqrt(2.0 * jnp.pi) / x
    cdf_small = w * jnp.sum(
        jnp.exp(-((2.0 * j[None, :] - 1.0) ** 2) * (jnp.pi ** 2) /
                (8.0 * x[:, None] ** 2)), axis=1)
    return jnp.where(x > 1.0, sf_big, 1.0 - cdf_small)


def _sorted_valid(levels):
    """Sort (P, C) NaN-padded levels ascending with NaN -> +inf, plus
    per-site valid counts."""
    dt = _f()
    levels = levels.astype(dt)
    n = jnp.sum(~jnp.isnan(levels), axis=1)
    s = jnp.sort(jnp.where(jnp.isnan(levels),
                           jnp.asarray(jnp.inf, dt), levels), axis=1)
    return s, n


@functools.partial(jax.jit, static_argnames=("return_stat",))
def ks_tests(samp, ctrl, return_stat: bool):
    """Two-sample KS per site over (P, C) NaN-padded level matrices
    (host equivalent: stats/kernels.py ``compute_ks_tests``)."""
    dt = _f()
    s, sn = _sorted_valid(samp)
    c, cn = _sorted_valid(ctrl)
    allv = jnp.concatenate([s, c], axis=1)
    v_valid = jnp.isfinite(allv)

    ss_r = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))
    s_cdf = ss_r(s, allv).astype(dt)
    c_cdf = ss_r(c, allv).astype(dt)
    # searchsorted over the inf padding counts pads below +inf queries;
    # cap at the true valid count
    s_cdf = jnp.minimum(s_cdf, sn[:, None].astype(dt)) / sn[:, None]
    c_cdf = jnp.minimum(c_cdf, cn[:, None].astype(dt)) / cn[:, None]
    d = jnp.max(jnp.where(v_valid, jnp.abs(s_cdf - c_cdf), 0.0), axis=1)
    if return_stat:
        return 1.0 - d
    sn_f, cn_f = sn.astype(dt), cn.astype(dt)
    en = jnp.sqrt(sn_f * cn_f / (sn_f + cn_f))
    return _kolmogorov_sf((en + 0.12 + 0.11 / en) * d)


@functools.partial(jax.jit, static_argnames=("return_stat",))
def u_tests(samp, ctrl, return_stat: bool):
    """Mann-Whitney U per site (host equivalent:
    stats/kernels.py ``compute_u_tests``; the reference breaks rank ties
    by stable order with sample entries first — ``searchsorted(...,
    'left')`` reproduces that exactly)."""
    dt = _f()
    s, sn = _sorted_valid(samp)
    c, cn = _sorted_valid(ctrl)
    ss_l = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="left"))
    below = jnp.minimum(ss_l(c, s), cn[:, None]).astype(dt)
    iot = jnp.arange(s.shape[1])
    u1 = jnp.sum(jnp.where(iot[None, :] < sn[:, None], below, 0.0), axis=1)
    sn_f, cn_f = sn.astype(dt), cn.astype(dt)
    tot = sn_f * cn_f
    u = jnp.minimum(u1, tot - u1)
    mu = tot / 2.0
    if return_stat:
        return (u - mu) / mu
    rhou = jnp.sqrt(tot * (tot + 1.0) / 12.0)
    return ndtr((u - mu) / rhou) * 2.0


@functools.partial(jax.jit, static_argnames=("return_stat",))
def t_tests(samp, ctrl, return_stat: bool):
    """Welch/pooled two-sample t per site (host equivalent:
    stats/kernels.py ``compute_t_tests``)."""
    dt = _f()
    samp = samp.astype(dt)
    ctrl = ctrl.astype(dt)

    def moments(x):
        m = ~jnp.isnan(x)
        n = jnp.sum(m, axis=1).astype(dt)
        mean = jnp.sum(jnp.where(m, x, 0.0), axis=1) / n
        var = jnp.sum(jnp.where(m, (x - mean[:, None]) ** 2, 0.0),
                      axis=1) / n
        return n, mean, jnp.sqrt(var)

    sn, s_mean, s_sd = moments(samp)
    cn, c_mean, c_sd = moments(ctrl)
    if return_stat:
        return -jnp.abs(s_mean - c_mean) / jnp.sqrt(
            (s_sd ** 2 + c_sd ** 2) / 2.0)
    df = sn + cn - 2.0
    sp = jnp.sqrt((((sn - 1.0) * s_sd ** 2) + (cn - 1.0) * c_sd ** 2) / df)
    t = -jnp.abs(s_mean - c_mean) / (sp * jnp.sqrt(1.0 / sn + 1.0 / cn))
    # t.cdf(t, df) for t <= 0 equals betainc(df/2, 1/2, df/(df+t^2)) / 2
    cdf = 0.5 * betainc(df / 2.0, jnp.asarray(0.5, dt),
                        df / (df + t ** 2))
    return cdf * 2.0


# ---------------------------------------------------------------------------
# host-side region block preparation
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_read_block(levels, span_lo: int, span_n: int,
                     place_lo: int, place_hi: int,
                     begin_lag: int, end_lag: int,
                     b_pad: Optional[int] = None
                     ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                         np.ndarray]]:
    """Pack a region's ReadLevels into span-aligned device inputs.

    Returns (r_means (B, span_n) f32/f64 NaN-padded, valid (B, span_n),
    emit_valid (B, span_n)).  ``place_lo/place_hi`` bound the columns a
    read may contribute means to — the host lane's read clipping
    (reference: tombo/tombo_stats.py:3783-3806) expressed as a mask;
    ``begin_lag/end_lag`` trim each read's emission extent (k-mer
    context; zero for sample-compare)."""
    B = len(levels)
    if B == 0:
        return None
    dt = np.float64
    means = np.full((B, span_n), np.nan, dt)
    emit = np.zeros((B, span_n), bool)
    for i, rl in enumerate(levels):
        r = rl.r_data
        m = rl.means
        if r.strand == "-":
            m = m[::-1]
        g_lo = max(r.start, span_lo, place_lo)
        g_hi = min(r.end, span_lo + span_n, place_hi)
        if g_hi <= g_lo:
            continue
        means[i, g_lo - span_lo:g_hi - span_lo] = \
            m[g_lo - r.start:g_hi - r.start]
        # emission trims the k-mer lags off the CLIPPED read extent (the
        # host lane clips first, then trims: tombo/tombo_stats.py:3846)
        c_lo = max(r.start, place_lo)
        c_hi = min(r.end, place_hi)
        e_lo = max(g_lo, c_lo + begin_lag)
        e_hi = min(g_hi, c_hi - end_lag)
        if e_hi > e_lo:
            emit[i, e_lo - span_lo:e_hi - span_lo] = True
    if b_pad:
        Bp = _round_up(B, b_pad)
        if Bp != B:
            means = np.pad(means, ((0, Bp - B), (0, 0)),
                           constant_values=np.nan)
            emit = np.pad(emit, ((0, Bp - B), (0, 0)))
    return means, ~np.isnan(means), emit


def pad_levels_pair(samp: np.ndarray, ctrl: np.ndarray, cov_mult: int = 8
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the coverage axes of a (P, C) sample/control matrix pair to a
    shared bucketed width so group-test shapes recompile rarely."""
    C = _round_up(max(samp.shape[1], ctrl.shape[1], 1), cov_mult)

    def pad(x):
        if x.shape[1] == C:
            return x
        return np.pad(x, ((0, 0), (0, C - x.shape[1])),
                      constant_values=np.nan)

    return pad(samp), pad(ctrl)
