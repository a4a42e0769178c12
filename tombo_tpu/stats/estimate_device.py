"""Device-side k-mer level extraction for model estimation.

The reference tabulates per-site (median, sd) of stacked read levels
with per-position python loops fanned across processes
(reference: tombo/tombo_stats.py:1242-1360 ``get_region_kmer_levels``,
:1361-1452 process fan-out).  The per-site reduction over coverage is
the whole cost — exactly the shape the packed detection lane already
runs on device — so this module stacks every read-region intersection
of a region chunk into one (S, C, W) device tensor, computes masked
per-site median + std in a single dispatch, and leaves the host only
the k-mer bucketing (one vectorized pass over sites).

Reads resquiggled in this process serve their means straight from the
device cache (stats/device_levels.py) — no sidecar read, no level
upload; other reads upload their sidecar means once per chunk.

Numerics: device statistics are float32 (medians are order statistics —
exact up to f32 ties; stds agree to ~1e-6 relative).  The f64 host lane
remains the oracle and the default on CPU-only runs.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import functools

from ..errors import TomboTpuError
from ..seq import rev_comp
from .region import RegionData

_COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}
_BASE_CODE = {"A": 0, "C": 1, "G": 2, "T": 3}


def enabled() -> bool:
    env = os.environ.get("TOMBO_TPU_EST_DEVICE", "")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() not in ("cpu",)


def _pow2_at_least(x: int, lo: int) -> int:
    b = lo
    while b < x:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("W", "C", "est_mean",
                                             "any_host"))
def _site_stats_kernel(flat, offs, m_off, m_len, sub_r0, sub_r1,
                       dev_src, dev_flag, dev_srow, dev_scol0, dev_sstep,
                       W: int, C: int, est_mean: bool, any_host: bool):
    """Per-site (median|mean, std, count) over stacked read levels.

    Rows tile ``flat`` (host-uploaded levels) or gather device-resident
    spans from ``dev_src`` (same layout contract as the packed detection
    kernel).  Rows are grouped per sub-span: rows [sub_r0[s], sub_r1[s])
    belong to region-chunk slot s; the kernel re-stacks them into an
    (S, C, W) tensor and reduces over C with NaN masking."""
    B = offs.shape[0]
    S = sub_r0.shape[0]
    col = jnp.arange(W, dtype=jnp.int32)[None, :]
    m_off2 = m_off.astype(jnp.int32)[:, None]
    valid_m = (col >= m_off2) & (col < m_off2 +
                                 m_len.astype(jnp.int32)[:, None])
    rel = col - m_off2
    nan = jnp.asarray(jnp.nan, jnp.float32)
    src_col = jnp.clip(dev_scol0[:, None] + rel * dev_sstep[:, None],
                       0, dev_src.shape[1] - 1)
    dvals = jnp.take_along_axis(
        jnp.take(dev_src, dev_srow, axis=0), src_col, axis=1
    ).astype(jnp.float32)
    if any_host:
        idx = offs.astype(jnp.int32)[:, None] + rel
        hvals = jnp.take(flat, jnp.clip(idx, 0, flat.shape[0] - 1)
                         ).astype(jnp.float32)
        r_means = jnp.where(valid_m,
                            jnp.where(dev_flag[:, None] != 0, dvals,
                                      hvals), nan)
    else:
        r_means = jnp.where(valid_m, dvals, nan)

    # stack per sub-span: (S, C, W)
    cidx = jnp.arange(C, dtype=jnp.int32)[None, :]
    row_idx = sub_r0[:, None] + cidx
    ok = row_idx < sub_r1[:, None]
    row_idx = jnp.where(ok, jnp.clip(row_idx, 0, B - 1), B)
    r_pad = jnp.concatenate([r_means, jnp.full((1, W), nan)], axis=0)
    stack = jnp.take(r_pad, row_idx, axis=0)          # (S, C, W)

    live = ~jnp.isnan(stack)
    cnt = jnp.sum(live, axis=1).astype(jnp.int32)     # (S, W)
    x = jnp.where(live, stack, 0.0)
    s1 = jnp.sum(x, axis=1)
    denom = jnp.maximum(cnt, 1).astype(jnp.float32)
    mean = s1 / denom
    var = jnp.sum(jnp.where(live, (stack - mean[:, None, :]) ** 2, 0.0),
                  axis=1) / denom
    sd = jnp.sqrt(var)
    if est_mean:
        center = mean
    else:
        # NaNs sort last, so the middle order statistics of the first
        # cnt entries are the median (np.median semantics: mean of the
        # two middles for even counts)
        srt = jnp.sort(stack, axis=1)
        lo_i = jnp.maximum((cnt - 1) // 2, 0)
        hi_i = jnp.maximum(cnt // 2, 0)
        lo = jnp.take_along_axis(srt, lo_i[:, None, :], axis=1)[:, 0, :]
        hi = jnp.take_along_axis(srt, hi_i[:, None, :], axis=1)[:, 0, :]
        center = 0.5 * (lo + hi)
    return center, sd, cnt


def _kmer_codes(seq: str, kmer_width: int, strand: str) -> np.ndarray:
    """Per-start-position k-mer integer codes of ``seq`` (base-4,
    leftmost base most significant, matching ``all_kmers`` order); on
    '-' strand the site k-mer is the reverse complement.  -1 marks any
    window containing a non-ACGT base."""
    arr = np.frombuffer(seq.upper().encode(), np.uint8)
    code = np.full(arr.shape[0], -1, np.int64)
    for b, v in _BASE_CODE.items():
        code[arr == ord(b)] = v
    if strand == "-":
        code = np.where(code >= 0, 3 - code, -1)      # complement
    n = arr.shape[0] - kmer_width + 1
    if n <= 0:
        return np.empty(0, np.int64)
    out = np.zeros(n, np.int64)
    bad = np.zeros(n, bool)
    for j in range(kmer_width):
        c = code[j:j + n]
        # '-' strand: rev_comp reverses base order within the window
        w = (kmer_width - 1 - j) if strand == "-" else j
        out += np.where(c >= 0, c, 0) << (2 * (kmer_width - 1 - w))
    for j in range(kmer_width):
        bad |= code[j:j + n] < 0
    return np.where(bad, -1, out)


def get_region_kmer_levels_device(
        regions: List[RegionData], fasta, cov_thresh, upstrm_bases,
        dnstrm_bases, cs_cov_thresh, est_mean, region_size,
        rng: Optional[np.random.Generator] = None,
        rows_budget: int = 512):
    """Device lane of ``get_region_kmer_levels`` over MANY regions
    (motif/valid_poss variants keep the host lane).  Returns one
    {kmer: [(center, sd), ...]} dict per region with >=1 covered site,
    matching the host lane's structure (reference:
    tombo/tombo_stats.py:1242-1360)."""
    from itertools import product

    from . import device_levels
    kmer_width = upstrm_bases + dnstrm_bases + 1
    all_kms = ["".join(b) for b in product("ACGT", repeat=kmer_width)]

    # per-region row prep (subsampling semantics identical to the host
    # lane, reference: tombo/tombo_stats.py:1250-1262)
    reg_rows = []
    for reg_data in regions:
        reads = list(reg_data.reads)
        if cs_cov_thresh is not None:
            r = rng if rng is not None else np.random.default_rng()
            r.shuffle(reads)
            thresh_bases = region_size * cs_cov_thresh
            cumm = np.cumsum([max(rr.end, reg_data.end) -
                              min(rr.start, reg_data.start)
                              for rr in reads])
            sel = np.argmax(cumm >= thresh_bases)
            if cumm.shape[0] and cumm[-1] >= thresh_bases:
                reads = reads[:max(int(sel), 1)]
            reg_data = RegionData(reg_data.chrm, reg_data.strand,
                                  reg_data.start, reg_data.end, reads)
        reg_rows.append(reg_data)

    W = region_size
    out = []
    i = 0
    while i < len(reg_rows):
        # chunk regions by row budget
        chunk = []
        rows = 0
        while i < len(reg_rows) and (not chunk or
                                     rows < rows_budget):
            chunk.append(reg_rows[i])
            rows += len(reg_rows[i].reads)
            i += 1
        out.extend(_chunk_device(chunk, fasta, cov_thresh, upstrm_bases,
                                 dnstrm_bases, est_mean, W, all_kms,
                                 device_levels))
    return [r for r in out if r is not None]


def _chunk_device(chunk, fasta, cov_thresh, upstrm_bases, dnstrm_bases,
                  est_mean, W, all_kms, device_levels):
    kmer_width = upstrm_bases + dnstrm_bases + 1
    rows = []        # (means|None, dev handle|None, m_off, length, ...)
    sub_r0 = []
    sub_r1 = []
    flat_parts = []
    flat_len = 0
    metas = []
    for s_i, reg in enumerate(chunk):
        sub_r0.append(len(rows))
        levels = reg.load_levels_packed()
        for rl in levels:
            r = rl.r_data
            g_lo = max(r.start, reg.start)
            g_hi = min(r.end, reg.end)
            if g_hi <= g_lo:
                continue
            n = g_hi - g_lo
            L = r.end - r.start
            if rl.dev is not None:
                if r.strand == "-":
                    src0, step = L - 1 - (g_lo - r.start), -1
                else:
                    src0, step = g_lo - r.start, 1
                rows.append((None, rl.dev, g_lo - reg.start, n,
                             src0, step))
            else:
                m = rl.means
                if m is None or m.shape[0] != L:
                    continue
                if r.strand == "-":
                    m = m[::-1]
                sl = m[g_lo - r.start:g_hi - r.start]
                rows.append((sl, None, g_lo - reg.start, n, 0, 1))
                flat_parts.append(sl)
                flat_len += n
        sub_r1.append(len(rows))
        metas.append(reg)

    B = len(rows)
    if B == 0:
        return [None] * len(chunk)
    S = len(chunk)
    Bp = _pow2_at_least(max(B, 1), 64)
    C = _pow2_at_least(max(max(b - a for a, b in zip(sub_r0, sub_r1)),
                           1), 16)
    Fp = _pow2_at_least(max(flat_len, 1), 1 << 10)
    flat = np.zeros(Fp, np.float32)
    offs = np.zeros(Bp, np.int32)
    m_off = np.zeros(Bp, np.int32)
    m_len = np.zeros(Bp, np.int32)
    dflag = np.zeros(Bp, np.int32)
    dsrow = np.zeros(Bp, np.int32)
    dscol = np.zeros(Bp, np.int32)
    dstep = np.ones(Bp, np.int32)
    dev_src = None
    any_host = False
    o = 0
    for j, (m, dev, mo, n, src0, step) in enumerate(rows):
        m_off[j], m_len[j] = mo, n
        if dev is not None:
            dev_src = dev[0]
            dflag[j], dsrow[j] = 1, dev[1]
            dscol[j], dstep[j] = src0, step
        else:
            flat[o:o + n] = m
            offs[j] = o
            o += n
            any_host = True
    if dev_src is None:
        dev_src = jnp.zeros((1, 1), jnp.float32)
    r0 = np.zeros(_pow2_at_least(max(S, 1), 8), np.int32)
    r1 = np.zeros_like(r0)
    r0[:S] = sub_r0
    r1[:S] = sub_r1
    center, sd, cnt = _site_stats_kernel(
        jnp.asarray(flat if any_host else flat[:1]), jnp.asarray(offs),
        jnp.asarray(m_off), jnp.asarray(m_len), jnp.asarray(r0),
        jnp.asarray(r1), dev_src, jnp.asarray(dflag),
        jnp.asarray(dsrow), jnp.asarray(dscol), jnp.asarray(dstep),
        W=W, C=C, est_mean=est_mean, any_host=any_host)
    center = np.asarray(center)[:S]
    sd = np.asarray(sd)[:S]
    cnt = np.asarray(cnt)[:S]

    out = []
    for s_i, reg in enumerate(metas):
        covered = cnt[s_i] > cov_thresh
        if not covered.any():
            out.append(None)
            continue
        bb, ab = ((upstrm_bases, dnstrm_bases) if reg.strand == "+"
                  else (dnstrm_bases, upstrm_bases))
        seq_start = reg.start - bb
        seq_end = reg.end + ab
        seq = fasta.get_seq(reg.chrm, max(0, seq_start), seq_end,
                            error_end=False)
        if seq_start < 0:
            seq = "N" * -seq_start + seq
        if len(seq) < seq_end - seq_start:
            seq += "N" * (seq_end - seq_start - len(seq))
        codes = _kmer_codes(seq, kmer_width, reg.strand)   # per window
        # window starting at seq index p covers genome pos p+seq_start..
        # site pos g (region-relative w) has k-mer window starting at
        # w + bb - bb = w (seq index), i.e. codes[w]
        n_sites = min(codes.shape[0], W)
        w_idx = np.flatnonzero(covered[:n_sites])
        c_sites = codes[w_idx]
        keep = c_sites >= 0
        w_idx, c_sites = w_idx[keep], c_sites[keep]
        reg_kmer_levels: Dict[str, list] = {km: [] for km in all_kms}
        if w_idx.size:
            order = np.argsort(c_sites, kind="stable")
            c_sorted = c_sites[order]
            w_sorted = w_idx[order]
            cuts = np.flatnonzero(np.diff(c_sorted)) + 1
            groups = np.split(w_sorted, cuts)
            kcodes = c_sorted[np.concatenate([[0], cuts])]
            cs = center[s_i]
            ss = sd[s_i]
            for kc, g in zip(kcodes, groups):
                reg_kmer_levels[all_kms[kc]] = [
                    (float(cs[w]), float(ss[w])) for w in g]
        out.append(reg_kmer_levels)
    return out
