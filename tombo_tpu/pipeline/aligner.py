"""Genomic alignment engines.

The reference treats minimap2 (via the ``mappy`` python API) as an external
engine (reference: tombo/resquiggle.py:14-21, 2031-2032).  This module keeps
that boundary: an :class:`Aligner` protocol with
* :class:`MappyAligner` — used when ``mappy`` is installed;
* :class:`MinimizerAligner` — the built-in native engine
  (csrc/aligner.cpp): minimizer seeding + anchor chaining + piecewise
  banded alignment, handling real error-prone nanopore basecalls without
  any external dependency;
* :class:`ExactAligner` — exact/seed aligner against an in-memory
  reference, only adequate for synthetic error-free reads (tests, demos).

All produce the same mapping record consumed by map_read().
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..errors import TomboTpuError
from ..io.fasta import Fasta
from ..seq import rev_comp


@dataclass
class Alignment:
    """Minimal alignment record (mappy.Alignment equivalent)."""
    ctg: str
    r_st: int
    r_en: int
    strand: int          # +1 / -1
    q_st: int
    q_en: int
    mlen: int            # matching bases
    blen: int            # alignment block length
    cigar: List[Tuple[int, int]]  # (length, op) with mappy op codes


class MappyAligner:
    """minimap2 via mappy (preset map-ont), when available."""

    def __init__(self, reference_fn: str, preset: str = "map-ont"):
        try:
            import mappy
        except ImportError:
            raise TomboTpuError(
                "mappy is not installed; use ExactAligner or provide "
                "pre-computed mappings")
        self._mappy = mappy
        self.reference_fn = reference_fn
        self.preset = preset
        self.aligner = mappy.Aligner(reference_fn, preset=preset)
        if not self.aligner:
            raise TomboTpuError("Failed to load reference with minimap2")

    def map(self, seq: str) -> Optional[Alignment]:
        try:
            aln = list(self.aligner.map(seq))[0]
        except IndexError:
            return None
        return Alignment(
            ctg=aln.ctg, r_st=aln.r_st, r_en=aln.r_en, strand=aln.strand,
            q_st=aln.q_st, q_en=aln.q_en, mlen=aln.mlen, blen=aln.blen,
            cigar=[(l, op) for l, op in aln.cigar])

    def seq(self, chrm: str, start: int, end: int) -> Optional[str]:
        return self.aligner.seq(chrm, start, end)


class MinimizerAligner:
    """Native minimizer/chain/align engine over an in-memory reference.

    Mapping semantics follow minimap2's map-ont defaults at tombo's level
    of need (best hit only; reference: tombo/resquiggle.py:1303 uses just
    ``next(aligner.map(seq))``): (w,k)-minimizer seeding, gap-cost anchor
    chaining, banded base-level alignment between anchors for the CIGAR.
    Handles error-prone reads (~10-15% errors) on both strands.
    """

    def __init__(self, fasta: Fasta, k: int = 15, w: int = 10,
                 max_occ: int = 200):
        import ctypes

        import numpy as np

        from ..native import get_lib

        lib = get_lib()
        if lib is None or not hasattr(lib, "aln_index_build"):
            raise TomboTpuError(
                "native aligner library unavailable (no C++ toolchain?)")
        self._lib = lib
        self.fasta = fasta
        self._chrms = list(fasta.iter_chrms())
        seqs = [fasta.get_seq(c) for c in self._chrms]
        offsets = np.zeros(len(seqs) + 1, np.int64)
        for i, s in enumerate(seqs):
            offsets[i + 1] = offsets[i] + len(s)
        concat = "".join(seqs).encode()
        self._handle = lib.aln_index_build(
            concat, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(seqs), k, w, max_occ)
        self._ct = ctypes
        self._np = np

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.aln_index_free(self._handle)
                self._handle = None
        except Exception:
            pass

    def map(self, seq: str) -> Optional[Alignment]:
        ct, np = self._ct, self._np
        out = np.zeros(10, np.int64)
        cap = 4096
        while True:
            cig = np.zeros(cap, np.int32)
            n_cig = self._lib.aln_map(
                self._handle, seq.encode(), len(seq),
                out.ctypes.data_as(ct.POINTER(ct.c_int64)),
                cig.ctypes.data_as(ct.POINTER(ct.c_int32)), cap)
            if n_cig == -2:
                cap *= 4
                continue
            break
        if n_cig < 0:
            return None
        cigar = [(int(v) >> 4, int(v) & 0xF) for v in cig[:n_cig]]
        return Alignment(
            ctg=self._chrms[int(out[0])], r_st=int(out[1]),
            r_en=int(out[2]), strand=int(out[5]), q_st=int(out[3]),
            q_en=int(out[4]), mlen=int(out[6]), blen=int(out[7]),
            cigar=cigar)

    def seq(self, chrm: str, start: int, end: int) -> Optional[str]:
        try:
            return self.fasta.get_seq(chrm, start, end, error_end=False)
        except TomboTpuError:
            return None


class ExactAligner:
    """Exact-substring aligner over an in-memory reference.

    Finds the query (or its reverse complement) as an exact substring; falls
    back to seeding with a k-mer prefix and accepting the best candidate by
    Hamming distance.  Adequate for synthetic reads and tests; real noisy
    basecalls require minimap2.
    """

    def __init__(self, fasta: Fasta, seed_len: int = 24):
        self.fasta = fasta
        self.seed_len = seed_len
        self._seed_index = {}
        for chrm in fasta.iter_chrms():
            s = fasta.get_seq(chrm)
            for i in range(0, max(1, len(s) - seed_len + 1)):
                self._seed_index.setdefault(s[i:i + seed_len], []).append(
                    (chrm, i))

    def _find(self, query: str):
        seed = query[:self.seed_len]
        hits = self._seed_index.get(seed, [])
        best = None
        for chrm, pos in hits:
            ref = self.fasta.get_seq(chrm)
            end = pos + len(query)
            if end > len(ref):
                continue
            mism = sum(a != b for a, b in zip(query, ref[pos:end]))
            if best is None or mism < best[3]:
                best = (chrm, pos, end, mism)
        return best

    def map(self, seq: str) -> Optional[Alignment]:
        fwd = self._find(seq)
        rc = self._find(rev_comp(seq))
        if fwd is None and rc is None:
            return None
        use_rc = fwd is None or (rc is not None and rc[3] < fwd[3])
        hit = rc if use_rc else fwd
        chrm, r_st, r_en, mism = hit
        qlen = len(seq)
        return Alignment(
            ctg=chrm, r_st=r_st, r_en=r_en, strand=-1 if use_rc else 1,
            q_st=0, q_en=qlen, mlen=qlen - mism, blen=qlen,
            cigar=[(qlen, 0)])

    def seq(self, chrm: str, start: int, end: int) -> Optional[str]:
        try:
            return self.fasta.get_seq(chrm, start, end, error_end=False)
        except TomboTpuError:
            return None


def open_aligner(reference_fn: str):
    """Prefer minimap2, then the native minimizer engine, then (last
    resort, error-free reads only) the exact aligner."""
    try:
        return MappyAligner(reference_fn)
    except TomboTpuError:
        pass
    try:
        return MinimizerAligner(Fasta(reference_fn))
    except TomboTpuError:
        return ExactAligner(Fasta(reference_fn))
