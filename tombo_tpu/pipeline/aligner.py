"""Genomic alignment engines.

The reference treats minimap2 (via the ``mappy`` python API) as an external
engine (reference: tombo/resquiggle.py:14-21, 2031-2032).  This module keeps
that boundary: an :class:`Aligner` protocol with
* :class:`MappyAligner` — used when ``mappy`` is installed;
* :class:`ExactAligner` — a built-in exact/seed aligner against an in-memory
  reference, sufficient for synthetic and error-free reads (tests, demos)
  when ``mappy`` is unavailable in the environment.

Both produce the same mapping record consumed by map_read().
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
    """Prefer minimap2, fall back to the built-in exact aligner."""
    try:
        return MappyAligner(reference_fn)
    except TomboTpuError:
        return ExactAligner(Fasta(reference_fn))
