"""Sequence utilities: base encoding, k-mer indexing, IUPAC motifs.

TPU-first design note: the reference looks k-mer levels up in Python dicts
keyed by k-mer strings (reference: tombo/tombo_stats.py:853-862).  Here
sequences are encoded once into int8 arrays (A,C,G,T -> 0..3) and k-mers into
base-4 integer codes so expected-level lookup becomes a single device gather
into a ``4**k`` table (see tombo_tpu/io/model_io.py).
"""
from __future__ import annotations

import re
from typing import Iterator, List, Optional

import numpy as np

from .errors import TomboTpuError

BASES = "ACGT"
INVALID_BASES = re.compile("[^ACGT]")
INVALID_BASE_RUNS = re.compile("[^ACGT]+")

# IUPAC single-letter codes (reference: tombo/tombo_helper.py:490-505
# SINGLE_LETTER_CODE used by TomboMotif).
IUPAC_CODES = {
    "A": "A", "C": "C", "G": "G", "T": "T",
    "B": "CGT", "D": "AGT", "H": "ACT", "K": "GT", "M": "AC",
    "N": "ACGT", "R": "AG", "S": "CG", "V": "ACG", "W": "AT", "Y": "CT",
}

_COMP = str.maketrans("ACGTBDHKMNRSVWYacgtbdhkmnrsvwy",
                      "TGCAVHDMKNYSBWRtgcavhdmknysbwr")

# Base-to-code lookup covering the full byte range; invalid bases map to -1.
_BASE_LUT = np.full(256, -1, dtype=np.int8)
for _i, _b in enumerate(BASES):
    _BASE_LUT[ord(_b)] = _i
    _BASE_LUT[ord(_b.lower())] = _i


def rev_comp(seq: str) -> str:
    """Reverse complement (reference: tombo/tombo_helper.py:375-378)."""
    return seq.translate(_COMP)[::-1]


def comp(seq: str) -> str:
    return seq.translate(_COMP)


def rev_transcribe(seq: str) -> str:
    """RNA U -> DNA T (reference: tombo/tombo_helper.py:384-386)."""
    return seq.replace("U", "T").replace("u", "t")


def invalid_seq(seq: str) -> bool:
    """True if sequence contains non-ACGT characters
    (reference: tombo/tombo_helper.py:380-381)."""
    return bool(INVALID_BASES.search(seq))


def encode_seq(seq: str) -> np.ndarray:
    """Encode an ACGT string into int8 codes 0..3; non-ACGT become -1."""
    return _BASE_LUT[np.frombuffer(seq.encode("ascii"), dtype=np.uint8)]


def decode_seq(codes: np.ndarray) -> str:
    out = np.full(codes.shape[0], ord("N"), dtype=np.uint8)
    valid = codes >= 0
    out[valid] = np.frombuffer(BASES.encode(), dtype=np.uint8)[codes[valid]]
    return out.tobytes().decode("ascii")


def seq_to_kmer_codes(seq_codes: np.ndarray, kmer_width: int) -> np.ndarray:
    """Base-4 integer code of every k-mer in an encoded sequence.

    ``out[i]`` encodes ``seq[i:i+k]`` with the first base most significant
    (matching string lexicographic order, so ``codes`` index a table built
    over ``itertools.product('ACGT', repeat=k)``).  Windows containing an
    invalid base get code -1.

    Replaces the reference's per-k-mer string slicing + dict lookup
    (reference: tombo/tombo_helper.py:526-540 ``get_seq_kmers``).
    """
    n = seq_codes.shape[0] - kmer_width + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    codes = np.zeros(n, dtype=np.int64)
    valid = np.ones(n, dtype=bool)
    for j in range(kmer_width):
        window = seq_codes[j:j + n]
        codes = codes * 4 + np.maximum(window, 0).astype(np.int64)
        valid &= window >= 0
    codes[~valid] = -1
    return codes


def kmer_code_to_str(code: int, kmer_width: int) -> str:
    out = []
    for _ in range(kmer_width):
        out.append(BASES[code % 4])
        code //= 4
    return "".join(reversed(out))


def all_kmers(kmer_width: int) -> List[str]:
    return [kmer_code_to_str(c, kmer_width)[::1]
            for c in _ordered_codes(kmer_width)]


def _ordered_codes(kmer_width: int) -> range:
    return range(4 ** kmer_width)


def get_mean_q_score(read_q: str, phred_base: int = 33) -> float:
    """Mean basecall q-score from a FASTQ quality string
    (reference: tombo/tombo_helper.py:368-373)."""
    return float(np.mean([ord(c) - phred_base for c in read_q]))


class TomboMotif:
    """IUPAC motif with a marked modified position.

    Behavioral equivalent of the reference motif engine
    (reference: tombo/tombo_helper.py:542-640 ``TomboMotif``): compiles the
    raw IUPAC motif to forward and reverse-complement regular expressions and
    exposes overlapped searching over genome sequence.
    """

    def __init__(self, raw_motif: str, mod_pos: Optional[int] = None):
        raw_motif = raw_motif.upper()
        invalid = [b for b in raw_motif if b not in IUPAC_CODES]
        if invalid:
            raise TomboTpuError(
                "Invalid IUPAC code(s) in motif: " + "".join(invalid))
        self.raw_motif = raw_motif
        self.motif_len = len(raw_motif)
        # 1-based modified position within the motif (as in the reference).
        self.mod_pos = mod_pos
        self.motif_pat = self._compile(raw_motif)
        self.rev_comp_pat = self._compile(rev_comp(raw_motif))
        self.is_palindrome = raw_motif == rev_comp(raw_motif)
        if mod_pos is not None:
            self.mod_base = raw_motif[mod_pos - 1]
        else:
            self.mod_base = None

    @staticmethod
    def _compile(motif: str) -> "re.Pattern":
        expanded = "".join(
            b if len(IUPAC_CODES[b]) == 1 else "[" + IUPAC_CODES[b] + "]"
            for b in motif)
        # plain (non-overlapping finditer) pattern, matching the
        # reference's scan semantics everywhere — including dense motifs
        # whose occurrences can overlap (reference:
        # tombo/tombo_helper.py:556-563, :695-696; verified A/B in
        # tests/test_reference_parity.py::test_tombo_motif_parity)
        return re.compile(expanded)

    def matches_seq(self, seq: str) -> bool:
        return self.motif_pat.search(seq) is not None

    def iter_matches(self, seq: str, rev_strand: bool = False
                     ) -> Iterator[int]:
        """Yield 0-based match start offsets of the (strand-oriented) motif."""
        pat = self.rev_comp_pat if rev_strand else self.motif_pat
        for m in pat.finditer(seq):
            yield m.start()

    def find_mod_poss(self, seq: str) -> List[int]:
        """1-based positions of the modified base within forward-strand
        matches of the motif in ``seq``, including partial matches hanging
        off either end of the sequence that still place the modified base
        inside it (reference: tombo/tombo_helper.py:672-707)."""
        poss = set()
        L, ml, mp = len(seq), self.motif_len, self.mod_pos
        if L >= ml:
            for m in self.motif_pat.finditer(seq):
                poss.add(m.start() + mp)
        else:
            # seq shorter than the motif: slide the motif over the seq
            for off in range(ml - L + 1):
                if 1 <= mp - off <= L and re.match(
                        self._compile(self.raw_motif[off:off + L]).pattern,
                        seq):
                    poss.add(mp - off)
        # motif hanging off the start: its length-sl suffix matches seq[:sl]
        for sl in range(1, min(L + 1, ml)):
            off = ml - sl
            smp = mp - off
            if 1 <= smp <= sl and re.match(
                    self._compile(self.raw_motif[off:]).pattern, seq[:sl]):
                poss.add(smp)
        # motif hanging off the end: its length-el prefix matches seq[-el:]
        for el in range(1, min(L + 1, ml)):
            if mp <= el and re.match(
                    self._compile(self.raw_motif[:el]).pattern, seq[-el:]):
                poss.add(L - el + mp)
        return sorted(poss)

    def __repr__(self):
        return "TomboMotif({!r}, mod_pos={})".format(
            self.raw_motif, self.mod_pos)


def expand_motif_kmers(motif: str) -> List[str]:
    """All concrete ACGT sequences matching an IUPAC motif."""
    seqs = [""]
    for b in motif.upper():
        opts = IUPAC_CODES[b]
        seqs = [s + o for s in seqs for o in opts]
    return seqs
