"""Reference FASTA access.

In-memory FASTA wrapper (behavioral equivalent of the reference's
``Fasta`` class, reference: tombo/tombo_helper.py:744-870, which falls back
to in-memory indexing when pyfaidx is unavailable — as in this environment).
"""
from __future__ import annotations

import io
import re
from typing import Dict, List, Optional

from ..errors import TomboTpuError


class Fasta:
    def __init__(self, fasta_fn: Optional[str] = None,
                 seqs: Optional[Dict[str, str]] = None,
                 assume_dna_base: bool = False):
        """Load from file or directly from a dict of sequences."""
        self.fasta_fn = fasta_fn
        if seqs is not None:
            self._index = dict(seqs)
        elif fasta_fn is not None:
            self._index = self._load(fasta_fn)
        else:
            raise TomboTpuError("Fasta requires a filename or sequences")
        self.has_rna_bases = (not assume_dna_base and
                              self._contains_uridines())

    @staticmethod
    def _load(fasta_fn: str) -> Dict[str, str]:
        index: Dict[str, str] = {}
        curr_id, curr_seq = None, []
        with io.open(fasta_fn) as fp:
            for line in fp:
                if line.startswith(">"):
                    if curr_id is not None:
                        index[curr_id] = "".join(curr_seq)
                    curr_seq = []
                    curr_id = line[1:].split()[0]
                else:
                    curr_seq.append(line.strip())
        if curr_id is not None:
            index[curr_id] = "".join(curr_seq)
        return index

    def _contains_uridines(self, n_chrms: int = 10, n_bases: int = 1000
                           ) -> bool:
        for i, chrm in enumerate(self._index):
            if i >= n_chrms:
                break
            if re.search("U", self._index[chrm][:n_bases]):
                return True
        return False

    def get_seq(self, chrm: str, start: Optional[int] = None,
                end: Optional[int] = None, error_end: bool = True) -> str:
        """Extract genome sequence (0-based coordinates, end-exclusive)."""
        try:
            seq = self._index[chrm]
        except KeyError:
            raise TomboTpuError("Sequence record not found: " + chrm)
        if start is None and end is None:
            return seq
        start = max(0, start or 0)
        if error_end and end is not None and end > len(seq):
            raise TomboTpuError(
                "Sequence position past end of record: " + chrm)
        return seq[start:end]

    def get_seq_len(self, chrm: str) -> int:
        try:
            return len(self._index[chrm])
        except KeyError:
            raise TomboTpuError("Sequence record not found: " + chrm)

    def iter_chrms(self) -> List[str]:
        return list(self._index)

    def write(self, fasta_fn: str, width: int = 80):
        with io.open(fasta_fn, "w") as fp:
            for chrm, seq in self._index.items():
                fp.write(">" + chrm + "\n")
                for i in range(0, len(seq), width):
                    fp.write(seq[i:i + width] + "\n")
