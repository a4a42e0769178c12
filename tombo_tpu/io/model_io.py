"""K-mer expected-level models (canonical + alternate-base).

TPU-first redesign of the reference's dict-keyed model classes
(reference: tombo/tombo_stats.py:580-1128 ``TomboModel``/``AltModel``):
models are dense float64 arrays indexed by base-4 k-mer code, so expected
levels for a sequence come from one vectorized gather (device-friendly, and
the table — 4^6 * 8B = 32 KiB — is replicated per chip).

Supported on-disk formats:
* ``.npz`` — native tombo_tpu format (dense arrays + metadata)
* ``.model`` HDF5 — the reference Tombo format, dataset ``model`` of
  (kmer, mean, sd) or (kmer, pos, mean, sd) records with attrs
  ``central_pos``/``model_name`` (+ ``alt_base``/``motif``/``mod_pos``)
  (reference writers: tombo/tombo_stats.py:602-621 and :929-953)
* text (nanopolish-style) — whitespace columns kmer/mean/sd
  (reference: tombo/tombo_stats.py:658-684)
"""
from __future__ import annotations

import io as _io
import os
from typing import Dict, Optional, Tuple

import numpy as np

from .. import config
from ..errors import TomboTpuError
from ..seq import (TomboMotif, all_kmers, encode_seq,
                   seq_to_kmer_codes)

STANDARD_MODEL_NAME = "standard"

_MODELS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "models")


def _kmer_strs_to_codes(kmers: np.ndarray, kmer_width: int) -> np.ndarray:
    """Vectorized base-4 codes for an array of k-mer byte strings."""
    flat = np.frombuffer(b"".join(k if isinstance(k, bytes) else
                                  k.encode() for k in kmers),
                         dtype=np.uint8).reshape(len(kmers), kmer_width)
    lut = np.full(256, -1, np.int64)
    for i, b in enumerate(b"ACGT"):
        lut[b] = i
    codes = np.zeros(len(kmers), np.int64)
    for j in range(kmer_width):
        codes = codes * 4 + lut[flat[:, j]]
    return codes


class KmerModel:
    """Canonical k-mer level model.

    Attributes:
        kmer_width: k
        central_pos: base within the k-mer that signal is assigned to
        means, sds: float64 arrays of shape (4**k,)
    """

    def __init__(self, means: np.ndarray, sds: np.ndarray, central_pos: int,
                 name: str = STANDARD_MODEL_NAME,
                 seq_samp_type: Optional[str] = None):
        self.means = np.asarray(means, np.float64)
        self.sds = np.asarray(sds, np.float64)
        n = self.means.shape[0]
        k = int(round(np.log(n) / np.log(4)))
        if 4 ** k != n:
            raise TomboTpuError("Model table size must be a power of 4")
        self.kmer_width = k
        self.central_pos = int(central_pos)
        self.name = name
        self.seq_samp_type = seq_samp_type

    # ------------------------------------------------------------------ IO
    @classmethod
    def load(cls, fn: str, is_text_model: bool = False) -> "KmerModel":
        if is_text_model or fn.endswith((".txt", ".tsv")):
            return cls._load_text(fn)
        if fn.endswith(".npz"):
            return cls._load_npz(fn)
        return cls._load_tombo_h5(fn)

    @classmethod
    def _load_npz(cls, fn: str) -> "KmerModel":
        with np.load(fn, allow_pickle=False) as d:
            return cls(d["means"], d["sds"], int(d["central_pos"]),
                       str(d["model_name"]))

    @classmethod
    def _load_tombo_h5(cls, fn: str) -> "KmerModel":
        import h5py
        with h5py.File(fn, "r") as fp:
            raw = fp["model"][:]
            central_pos = int(fp.attrs["central_pos"])
            name = fp.attrs.get("model_name")
            if isinstance(name, bytes):
                name = name.decode()
        kmer_width = len(raw["kmer"][0])
        codes = _kmer_strs_to_codes(raw["kmer"], kmer_width)
        means = np.full(4 ** kmer_width, np.nan)
        sds = np.full(4 ** kmer_width, np.nan)
        means[codes] = raw["mean"]
        sds[codes] = raw["sd"]
        return cls(means, sds, central_pos, name or STANDARD_MODEL_NAME)

    @classmethod
    def _load_text(cls, fn: str) -> "KmerModel":
        means_d: Dict[str, float] = {}
        sds_d: Dict[str, float] = {}
        with _io.open(fn) as fp:
            for line in fp:
                if line.startswith("#"):
                    continue
                parts = line.split()
                if len(parts) < 3:
                    continue
                try:
                    m, s = float(parts[1]), float(parts[2])
                except ValueError:
                    continue
                means_d[parts[0]] = m
                sds_d[parts[0]] = s
        if not means_d:
            raise TomboTpuError("Invalid text model file: " + fn)
        k = len(next(iter(means_d)))
        means = np.full(4 ** k, np.nan)
        sds = np.full(4 ** k, np.nan)
        for i, kmer in enumerate(all_kmers(k)):
            if kmer in means_d:
                means[i] = means_d[kmer]
                sds[i] = sds_d[kmer]
        return cls(means, sds, config.NANOPOLISH_CENTRAL_POS,
                   STANDARD_MODEL_NAME)

    def save_npz(self, fn: str):
        np.savez(fn, means=self.means, sds=self.sds,
                 central_pos=self.central_pos, model_name=self.name)

    def write_model(self, fn: str):
        """Write in the reference-compatible HDF5 format
        (reference: tombo/tombo_stats.py:602-621)."""
        import h5py
        kmers = all_kmers(self.kmer_width)
        valid = ~np.isnan(self.means)
        rec = np.array(
            [(kmers[i].encode(), self.means[i], self.sds[i])
             for i in range(len(kmers)) if valid[i]],
            dtype=[("kmer", "S" + str(self.kmer_width)),
                   ("mean", "f8"), ("sd", "f8")])
        with h5py.File(fn, "w") as fp:
            fp.create_dataset("model", data=rec, compression="gzip")
            fp.attrs["central_pos"] = self.central_pos
            fp.attrs["model_name"] = STANDARD_MODEL_NAME

    # ------------------------------------------------------------ defaults
    @classmethod
    def load_default(cls, seq_samp_type: str) -> "KmerModel":
        fn = os.path.join(_MODELS_DIR, config.STANDARD_MODELS[seq_samp_type])
        model = cls._load_npz(fn)
        model.seq_samp_type = seq_samp_type
        return model

    @classmethod
    def from_kmer_ref(cls, kmer_ref, central_pos: int,
                      name: str = STANDARD_MODEL_NAME) -> "KmerModel":
        """Build from (kmer, mean, sd) tuples
        (reference: tombo/tombo_stats.py:664-668 kmer_ref branch)."""
        k = len(kmer_ref[0][0])
        codes = _kmer_strs_to_codes(
            np.array([km.encode() for km, _, _ in kmer_ref]), k)
        means = np.full(4 ** k, np.nan)
        sds = np.full(4 ** k, np.nan)
        means[codes] = [m for _, m, _ in kmer_ref]
        sds[codes] = [s for _, _, s in kmer_ref]
        return cls(means, sds, central_pos, name)

    # ----------------------------------------------------------- transform
    def make_constant_sd(self) -> "KmerModel":
        """Set all SDs to the median SD (reference: tombo_stats.py:597-600;
        the default CONST_SD_MODEL behavior)."""
        med = np.nanmedian(self.sds)
        out = KmerModel(self.means, np.full_like(self.sds, med),
                        self.central_pos, self.name, self.seq_samp_type)
        return out

    def center_model(self, shift_corr: float, scale_corr: float
                     ) -> "KmerModel":
        """means <- means*scale_corr + shift_corr
        (reference: tombo_stats.py:587-595)."""
        return KmerModel(self.means * scale_corr + shift_corr, self.sds,
                         self.central_pos, self.name, self.seq_samp_type)

    def reverse_sequence_copy(self) -> "KmerModel":
        """Model for 3'->5' sequence processing: k-mer strings reversed and
        central_pos mirrored (reference: tombo_stats.py:816-832)."""
        k = self.kmer_width
        # permutation rev[c] = code of the reversed k-mer string of code c
        codes = np.arange(4 ** k)
        rev = np.zeros_like(codes)
        tmp = codes.copy()
        for _ in range(k):
            rev = rev * 4 + tmp % 4
            tmp //= 4
        # new[c] = old[rev(c)] since rev is an involution
        return KmerModel(self.means[rev], self.sds[rev],
                         k - self.central_pos - 1, self.name,
                         self.seq_samp_type)

    # -------------------------------------------------------------- lookup
    def get_exp_levels_from_kmer_codes(self, codes: np.ndarray
                                       ) -> Tuple[np.ndarray, np.ndarray]:
        if np.any(codes < 0):
            raise TomboTpuError(
                "Invalid sequence encountered from genome sequence.")
        return self.means[codes], self.sds[codes]

    def get_kmer_codes(self, seq: str, rev_strand: bool = False
                       ) -> np.ndarray:
        """Validated k-mer codes for a sequence: level i is
        ``means[codes[i]]``.  Device stages ship these (L,) int16 codes
        and gather the expected levels from an on-chip copy of the model
        table, instead of uploading two (L,) float rows per read (same
        validation as :meth:`get_exp_levels_from_seq`)."""
        codes = seq_to_kmer_codes(encode_seq(seq), self.kmer_width)
        if rev_strand:
            codes = codes[::-1]
        if np.any(codes < 0):
            raise TomboTpuError(
                "Invalid sequence encountered from genome sequence.")
        return codes

    def get_exp_levels_from_seq(self, seq: str, rev_strand: bool = False
                                ) -> Tuple[np.ndarray, np.ndarray]:
        """Expected levels for a sequence (reference:
        tombo/tombo_stats.py:834-862); level i maps to base
        i + central_pos of ``seq``."""
        codes = self.get_kmer_codes(seq, rev_strand)
        return self.means[codes], self.sds[codes]

    def get_exp_levels_from_seq_with_gaps(self, seq: str, rev_strand: bool
                                          ) -> Tuple[np.ndarray, np.ndarray]:
        """Like get_exp_levels_from_seq but non-ACGT windows produce NaN
        (reference: tombo/tombo_stats.py:886-919)."""
        codes = seq_to_kmer_codes(encode_seq(seq), self.kmer_width)
        means = np.where(codes >= 0, self.means[np.maximum(codes, 0)], np.nan)
        sds = np.where(codes >= 0, self.sds[np.maximum(codes, 0)], np.nan)
        if rev_strand:
            means, sds = means[::-1], sds[::-1]
        return means, sds


class AltModel:
    """Alternate-base k-mer model: levels keyed by (k-mer, alt-base offset).

    Dense layout: arrays of shape (4**k, k); entry [code, pos] is the level
    of k-mer ``code`` with the modified base at 0-based offset ``pos`` within
    the k-mer.  Missing combinations are NaN (the reference returns NaN from
    ``get_exp_level`` on KeyError; reference: tombo_stats.py:1084-1094).
    """

    def __init__(self, means: np.ndarray, sds: np.ndarray, central_pos: int,
                 alt_base: str, name: str, motif: Optional[TomboMotif] = None):
        self.means = np.asarray(means, np.float64)
        self.sds = np.asarray(sds, np.float64)
        self.kmer_width = self.means.shape[1]
        self.central_pos = int(central_pos)
        self.alt_base = alt_base
        self.name = name
        self.motif = motif if motif is not None else TomboMotif(alt_base, 1)

    @classmethod
    def load(cls, fn: str) -> "AltModel":
        if fn.endswith(".npz"):
            return cls._load_npz(fn)
        return cls._load_tombo_h5(fn)

    @classmethod
    def from_kmer_ref(cls, kmer_ref, central_pos: int, alt_base: str,
                      name: str = "alt",
                      motif: Optional[TomboMotif] = None) -> "AltModel":
        """Build from (kmer, pos, level, sd) tuples
        (reference: tombo/tombo_stats.py:957-976 kmer_ref branch)."""
        k = len(kmer_ref[0][0])
        means = np.full((4 ** k, k), np.nan)
        sds = np.full((4 ** k, k), np.nan)
        codes = _kmer_strs_to_codes(
            np.array([km.encode() for km, _, _, _ in kmer_ref]), k)
        for (km, pos, level, sd), code in zip(kmer_ref, codes):
            means[code, pos] = level
            sds[code, pos] = sd
        return cls(means, sds, central_pos, alt_base, name, motif)

    def make_constant_sd(self) -> "AltModel":
        """(reference: tombo/tombo_stats.py:_make_constant_sd)."""
        med = np.nanmedian(self.sds)
        return AltModel(self.means, np.where(np.isnan(self.sds), np.nan,
                                             med),
                        self.central_pos, self.alt_base, self.name,
                        self.motif)

    @classmethod
    def _load_npz(cls, fn: str) -> "AltModel":
        with np.load(fn, allow_pickle=False) as d:
            motif = TomboMotif(str(d["motif"]), int(d["mod_pos"]))
            return cls(d["means"], d["sds"], int(d["central_pos"]),
                       str(d["alt_base"]), str(d["model_name"]), motif)

    @classmethod
    def _load_tombo_h5(cls, fn: str) -> "AltModel":
        import h5py
        with h5py.File(fn, "r") as fp:
            raw = fp["model"][:]
            central_pos = int(fp.attrs["central_pos"])

            def attr(name):
                v = fp.attrs.get(name)
                return v.decode() if isinstance(v, bytes) else v

            name = attr("model_name")
            alt_base = attr("alt_base")
            raw_motif = attr("motif")
            mod_pos = fp.attrs.get("mod_pos")
        kmer_width = len(raw["kmer"][0])
        codes = _kmer_strs_to_codes(raw["kmer"], kmer_width)
        means = np.full((4 ** kmer_width, kmer_width), np.nan)
        sds = np.full((4 ** kmer_width, kmer_width), np.nan)
        means[codes, raw["pos"]] = raw["mean"]
        sds[codes, raw["pos"]] = raw["sd"]
        motif = (TomboMotif(raw_motif, int(mod_pos))
                 if raw_motif is not None and mod_pos is not None else None)
        return cls(means, sds, central_pos, alt_base, name, motif)

    def save_npz(self, fn: str):
        np.savez(fn, means=self.means, sds=self.sds,
                 central_pos=self.central_pos, model_name=self.name,
                 alt_base=self.alt_base, motif=self.motif.raw_motif,
                 mod_pos=self.motif.mod_pos)

    def write_model(self, fn: str):
        """Reference-compatible HDF5 writer
        (reference: tombo/tombo_stats.py:929-953)."""
        import h5py
        k = self.kmer_width
        kmers = all_kmers(k)
        entries = []
        for code in range(4 ** k):
            for pos in range(k):
                if not np.isnan(self.means[code, pos]):
                    entries.append((kmers[code].encode(), pos,
                                    self.means[code, pos],
                                    self.sds[code, pos]))
        rec = np.array(entries, dtype=[
            ("kmer", "S" + str(k)), ("pos", "u4"),
            ("mean", "f8"), ("sd", "f8")])
        with h5py.File(fn, "w") as fp:
            fp.create_dataset("model", data=rec, compression="gzip")
            fp.attrs["central_pos"] = self.central_pos
            fp.attrs["model_name"] = self.name
            fp.attrs["alt_base"] = self.alt_base
            fp.attrs["motif"] = self.motif.raw_motif
            fp.attrs["mod_pos"] = self.motif.mod_pos

    @classmethod
    def load_default(cls, alt_name: str, seq_samp_type: str
                     ) -> Optional["AltModel"]:
        key = seq_samp_type + "_" + alt_name
        fn = config.ALTERNATE_MODELS.get(key)
        if fn is None:
            return None
        path = os.path.join(_MODELS_DIR, fn)
        if not os.path.isfile(path):
            return None
        return cls._load_npz(path)

    def get_exp_level(self, kmer_code: int, pos: int) -> float:
        return float(self.means[kmer_code, pos])

    def get_exp_sd(self, kmer_code: int, pos: int) -> float:
        return float(self.sds[kmer_code, pos])

    def get_exp_levels_from_kmer_codes(self, codes: np.ndarray,
                                       rev_strand: bool = False
                                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Levels across a central base: the tested (alt) base is the last
        base of the first k-mer and walks backwards (reference:
        tombo/tombo_stats.py:1096-1123).  ``codes`` must have length
        ``kmer_width``."""
        k = self.kmer_width
        pos_range = (np.arange(k) if rev_strand
                     else np.arange(k - 1, -1, -1))
        return (self.means[codes, pos_range], self.sds[codes, pos_range])


def load_alt_refs(alt_names, seq_samp_type: str,
                  alt_model_fns=None) -> Dict[str, AltModel]:
    """Load alternate models by name (bundled) or filename
    (reference: tombo/tombo_stats.py:1185-1209 ``load_alt_refs``)."""
    alt_refs: Dict[str, AltModel] = {}
    if alt_model_fns:
        for fn in alt_model_fns:
            ref = AltModel.load(fn)
            if ref.name in alt_refs:
                continue
            alt_refs[ref.name] = ref
    else:
        for alt_name in alt_names:
            ref = AltModel.load_default(alt_name, seq_samp_type)
            if ref is not None:
                alt_refs[alt_name] = ref
    return alt_refs
