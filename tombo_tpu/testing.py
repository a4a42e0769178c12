"""Synthetic nanopore data generation for tests and benchmarks.

The reference ships no unit tests and its test data is not distributable
(SURVEY.md §4), so correctness is established with synthetic squiggles:
signal simulated from the bundled k-mer models with known ground-truth
segmentation, run through the full pipeline, and checked for recovery.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from . import config
from .io.fasta import Fasta
from .io.model_io import KmerModel
from .seq import rev_comp


@dataclass
class SyntheticRead:
    read_id: str
    seq: str                   # basecalled (read-oriented) sequence
    raw_signal: np.ndarray     # int16-ish raw DAC-like values
    chrm: str
    strand: str
    start: int                 # 0-based reference start of mapped bases
    end: int
    true_segs: np.ndarray      # ground-truth event boundaries in raw signal
    read_start_rel_to_raw: int


def random_reference(rng: np.random.Generator, length: int = 20000,
                     name: str = "chr_test") -> Fasta:
    seq = "".join(rng.choice(list("ACGT"), length))
    return Fasta(seqs={name: seq})


def simulate_read(
        rng: np.random.Generator, fasta: Fasta, model: KmerModel,
        read_len: int = 800, strand: Optional[str] = None,
        mean_dwell: float = 7.0, noise_sd: float = 0.18,
        adapter_len: Tuple[int, int] = (50, 300),
        dac_scale: float = 60.0, dac_shift: float = 450.0,
        rev_sig: bool = False, read_id: Optional[str] = None
        ) -> SyntheticRead:
    """Simulate one read: per-base levels from the k-mer model, integer
    dwells, Gaussian noise, flanking adapter signal, and DAC-like scaling."""
    chrm = fasta.iter_chrms()[0]
    ref = fasta.get_seq(chrm)
    k, cp = model.kmer_width, model.central_pos
    dn = k - cp - 1

    if strand is None:
        strand = "+" if rng.random() < 0.5 else "-"
    start = int(rng.integers(k, len(ref) - read_len - k))
    end = start + read_len
    if strand == "+":
        read_seq = ref[start:end]
        expanded = ref[start - cp:end + dn]
    else:
        read_seq = rev_comp(ref[start:end])
        expanded = rev_comp(ref[start - dn:end + cp])

    levels, level_sds = model.get_exp_levels_from_seq(expanded)
    assert levels.shape[0] == read_len

    dwells = np.maximum(
        2, rng.poisson(mean_dwell - 2, read_len) + 2).astype(np.int64)
    segs = np.concatenate([[0], np.cumsum(dwells)])
    sig = np.repeat(levels, dwells)
    sig = sig + rng.normal(0, noise_sd, sig.shape[0])

    pre_len = int(rng.integers(*adapter_len))
    post_len = int(rng.integers(*adapter_len))
    pre = rng.normal(levels.mean() + 1.5, 0.8, pre_len)
    post = rng.normal(levels.mean() - 0.5, 0.6, post_len)
    full = np.concatenate([pre, sig, post])

    raw = np.round(full * dac_scale + dac_shift).astype(np.int16)
    if rev_sig:
        # direct RNA: stored 3'->5' (reversed)
        raw = raw[::-1]

    return SyntheticRead(
        read_id=read_id or "read_%06d" % rng.integers(10 ** 6),
        seq=read_seq, raw_signal=raw, chrm=chrm, strand=strand,
        start=start, end=end, true_segs=segs + pre_len,
        read_start_rel_to_raw=pre_len)


def write_synthetic_fast5(path: str, read: SyntheticRead,
                          with_basecalls: bool = True,
                          bc_grp: str = config.DEFAULT_BASECALL_GROUP,
                          bc_subgrp: str = config.DEFAULT_BASECALL_SUBGROUP):
    """Write a single-read FAST5 in the layout the pipeline consumes."""
    import h5py
    with h5py.File(path, "w") as f:
        rg = f.create_group("Raw/Reads/Read_%d" % 1)
        rg.attrs["read_id"] = read.read_id
        rg.create_dataset("Signal", data=read.raw_signal.astype(np.int16))
        cid = f.create_group("UniqueGlobalKey/channel_id")
        cid.attrs["offset"] = 0.0
        cid.attrs["range"] = 1400.0
        cid.attrs["digitisation"] = 8192.0
        cid.attrs["channel_number"] = 1
        cid.attrs["sampling_rate"] = 4000
        f.create_group("Analyses")
        if with_basecalls:
            bc = f.create_group("Analyses/" + bc_grp + "/" + bc_subgrp)
            qual = "#" * len(read.seq)
            fastq = "@%s\n%s\n+\n%s\n" % (read.read_id, read.seq, qual)
            bc.create_dataset(
                "Fastq", data=np.bytes_(fastq.encode()))


def mutate_seq(rng: np.random.Generator, seq: str,
               err: float = 0.05) -> str:
    """Nanopore-like basecall errors: ~50% substitutions, 25% insertions,
    25% deletions at total rate ``err`` (drives the error-prone mapping
    lane; the reference handles such reads through minimap2's alignment,
    reference: tombo/resquiggle.py:1303)."""
    bases = "ACGT"
    out = []
    for c in seq:
        r = rng.random()
        if r < err * 0.5:
            out.append(bases[int(rng.integers(0, 4))])
        elif r < err * 0.75:
            out.append(c)
            out.append(bases[int(rng.integers(0, 4))])
        elif r < err:
            pass
        else:
            out.append(c)
    return "".join(out)


def make_synthetic_dataset(tmpdir: str, n_reads: int = 10, seed: int = 42,
                           ref_len: int = 20000, read_len: int = 800,
                           model: Optional[KmerModel] = None,
                           noisy_frac: float = 0.0,
                           noisy_err: float = 0.05
                           ) -> Tuple[Fasta, List[SyntheticRead], str]:
    """Reference + FAST5 directory of synthetic reads.  Returns
    (fasta, reads, fast5_dir); the reference FASTA is written to tmpdir.

    ``noisy_frac`` > 0 writes that fraction of reads with basecall errors
    (rate ``noisy_err``) in their Fastq slot — the raw signal stays the
    clean simulation, so resquiggle must map them through an error-
    tolerant aligner."""
    import os
    from dataclasses import replace as _dc_replace
    rng = np.random.default_rng(seed)
    if model is None:
        model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    fasta = random_reference(rng, ref_len)
    fast5_dir = os.path.join(tmpdir, "fast5s")
    os.makedirs(fast5_dir, exist_ok=True)
    reads = []
    for i in range(n_reads):
        read = simulate_read(rng, fasta, model, read_len=read_len,
                             read_id="synth_%04d" % i)
        if noisy_frac > 0 and rng.random() < noisy_frac:
            read = _dc_replace(
                read, seq=mutate_seq(rng, read.seq, noisy_err))
        write_synthetic_fast5(
            os.path.join(fast5_dir, read.read_id + ".fast5"), read)
        reads.append(read)
    fasta_fn = os.path.join(tmpdir, "reference.fasta")
    fasta.write(fasta_fn)
    return fasta, reads, fast5_dir


def write_basecaller_events(path: str, read: SyntheticRead,
                            bc_grp: str = config.DEFAULT_BASECALL_GROUP,
                            bc_subgrp: str =
                            config.DEFAULT_BASECALL_SUBGROUP,
                            jitter: int = 0,
                            rng: Optional[np.random.Generator] = None,
                            model: Optional[KmerModel] = None):
    """Add a legacy basecaller-style per-base Events table to a synthetic
    FAST5 (consumed by the event_resquiggle pipeline).  ``jitter`` shifts
    boundaries by up to +-jitter samples to mimic basecaller noise.
    With ``model``, per-event raw means and ``model_state`` k-mers are
    filled (required by pA fitted normalization)."""
    import h5py
    segs = read.true_segs.copy()      # absolute raw-signal positions
    if jitter and rng is not None:
        inner = segs[1:-1] + rng.integers(-jitter, jitter + 1,
                                          segs.shape[0] - 2)
        segs[1:-1] = np.maximum.accumulate(
            np.clip(inner, segs[0] + 1, segs[-1] - 1))
        for i in range(1, segs.shape[0]):
            if segs[i] <= segs[i - 1]:
                segs[i] = segs[i - 1] + 1
    starts = segs[:-1]
    lengths = np.diff(segs)
    n = len(lengths)
    if model is not None:
        raw = read.raw_signal.astype(np.float64)
        # basecaller event means are pA-scaled (offset 0, range 1400,
        # digitisation 8192 as written by write_synthetic_fast5) — the
        # pA fitted normalization composes its correction on that space
        means = np.array([raw[s:e].mean()
                          for s, e in zip(segs[:-1], segs[1:])]) * \
            (1400.0 / 8192.0)
        k, cp = model.kmer_width, model.central_pos
        pad = "A" * cp + read.seq + "A" * (k - cp - 1)
        states = [pad[i:i + k].encode() for i in range(n)]
        rec = np.array(
            list(zip(starts, lengths, means,
                     [b.encode() for b in read.seq], states)),
            dtype=[("start", "u8"), ("length", "u8"), ("mean", "f8"),
                   ("base", "S1"), ("model_state", "S%d" % k)])
    else:
        rec = np.array(
            list(zip(starts, lengths,
                     np.zeros(n),
                     [b.encode() for b in read.seq])),
            dtype=[("start", "u8"), ("length", "u8"), ("mean", "f8"),
                   ("base", "S1")])
    with h5py.File(path, "r+") as f:
        grp = f.require_group("Analyses/" + bc_grp + "/" + bc_subgrp)
        if "Events" in grp:
            del grp["Events"]
        grp.create_dataset("Events", data=rec)
