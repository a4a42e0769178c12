"""Pre-processing: annotate raw FAST5s with basecalls from FASTQs.

Behavioral port of the reference's preprocess command
(reference: tombo/_preprocess.py:87-533 ``annotate_reads_with_fastq``):
map FASTQ records to raw FAST5 files by read id (optionally via a
sequencing summary), then write each record into
``/Analyses/<basecall_group>/<basecall_subgroup>/Fastq`` so the
re-squiggle command can consume basecalls.
"""
from __future__ import annotations

import io
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Tuple

import h5py

from .errors import TomboTpuError
from .io import fast5 as f5io


def iter_fastq_records(fastq_fns: List[str]) -> Iterator[Tuple[str, str]]:
    """Yield (read_id, 4-line record) from FASTQ files
    (reference: tombo/_preprocess.py:143-186)."""
    for fastq_fn in fastq_fns:
        with io.open(fastq_fn) as fp:
            while True:
                header = fp.readline()
                if not header:
                    break
                seq = fp.readline()
                plus = fp.readline()
                qual = fp.readline()
                if not qual:
                    raise TomboTpuError(
                        "Successfully parsed " + fastq_fn +
                        " before incomplete record")
                if not header.startswith("@") or not plus.startswith("+"):
                    raise TomboTpuError(
                        "Invalid FASTQ record in " + fastq_fn)
                read_id = header[1:].split()[0]
                yield read_id, header + seq + plus + qual


def parse_sequencing_summary(seq_summary_fns: List[str]
                             ) -> Dict[str, str]:
    """read_id -> fast5 filename map from sequencing summary files
    (reference: tombo/_preprocess.py:452-501)."""
    out: Dict[str, str] = {}
    for fn in seq_summary_fns:
        with io.open(fn) as fp:
            header = fp.readline().rstrip().split("\t")
            try:
                fn_i = header.index("filename")
                id_i = header.index("read_id")
            except ValueError:
                raise TomboTpuError(
                    "Sequencing summary file missing filename or read_id "
                    "field: " + fn)
            for line in fp:
                rec = line.rstrip().split("\t")
                out[rec[id_i]] = rec[fn_i]
    return out


def index_fast5s_by_read_id(fast5s_dir: str,
                            num_threads: int = 8) -> Dict[str, str]:
    """Scan a FAST5 directory mapping read id -> path
    (reference: tombo/_preprocess.py:87-140)."""
    fns = list(f5io.iter_fast5_reads(fast5s_dir))

    def one(fn):
        try:
            with h5py.File(fn, "r") as fp:
                return f5io.get_read_id(fp), fn
        except (OSError, TomboTpuError):
            return None

    with ThreadPoolExecutor(num_threads) as pool:
        out = dict(r for r in pool.map(one, fns) if r is not None)
    return out


def annotate_reads_with_fastq(
        fast5s_dir: str, fastq_fns: List[str],
        seq_summary_fns: Optional[List[str]] = None,
        basecall_group: str = "Basecall_1D_000",
        basecall_subgroup: str = "BaseCalled_template",
        overwrite: bool = False, num_threads: int = 8,
        min_parallel_records: int = 200) -> Tuple[int, int]:
    """Write FASTQ records into their raw FAST5s.  Returns
    (n_annotated, n_missing)."""
    if seq_summary_fns:
        fn_map = parse_sequencing_summary(seq_summary_fns)
        id_to_path = {
            rid: os.path.join(fast5s_dir, fn)
            for rid, fn in fn_map.items()
            if os.path.isfile(os.path.join(fast5s_dir, fn))}
    else:
        id_to_path = index_fast5s_by_read_id(fast5s_dir, num_threads)

    n_miss = 0
    jobs: List[Tuple[str, str]] = []
    for read_id, record in iter_fastq_records(fastq_fns):
        path = id_to_path.get(read_id)
        if path is None:
            n_miss += 1
            continue
        jobs.append((path, record))

    # parallel writers over disjoint FAST5 files (the reference uses a
    # producer/consumer multiprocess pipeline, reference:
    # tombo/_preprocess.py:253-450; h5py holds a process-global HDF5
    # lock, so real processes — not threads — are required for write
    # concurrency).  Jobs shard by file path, so no two workers ever
    # touch the same FAST5.
    if num_threads > 1 and len(jobs) >= min_parallel_records:
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor
        shards: List[List[Tuple[str, str]]] = [
            [] for _ in range(num_threads)]
        for path, record in jobs:
            shards[hash(path) % num_threads].append((path, record))
        with ProcessPoolExecutor(
                max_workers=num_threads,
                mp_context=mp.get_context("spawn")) as pool:
            outs = list(pool.map(
                _annotate_shard,
                [(shard, basecall_group, basecall_subgroup, overwrite)
                 for shard in shards if shard]))
        n_ann = sum(a for a, _ in outs)
        n_miss += sum(m for _, m in outs)
        return n_ann, n_miss

    n_ann, miss = _annotate_shard(
        (jobs, basecall_group, basecall_subgroup, overwrite))
    return n_ann, n_miss + miss


def _annotate_shard(args: Tuple) -> Tuple[int, int]:
    """Write one shard of (fast5_path, fastq_record) jobs; shards are
    disjoint by file so writers never contend on one FAST5."""
    jobs, basecall_group, basecall_subgroup, overwrite = args
    n_ann = n_miss = 0
    for path, record in jobs:
        try:
            with h5py.File(path, "r+") as fp:
                bc_path = "/Analyses/" + basecall_group
                if bc_path + "/" + basecall_subgroup + "/Fastq" in fp:
                    if not overwrite:
                        n_miss += 1
                        continue
                    del fp[bc_path + "/" + basecall_subgroup + "/Fastq"]
                grp = fp.require_group(
                    bc_path + "/" + basecall_subgroup)
                grp.create_dataset(
                    "Fastq", data=record,
                    dtype=h5py.special_dtype(vlen=str))
                n_ann += 1
        except OSError:
            n_miss += 1
    return n_ann, n_miss
