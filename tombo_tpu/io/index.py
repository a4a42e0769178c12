"""Reads index: per-(chrm, strand) read metadata with coverage queries.

Behavioral equivalent of the reference's ``TomboReads``
(reference: tombo/tombo_helper.py:1093-1586), writing the same hidden pickle
index file ``.<dir>.<corr_grp>.tombo.index`` with the same 11-tuple record
layout so indices interoperate with the reference tooling, and falling back
to scanning FAST5 corrected groups when the index is missing or corrupt.
"""
from __future__ import annotations

import io
import os
import pickle
import re
from collections import defaultdict
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..config import DEFAULT_CORRECTED_GROUP
from ..errors import TomboTpuError
from ..types import ReadData
from . import fast5 as f5io


def get_index_fn(fast5s_dir: str, corr_grp: str) -> str:
    if fast5s_dir.endswith("/"):
        fast5s_dir = fast5s_dir[:-1]
    head, tail = os.path.split(fast5s_dir)
    return os.path.join(head, "." + tail + "." + corr_grp + ".tombo.index")


class ReadsIndex:
    """Per-(chrm, strand) lists of :class:`ReadData` with lazy coverage."""

    def __init__(self, fast5s_basedirs: Optional[List[str]] = None,
                 corrected_group: str = DEFAULT_CORRECTED_GROUP,
                 basecall_subgroups: Optional[List[str]] = None,
                 for_writing: bool = False, remove_filtered: bool = True,
                 sample_name: Optional[str] = None):
        self.fast5s_dirs: Dict[str, str] = {}
        self.corr_grp = corrected_group
        self.bc_subgrps = basecall_subgroups
        self.sample_name = sample_name
        self.remove_filtered = remove_filtered
        self.for_writing = for_writing
        self.coverage: Optional[Dict[Tuple[str, str], np.ndarray]] = None
        self.reads_index: Dict[Tuple[str, str], List[ReadData]] = \
            defaultdict(list)
        if fast5s_basedirs is None:
            fast5s_basedirs = []
        if for_writing:
            assert len(fast5s_basedirs) == 1, (
                "Must provide a single FAST5 base directory for writing.")
            d = fast5s_basedirs[0]
            d = d if d.endswith("/") else d + "/"
            index_fn = get_index_fn(d, self.corr_grp)
            self.fast5s_dirs[d] = index_fn
            if os.path.exists(index_fn):
                os.remove(index_fn)
        elif fast5s_basedirs:
            self._parse_fast5s(fast5s_basedirs)

    # ------------------------------------------------------------ building
    def add_read_data(self, chrm: str, strand: str, read_data: ReadData):
        self.reads_index[(chrm, strand)].append(read_data)

    def replace_index(self, new_reads_index):
        if sum(len(x) for x in new_reads_index.values()) == 0:
            raise TomboTpuError("Cannot replace with an empty index.")
        self.reads_index = new_reads_index
        self.coverage = None

    def write_index_file(self, shard_suffix: str = ""):
        """Write the pickle index in the reference's record layout
        (reference: tombo/tombo_helper.py:1149-1185).

        ``shard_suffix`` (e.g. ``.host1``) writes a per-host shard beside
        the main index name: multi-host resquiggle runs own disjoint read
        sets, and every reader merges ``<index>.host*`` shards
        (``_parse_fast5s``), so shards never collide on the shared
        filesystem."""
        assert len(self.fast5s_dirs) == 1
        basedir, index_fn = next(iter(self.fast5s_dirs.items()))
        index_fn = index_fn + shard_suffix
        index_data = defaultdict(list)
        for chrm_strand, cs_reads in self.reads_index.items():
            for rd in cs_reads:
                index_data[chrm_strand].append((
                    re.sub(re.escape(basedir), "", rd.fn, 1), rd.start,
                    rd.end, rd.read_start_rel_to_raw,
                    rd.corr_group.split("/")[0],
                    rd.corr_group.split("/")[-1], rd.filtered, rd.rna,
                    rd.sig_match_score, rd.mean_q_score, rd.read_id))
        with io.open(index_fn, "wb") as fp:
            pickle.dump(dict(index_data), fp, protocol=2)

    # ------------------------------------------------------------- parsing
    def _load_index_data(self, fast5s_dir: str,
                         index_fn: Optional[str] = None):
        """Parse the pickle index, accepting the reference's 8/10/11-field
        historical layouts (reference: tombo/tombo_helper.py:1235-1283)."""
        if index_fn is None:
            index_fn = self.fast5s_dirs[fast5s_dir]
        with io.open(index_fn, "rb") as fp:
            raw = pickle.load(fp)
        try:
            n_vals = len(next(iter(raw.values()))[0])
        except StopIteration:
            raise TomboTpuError("Tombo index file appears to be empty")
        if n_vals not in (8, 10, 11):
            raise TomboTpuError("Invalid Tombo index file.")

        out = {}
        for (chrm, strand), cs_raw in raw.items():
            cs_data = []
            for rec in cs_raw:
                (from_base_fn, start, end, rsrtr, c_grp, s_grp, filtered,
                 rna) = rec[:8]
                sig_match_score = rec[8] if n_vals >= 10 else None
                mean_q_score = rec[9] if n_vals >= 10 else None
                read_id = rec[10] if n_vals >= 11 else None
                cs_data.append(ReadData(
                    start, end, filtered, rsrtr, strand,
                    os.path.join(fast5s_dir, from_base_fn),
                    self.corr_grp + "/" + s_grp, rna, sig_match_score,
                    mean_q_score, read_id))
            if cs_data:
                out[(chrm, strand)] = cs_data
        return out

    def _parse_fast5s_wo_index(self, dirs: List[str]):
        """Scan corrected groups directly (index missing/corrupt fallback;
        reference: tombo/tombo_helper.py:1189-1233)."""
        import h5py
        out = defaultdict(list)
        for d in dirs:
            for read_fn in f5io.iter_fast5_reads(d):
                try:
                    with h5py.File(read_fn, "r") as fast5_data:
                        subgrps = (
                            list(fast5_data["/Analyses/" + self.corr_grp])
                            if self.bc_subgrps is None else self.bc_subgrps)
                        for bc_subgrp in subgrps:
                            corr = fast5_data[
                                "/Analyses/" + self.corr_grp + "/" +
                                bc_subgrp]
                            if "Events" not in corr:
                                continue
                            align = dict(corr["Alignment"].attrs.items())
                            chrm = align["mapped_chrom"]
                            strand = align["mapped_strand"]
                            if isinstance(chrm, bytes):
                                chrm = chrm.decode()
                            if isinstance(strand, bytes):
                                strand = strand.decode()
                            rna = bool(corr.attrs.get("rna", False))
                            rsrtr = corr["Events"].attrs[
                                "read_start_rel_to_raw"]
                            read_id = f5io.get_read_id(fast5_data)
                            out[(chrm, strand)].append(ReadData(
                                align["mapped_start"], align["mapped_end"],
                                False, rsrtr, strand, read_fn,
                                self.corr_grp + "/" + bc_subgrp, rna,
                                read_id=read_id))
                except Exception:
                    continue
        return dict(out)

    def _parse_fast5s(self, fast5s_basedirs: List[str]):
        import glob
        wo_index_dirs = []
        merged = defaultdict(list)
        for d in fast5s_basedirs:
            d = d if d.endswith("/") else d + "/"
            self.fast5s_dirs[d] = get_index_fn(d, self.corr_grp)
            # a single-host run writes the plain index; multi-host
            # resquiggle writes disjoint per-host `.host<i>` shards —
            # merge whichever exist
            index_fns = ([self.fast5s_dirs[d]]
                         if os.path.exists(self.fast5s_dirs[d]) else [])
            index_fns += sorted(glob.glob(self.fast5s_dirs[d] + ".host*"))
            if index_fns:
                failed = False
                for index_fn in index_fns:
                    try:
                        parsed = self._load_index_data(d, index_fn)
                    except Exception:
                        failed = True
                        continue
                    for cs, reads in parsed.items():
                        reads = [
                            rd for rd in reads
                            if rd.corr_group.split("/")[0] == self.corr_grp
                            and (self.bc_subgrps is None or
                                 rd.corr_group.split("/")[-1] in
                                 self.bc_subgrps) and
                            (not self.remove_filtered or not rd.filtered)]
                        merged[cs].extend(reads)
                if failed and not merged:
                    wo_index_dirs.append(d)
            else:
                wo_index_dirs.append(d)
        if wo_index_dirs:
            for cs, reads in self._parse_fast5s_wo_index(
                    wo_index_dirs).items():
                merged[cs].extend(reads)
        self.reads_index = {cs: r for cs, r in merged.items() if r}

    # ------------------------------------------------------------ coverage
    def _compute_coverage(self):
        self.coverage = {}
        for cs, cs_reads in self.reads_index.items():
            if not cs_reads:
                continue
            cov = np.zeros(max(rd.end for rd in cs_reads), dtype=np.int64)
            for rd in cs_reads:
                cov[rd.start:rd.end] += 1
            self.coverage[cs] = cov
        return self

    def iter_coverage_regions(self, ctrl_reads_index=None):
        """Yield (chrm, strand, cov_levels, cov_starts) run-length coverage
        (reference: tombo/tombo_helper.py:1430-1456)."""
        if self.coverage is None:
            self._compute_coverage()
        coverage = self.coverage
        if ctrl_reads_index is not None:
            if ctrl_reads_index.coverage is None:
                ctrl_reads_index._compute_coverage()
            merged = {}
            for cs, ctrl_cov in ctrl_reads_index.coverage.items():
                if cs in coverage:
                    a, b = coverage[cs], ctrl_cov
                    if a.shape[0] < b.shape[0]:
                        a, b = b, a
                    m = a.copy()
                    m[:b.shape[0]] += b
                else:
                    m = ctrl_cov.copy()
                merged[cs] = m
            coverage = merged
        for (chrm, strand), cs_cov in coverage.items():
            starts = np.concatenate([
                [0], np.where(np.diff(cs_cov))[0] + 1, [cs_cov.shape[0]]])
            yield chrm, strand, cs_cov[starts[:-1]], starts

    def iter_cov_regs(self, cov_thresh: int, region_size: Optional[int] = None,
                      ctrl_reads_index=None):
        """Iterate regions with coverage >= threshold, optionally snapped to
        region_size blocks (reference: tombo/tombo_helper.py:1457-1484)."""
        for chrm, strand, cov, starts in self.iter_coverage_regions(
                ctrl_reads_index):
            curr_reg_start = -1
            valid_cov = np.where(np.diff(np.concatenate([
                [False], np.greater_equal(cov, cov_thresh), [False]])))[0]
            for cov_start_i, cov_end_i in zip(valid_cov[:-1:2],
                                              valid_cov[1::2]):
                cov_start, cov_end = starts[cov_start_i], starts[cov_end_i]
                if region_size is None:
                    yield chrm, strand, int(cov_start), int(cov_end)
                    continue
                reg0 = int(region_size * np.floor(
                    cov_start / float(region_size)))
                reg1 = int(region_size * np.ceil(cov_end / float(region_size)))
                for reg_start in range(reg0, reg1, region_size):
                    if reg_start != curr_reg_start:
                        yield chrm, strand, reg_start
                        curr_reg_start = reg_start

    # ------------------------------------------------------------- queries
    def get_all_cs(self):
        return list(self.reads_index.keys())

    def is_empty(self) -> bool:
        return all(len(v) == 0 for v in self.reads_index.values())

    def __contains__(self, chrm_strand):
        return chrm_strand in self.reads_index

    def __iter__(self):
        return iter(self.reads_index.items())

    def iter_reads(self) -> Iterator[ReadData]:
        for _, cs_reads in self.reads_index.items():
            for rd in cs_reads:
                yield rd

    def get_cs_reads(self, chrm: str, strand: str, invalid_return=()):
        return self.reads_index.get((chrm, strand), list(invalid_return))

    def _strand_cov(self, chrm, pos, strand, invalid_return):
        cs = (chrm, strand)
        if cs not in self.coverage or pos >= self.coverage[cs].shape[0]:
            return invalid_return
        return int(self.coverage[cs][pos])

    def get_coverage(self, chrm: str, pos: int, strand=None,
                     invalid_return=0):
        if self.coverage is None:
            self._compute_coverage()
        if strand is None:
            return max(self._strand_cov(chrm, pos, "+", invalid_return),
                       self._strand_cov(chrm, pos, "-", invalid_return))
        return self._strand_cov(chrm, pos, strand, invalid_return)

    def get_cs_coverage(self, chrm: str, strand: str, invalid_return=None):
        if self.coverage is None:
            self._compute_coverage()
        return self.coverage.get((chrm, strand), invalid_return)

    def iter_cs_coverage(self):
        if self.coverage is None:
            self._compute_coverage()
        return self.coverage.items()
