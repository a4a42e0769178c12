"""Re-squiggle orchestration: FAST5 directories in, corrected groups +
index out.

TPU-first replacement for the reference's N-process x M-thread CPU fan-out
(reference: tombo/resquiggle.py:1859-1948 ``resquiggle_all_reads``): a
thread pool performs FAST5 I/O and mapping (host), batches of mapped reads
stream through the device lane (pipeline/batch.py), and writeback + indexing
happen on the host.  Failure taxonomy matches the reference: every per-read
error is recorded (FAST5 status attr + failed-read list) and the run
continues (SURVEY.md §5.3).
"""
from __future__ import annotations

import os
from collections import Counter
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from .. import config
from ..errors import TomboTpuError
from ..io import fast5 as f5io
from ..io.index import ReadsIndex
from ..io.model_io import KmerModel
from ..types import ReadData, ResquiggleResults, SeqSampleType
from . import resquiggle as rsq
from .batch import BatchedResquiggler


@dataclass
class RunConfig:
    corrected_group: str = config.DEFAULT_CORRECTED_GROUP
    basecall_group: str = config.DEFAULT_BASECALL_GROUP
    basecall_subgroups: Tuple[str, ...] = (
        config.DEFAULT_BASECALL_SUBGROUP,)
    overwrite: bool = False
    ignore_read_locks: bool = False
    q_score_thresh: float = 0.0
    signal_length_range: Optional[Tuple[int, int]] = None
    sequence_length_range: Optional[Tuple[int, int]] = None
    sig_match_thresh: Optional[float] = None
    obs_filter: Optional[List[Tuple[float, float]]] = None
    batch_size: int = 64
    num_io_threads: int = 8
    progress: bool = False
    skip_index: bool = False
    compute_sd: bool = False
    dry_run: bool = False
    max_scaling_iters: int = config.MAX_SCALING_ITERS
    outlier_thresh: float = config.OUTLIER_THRESH
    # multi-chip: a jax.sharding.Mesh with a "reads" axis; batches shard
    # data-parallel across it (parallel/mesh.py) and batch_size is
    # interpreted per device
    mesh: Optional[object] = None
    # multi-host: a parallel.distributed.DistContext; this host processes
    # only its hash shard of the FAST5 files (disjoint writeback + index
    # shards across hosts)
    dist: Optional[object] = None
    # --fixed-scale / --fit-global-scale (reference:
    # tombo/_option_parsers.py:457-464, tombo/tombo_stats.py:452-476)
    const_scale: Optional[float] = None
    fit_global_scale: bool = False
    # --skip-sequence-rescaling (reference: tombo/_option_parsers.py:465)
    skip_seq_rescaling: bool = False
    # --failed-reads-filename / --num-most-common-errors (reference:
    # tombo/_option_parsers.py:83-85,371-374)
    failed_reads_fn: Optional[str] = None
    num_most_common_errors: int = 0
    # FAST5 writeback worker processes (sharded by path, so no two
    # processes touch one file).  None = auto: 2 processes when the run
    # is large enough to amortize their spawn cost, else inline.
    num_write_procs: Optional[int] = None


@dataclass
class RunSummary:
    n_success: int = 0
    n_failed: int = 0
    failure_modes: Counter = field(default_factory=Counter)

    def as_dict(self):
        return dict(n_success=self.n_success, n_failed=self.n_failed,
                    failure_modes=dict(self.failure_modes))


# --------------------------------------------------------------------------
# Sharded FAST5 writeback processes.  Writing thousands of small HDF5
# groups is GIL + h5py-lock bound and sat serially on the batch-consume
# loop; dedicating processes to it keeps the pipeline's critical path free
# (reference analog: the dedicated writer processes of
# tombo/resquiggle.py:1828 and tombo/tombo_stats.py:4448).  Jobs shard by
# path CRC so no two processes ever open the same file.

def _writer_proc_main(q, err_q, ack_q, shard_tag):
    import os as _os
    from ..io import fast5 as _f5
    from ..stats import levels_cache as _lc
    builders = {}

    def sidecar_add(fn, res, cg, norm_means):
        """Append the just-written read to the directory's levels
        sidecar shard, so first-run detection never re-opens FAST5s
        (round-4 task: cold-run detection io_frac; each writer process
        owns one `.w<i>` shard so no two writers share a file)."""
        group = cg + "/" + res.align_info.subgroup
        dirpath = _os.path.dirname(fn) or "."
        b = builders.get((dirpath, group), False)
        if b is False:
            path = _lc.cache_fn(dirpath, group) + ".w%s" % shard_tag
            try:
                b = _lc.LevelsCacheBuilder(path)
            except OSError:
                b = None
            builders[(dirpath, group)] = b
        if b is None:
            return
        st = _os.stat(fn)
        rid = res.align_info.read_id if res.align_info else ""
        b.add(fn, group, rid, st.st_mtime_ns, st.st_size, norm_means,
              res.genome_seq, replace=True)

    while True:
        job = q.get()
        if job is None:
            break
        if job[0] == 1:                    # flush barrier: echo the token
            for b in builders.values():
                if b is not None:
                    b.flush()
            ack_q.put(job[1])
            continue
        _, fn, res, cg, csd, rna, rp, sidecar = job
        try:
            norm_means = _f5.write_new_fast5_group(
                fn, cg, res, "median", csd, rna=rna, resolved_params=rp)
            if sidecar and _lc.enabled():
                try:
                    sidecar_add(fn, res, cg, norm_means)
                except Exception:  # noqa: BLE001 — cache is best-effort
                    pass
        except Exception:  # noqa: BLE001 — reported via err_q
            err_q.put((fn, res.align_info.subgroup))


class _ShardedWriters:
    def __init__(self, n: int):
        import multiprocessing as mp
        ctx = mp.get_context("spawn")    # fork with live h5py/jax threads
        self.qs = [ctx.Queue(maxsize=512) for _ in range(n)]
        self.err_q = ctx.Queue()
        self.ack_q = ctx.Queue()
        self.procs = [
            ctx.Process(target=_writer_proc_main,
                        args=(qq, self.err_q, self.ack_q, str(i)),
                        daemon=True)
            for i, qq in enumerate(self.qs)]
        for p in self.procs:
            p.start()
        self._token = 0

    def alive(self) -> bool:
        return all(p.is_alive() for p in self.procs)

    def submit(self, fn: str, res, corrected_group: str, compute_sd: bool,
               rna: bool, resolved_params, sidecar: bool = True):
        import zlib
        shard = zlib.crc32(fn.encode()) % len(self.qs)
        self.qs[shard].put((0, fn, res, corrected_group, compute_sd, rna,
                            resolved_params, sidecar))

    def flush(self) -> List[Tuple[str, str]]:
        """Barrier: wait until every submitted write completed; return
        and clear the accumulated (fn, subgroup) write failures."""
        self._token += 1
        for qq in self.qs:
            qq.put((1, self._token))
        seen = 0
        while seen < len(self.qs):
            if self.ack_q.get() == self._token:
                seen += 1
        errs = []
        while True:
            try:
                errs.append(self.err_q.get_nowait())
            except Exception:  # noqa: BLE001 — queue.Empty
                break
        return errs


_INLINE_BUILDERS: dict = {}


def _sidecar_add_inline(fn: str, res, cg: str, norm_means):
    """Inline-writeback sidecar append (shard tag 'm': never collides
    with the writer processes' numeric shards)."""
    from ..stats import levels_cache as _lc
    if not _lc.enabled():
        return
    try:
        group = cg + "/" + res.align_info.subgroup
        dirpath = os.path.dirname(fn) or "."
        b = _INLINE_BUILDERS.get((dirpath, group), False)
        if b is False:
            b = _lc.LevelsCacheBuilder(
                _lc.cache_fn(dirpath, group) + ".wm")
            _INLINE_BUILDERS[(dirpath, group)] = b
        st = os.stat(fn)
        rid = res.align_info.read_id if res.align_info else ""
        b.add(fn, group, rid, st.st_mtime_ns, st.st_size, norm_means,
              res.genome_seq, replace=True)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


def _flush_inline_builders():
    for b in _INLINE_BUILDERS.values():
        if b is not None:
            try:
                b.flush()
            except Exception:  # noqa: BLE001
                pass


_WRITE_POOL: Optional[_ShardedWriters] = None


def _get_write_pool(n: int) -> Optional[_ShardedWriters]:
    """Process-wide writer pool (spawn cost ~seconds, paid once)."""
    global _WRITE_POOL
    if _WRITE_POOL is None or len(_WRITE_POOL.qs) != n \
            or not _WRITE_POOL.alive():
        try:
            _WRITE_POOL = _ShardedWriters(n)
        except Exception:  # noqa: BLE001 — no mp support: inline writes
            _WRITE_POOL = None
    return _WRITE_POOL


def _load_and_map_one(fast5_fn: str, aligner, std_ref,
                      seq_samp_type: SeqSampleType, rc: RunConfig,
                      rsqgl_params, bc_subgrp: str):
    """Host I/O + mapping for one (read, basecall subgroup) unit; mirrors
    reference: tombo/resquiggle.py:1385-1481 ``_io_and_map_read``."""
    import h5py
    with h5py.File(fast5_fn, "r") as fast5_data:
        raw = f5io.get_raw_signal(fast5_data)
        if not (rc.signal_length_range is None or
                rc.signal_length_range[0] < raw.shape[0] <
                rc.signal_length_range[1]):
            raise TomboTpuError("Raw signal not within --signal-length-range")
        seq_data = f5io.get_read_seq(
            fast5_data, rc.basecall_group, bc_subgrp,
            seq_samp_type.name == config.RNA_SAMP_TYPE, rc.q_score_thresh)
    map_res = rsq.map_read(seq_data, aligner, std_ref, seq_samp_type,
                           bc_subgrp, rc.sequence_length_range)
    if invalid := _invalid_seq(map_res.genome_seq):
        raise TomboTpuError(
            "Reference mapping contains non-canonical bases")
    map_res = map_res.replace(raw_signal=raw.astype(np.float64))
    map_res = rsq.adjust_map_res(map_res, seq_samp_type, rsqgl_params)
    return map_res


def _invalid_seq(seq: str) -> bool:
    from ..seq import invalid_seq
    return invalid_seq(seq)


def estimate_global_scale(fast5_fns, num_reads=None) -> float:
    """Median of per-read raw-signal MADs over a shuffled subset
    (reference: tombo/tombo_stats.py:452-476 ``estimate_global_scale``)."""
    import h5py
    num_reads = num_reads or config.NUM_READS_FOR_SCALE
    fns = list(fast5_fns)
    np.random.shuffle(fns)
    mads = []
    for fn in fns:
        try:
            with h5py.File(fn, "r") as fp:
                sig = f5io.get_raw_signal(fp)
            shift = np.median(sig)
            mads.append(np.median(np.abs(sig - shift)))
        except (OSError, TomboTpuError):
            continue
        if len(mads) >= num_reads:
            break
    if not mads:
        raise TomboTpuError(
            "No reads available to estimate the global scale parameter")
    return float(np.median(mads))


def resquiggle_all_reads(
        fast5s_dir: str, aligner, std_ref: KmerModel,
        seq_samp_type: SeqSampleType, rsqgl_params,
        rc: Optional[RunConfig] = None,
        resquiggler: Optional[BatchedResquiggler] = None
        ) -> Tuple[RunSummary, Optional[ReadsIndex]]:
    """Re-squiggle every FAST5 under ``fast5s_dir``.

    Returns (summary, reads_index or None if skip_index).
    """
    rc = rc or RunConfig()
    sig_match_thresh = (rc.sig_match_thresh if rc.sig_match_thresh is not None
                        else config.SIG_MATCH_THRESH[seq_samp_type.name])
    # output provenance: record the fully-resolved parameter set in every
    # corrected group (SURVEY §5.6 TPU-equivalent reproducibility note)
    resolved_json = config.resolved_params_json(
        rsqgl_params,
        seq_sample_type=seq_samp_type.name,
        sig_match_thresh=float(sig_match_thresh),
        outlier_thresh=rc.outlier_thresh,
        max_scaling_iters=rc.max_scaling_iters,
        q_score_thresh=rc.q_score_thresh,
        const_scale=rc.const_scale,
        skip_seq_rescaling=rc.skip_seq_rescaling,
        compute_sd=rc.compute_sd)
    lock_fns = f5io.lock_dirs([fast5s_dir], rc.ignore_read_locks)
    summary = RunSummary()
    reads_index = (None if rc.skip_index else
                   ReadsIndex([fast5s_dir],
                              corrected_group=rc.corrected_group,
                              for_writing=True))
    failed_fp = (open(rc.failed_reads_fn, "w")
                 if rc.failed_reads_fn else None)

    def record_failure(fn, err):
        summary.n_failed += 1
        summary.failure_modes[err] += 1
        if failed_fp is not None:
            failed_fp.write("%s\t%s\n" % (err, fn))

    try:
        if resquiggler is None:
            const_scale = rc.const_scale
            if const_scale is None and rc.fit_global_scale:
                const_scale = estimate_global_scale(
                    f5io.iter_fast5_reads(fast5s_dir))
            resquiggler = BatchedResquiggler(
                std_ref, rsqgl_params, seq_samp_type, rc.outlier_thresh,
                mesh=rc.mesh, const_scale=const_scale,
                skip_seq_scaling=rc.skip_seq_rescaling)
        if resquiggler.n_dev > 1:
            # batch_size is per device: feed n_dev-times-larger chunks so
            # every mesh shard stays full
            rc = RunConfig(**{**rc.__dict__,
                              "batch_size":
                              rc.batch_size * resquiggler.n_dev})

        all_fns = list(f5io.iter_fast5_reads(fast5s_dir))
        if rc.dist is not None and rc.dist.n_hosts > 1:
            # deterministic host shard of the read files (the multi-host
            # analog of the reference's file work queue, reference:
            # tombo/resquiggle.py:1851-1857); FAST5 writeback and the
            # index shard stay host-local and disjoint
            from ..parallel.distributed import read_shard
            all_fns = [fn for fn in all_fns
                       if read_shard(os.path.basename(fn),
                                     rc.dist.n_hosts) == rc.dist.host_id]

        # --- threaded host stage: prep + read + map. One work unit per
        # (FAST5 file, basecall subgroup), matching the reference's
        # all-subgroup iteration (reference: tombo/resquiggle.py:1612-1656).
        def map_worker(fn):
            from .batch import STAGE_TIMINGS, _profiling
            import time as _t
            _t0 = _t.perf_counter()
            try:
                return _map_worker_inner(fn)
            finally:
                if _profiling():
                    STAGE_TIMINGS["io_map"] += _t.perf_counter() - _t0

        def _map_worker_inner(fn):
            try:
                if not rc.dry_run:
                    f5io.prep_fast5(fn, rc.corrected_group, rc.overwrite,
                                    rc.basecall_group)
            except TomboTpuError as e:
                return [(fn, rc.basecall_subgroups[0], None, str(e))]
            except Exception as e:
                return [(fn, rc.basecall_subgroups[0], None,
                         "Unexpected error: " + repr(e))]
            units = []
            for subgrp in rc.basecall_subgroups:
                try:
                    mr = _load_and_map_one(fn, aligner, std_ref,
                                           seq_samp_type, rc, rsqgl_params,
                                           subgrp)
                    units.append((fn, subgrp, mr, None))
                except TomboTpuError as e:
                    units.append((fn, subgrp, None, str(e)))
                except Exception as e:  # unexpected: record, don't crash
                    units.append((fn, subgrp, None,
                                  "Unexpected error: " + repr(e)))
            return units

        # --- streaming pipeline: the ingest stage feeds device batches.
        # h5py serializes all HDF5 calls behind one process-global lock,
        # so the parallel lane is a spawned PROCESS pool (pipeline/
        # ingest.py; ~4x the per-read ingest throughput of threads);
        # threads remain the fallback for small runs, unpicklable
        # aligners, or missing mp support (reference analog: the
        # N-process x M-thread fan-out, tombo/resquiggle.py:1859-1948).
        from concurrent.futures import ThreadPoolExecutor
        map_pool = None
        ingest_pool = None
        n_units = len(all_fns) * len(rc.basecall_subgroups)
        if n_units >= int(os.environ.get("TOMBO_TPU_INGEST_MIN", "256")):
            from .ingest import get_ingest_pool
            n_ing = int(os.environ.get(
                "TOMBO_TPU_INGEST_PROCS",
                str(max(2, min(6, (os.cpu_count() or 4) - 1)))))
            ingest_pool = get_ingest_pool(
                n_ing, aligner, std_ref, seq_samp_type, rsqgl_params, rc)
        if ingest_pool is not None:
            map_iter = ingest_pool.run(all_fns)
        else:
            map_pool = ThreadPoolExecutor(max_workers=rc.num_io_threads)
            map_iter = map_pool.map(map_worker, all_fns)

        chunks: List[List[Tuple[str, ResquiggleResults]]] = []

        def iter_chunks():
            # length-bucket within a sliding window of a few batches so
            # padded device shapes stay tight on mixed-length datasets
            window: List[Tuple[str, ResquiggleResults]] = []
            # 2 batches of look-ahead: enough spread for length
            # bucketing without serializing ingest against the device
            # on short runs
            window_cap = rc.batch_size * 2

            def drain(n_batches):
                window.sort(key=lambda t: t[1].raw_signal.shape[0])
                for _ in range(n_batches):
                    chunk, rest = (window[:rc.batch_size],
                                   window[rc.batch_size:])
                    del window[:]
                    window.extend(rest)
                    if chunk:
                        chunks.append(chunk)
                        yield [mr for _, mr in chunk]

            for units in map_iter:
                for fn, subgrp, mr, err in units:
                    if err is not None:
                        record_failure(fn, err)
                        _write_status(fn, rc, subgrp, err)
                        continue
                    window.append((fn, mr))
                    if len(window) >= window_cap:
                        yield from drain(1)
            while window:
                yield from drain(1)

        # --- writer processes: auto-on for runs large enough to amortize
        # their one-time spawn cost; inline writeback otherwise
        n_wp = rc.num_write_procs
        if n_wp is None:
            n_wp = 3 if n_units >= 256 else 0
        writers = (_get_write_pool(n_wp)
                   if n_wp > 0 and not rc.dry_run else None)
        pending_adds: List[tuple] = []   # deferred index adds (async writes)

        # --- device-batched resquiggle + writeback
        bar = None
        if rc.progress:
            try:
                from tqdm import tqdm
                bar = tqdm(total=len(all_fns) * len(rc.basecall_subgroups),
                           smoothing=0, desc="Re-squiggling reads")
            except ImportError:
                pass
        for chunk_i, results in enumerate(
                resquiggler.resquiggle_batches(
                    iter_chunks(), pipeline_depth=3,
                    max_scaling_iters=rc.max_scaling_iters)):
            chunk = chunks[chunk_i]
            if bar is not None:
                bar.update(len(chunk))
            if (rc.num_most_common_errors > 0 and bar is not None and
                    summary.failure_modes):
                # live most-common-failures display (reference:
                # tombo/resquiggle.py:1707-1740)
                top = summary.failure_modes.most_common(
                    rc.num_most_common_errors)
                bar.set_postfix_str("; ".join(
                    "%d %.40s" % (c, m) for m, c in top), refresh=False)
            for (fn, mr), (res, err) in zip(chunk, results):
                if err is not None:
                    record_failure(fn, err)
                    _write_status(fn, rc, mr.align_info.subgroup, err)
                    continue
                try:
                    if not rc.dry_run:
                        # sidecar building: single-host only (the cache
                        # lives beside possibly-shared data)
                        sidecar_on = rc.dist is None or rc.dist.n_hosts <= 1
                        if writers is not None:
                            writers.submit(
                                fn, res, rc.corrected_group, rc.compute_sd,
                                seq_samp_type.rev_sig, resolved_json,
                                sidecar=sidecar_on)
                        else:
                            import time as _t
                            _t0 = _t.perf_counter()
                            norm_means = f5io.write_new_fast5_group(
                                fn, rc.corrected_group, res, "median",
                                rc.compute_sd, rna=seq_samp_type.rev_sig,
                                resolved_params=resolved_json)
                            if sidecar_on:
                                _sidecar_add_inline(
                                    fn, res, rc.corrected_group,
                                    norm_means)
                            from .batch import STAGE_TIMINGS, _profiling
                            if _profiling():
                                STAGE_TIMINGS["writeback"] += (
                                    _t.perf_counter() - _t0)
                except Exception as e:
                    record_failure(fn, "FAST5 write error")
                    continue
                summary.n_success += 1
                if reads_index is not None:
                    is_filtered = False
                    if res.sig_match_score > sig_match_thresh:
                        is_filtered = True
                        summary.failure_modes[
                            "Poor raw to expected signal matching "
                            "(revert with `filter clear_filters`)"] += 1
                    elif rc.obs_filter:
                        base_lens = np.diff(res.segs)
                        is_filtered = any(
                            np.percentile(base_lens, pctl) > thresh
                            for pctl, thresh in rc.obs_filter)
                    mapped_end = res.genome_loc.start + len(res.segs) - 1
                    rd = ReadData(
                        res.genome_loc.start, mapped_end, is_filtered,
                        res.read_start_rel_to_raw,
                        res.genome_loc.strand, fn,
                        rc.corrected_group + "/" +
                        res.align_info.subgroup,
                        seq_samp_type.rev_sig, res.sig_match_score,
                        res.mean_q_score, res.align_info.read_id)
                    if writers is not None:
                        # index adds wait for write confirmation (flush)
                        pending_adds.append(
                            ((fn, res.align_info.subgroup),
                             res.genome_loc.chrom, res.genome_loc.strand,
                             rd))
                    else:
                        reads_index.add_read_data(
                            res.genome_loc.chrom, res.genome_loc.strand,
                            rd)

        if writers is not None:
            import time as _t
            _t0 = _t.perf_counter()
            werrs = writers.flush()
            from .batch import STAGE_TIMINGS, _profiling
            if _profiling():
                STAGE_TIMINGS["writeback"] += _t.perf_counter() - _t0
            failed_keys = set(werrs)
            for wfn, wsub in werrs:
                record_failure(wfn, "FAST5 write error")
                _write_status(wfn, rc, wsub, "FAST5 write error")
                summary.n_success -= 1
            for key, chrm, strand, rd in pending_adds:
                if key not in failed_keys and reads_index is not None:
                    reads_index.add_read_data(chrm, strand, rd)

        if map_pool is not None:
            map_pool.shutdown(wait=True)
        _flush_inline_builders()
        if bar is not None:
            bar.close()
        import os as _os
        if _os.environ.get("TOMBO_TPU_PROFILE", "") == "1":
            from .batch import print_stage_timings
            print_stage_timings()
        if reads_index is not None and not rc.dry_run:
            # multi-host runs write disjoint per-host index shards (all
            # readers merge `<index>.host*`, io/index.py _parse_fast5s)
            suffix = ("" if rc.dist is None or rc.dist.n_hosts <= 1
                      else ".host%d" % rc.dist.host_id)
            reads_index.write_index_file(suffix)
    finally:
        if failed_fp is not None:
            failed_fp.close()
        f5io.clear_locks(lock_fns)

    return summary, reads_index


def _write_status(fn: str, rc: RunConfig, bc_subgrp: str, err: str):
    if rc.dry_run:
        return
    try:
        f5io.write_error_status(fn, rc.corrected_group, bc_subgrp, err)
    except Exception:
        pass
