"""Process-parallel FAST5 ingest + mapping.

The reference fans FAST5 I/O + mapping out over N x M *threads* (mappy
releases the GIL; reference: tombo/resquiggle.py:1612-1656
``_io_and_mappy_thread_worker``), but h5py serializes every HDF5 call
behind one process-global lock, so python threads add contention rather
than parallelism — measured ~4x slower per read than a single bare
thread.  Here ingest (prep + read + map + adjust) runs in spawned worker
processes sharded by file, and mapped reads stream back over a queue as
compact payloads (raw signal rides the wire as int16 DAC values, which
the batched resquiggler consumes natively).

The pool is process-wide and reused across runs (spawn + imports cost
seconds, paid once); workers force ``JAX_PLATFORMS=cpu`` so they can
never touch the accelerator link.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def aligner_spec(aligner):
    """A picklable recipe to rebuild ``aligner`` inside a worker process,
    or None when the engine cannot cross a process boundary."""
    from .aligner import ExactAligner, MappyAligner, MinimizerAligner
    if isinstance(aligner, MappyAligner):
        fn = getattr(aligner, "reference_fn", None)
        return ("mappy", fn, getattr(aligner, "preset", "map-ont")) \
            if fn else None
    if isinstance(aligner, MinimizerAligner):
        return ("minimizer", aligner.fasta)
    if isinstance(aligner, ExactAligner):
        return ("exact", aligner.fasta, aligner.seed_len)
    return None


def build_aligner(spec):
    from .aligner import ExactAligner, MappyAligner, MinimizerAligner
    if spec[0] == "mappy":
        return MappyAligner(spec[1], spec[2])
    if spec[0] == "minimizer":
        return MinimizerAligner(spec[1])
    return ExactAligner(spec[1], spec[2])


def _worker_main(in_q, out_q, spec, std_ref, seq_samp_type, rsqgl_params,
                 rc_fields):
    os.environ["JAX_PLATFORMS"] = "cpu"        # never touch the device
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    from ..errors import TomboTpuError
    from ..io import fast5 as f5io
    from . import resquiggle as rsq
    from . import runner as rn

    import h5py

    from .. import config as _config
    from .._version import TOMBO_TPU_VERSION

    aligner = build_aligner(spec)
    rc = rn.RunConfig(**rc_fields)
    is_rna = seq_samp_type.name == _config.RNA_SAMP_TYPE

    def prep_and_read(fn):
        """prep_fast5 + raw + per-subgroup Fastq in ONE r+ open (the
        separate open-per-step of the thread lane tripled the per-file
        HDF5 open cost; semantics identical to io/fast5.py
        ``prep_fast5``/``get_raw_signal``/``get_read_seq``)."""
        if not rc.dry_run and not os.access(fn, os.W_OK):
            raise TomboTpuError("FAST5 file is not writable")
        try:
            fp = h5py.File(fn, "r" if rc.dry_run else "r+")
        except Exception:
            raise TomboTpuError("Error opening or writing to fast5 file")
        with fp:
            try:
                analyses_grp = fp["/Analyses"]
            except KeyError:
                raise TomboTpuError(
                    "Base calls not found in FAST5 (see `preprocess`)")
            if rc.basecall_group not in analyses_grp:
                raise TomboTpuError(
                    "Base calls not found in FAST5 (see `preprocess`)")
            if not rc.dry_run:
                if rc.corrected_group in analyses_grp:
                    if not rc.overwrite:
                        raise TomboTpuError(
                            "Tombo data exists in [--corrected-group] and "
                            "[--overwrite] is not set")
                    del analyses_grp[rc.corrected_group]
                new_grp = analyses_grp.create_group(rc.corrected_group)
                new_grp.attrs["tombo_version"] = TOMBO_TPU_VERSION
                new_grp.attrs["basecall_group"] = rc.basecall_group
            raw = f5io.get_raw_signal(fp)
            seqs = []
            for subgrp in rc.basecall_subgroups:
                try:
                    seqs.append(f5io.get_read_seq(
                        fp, rc.basecall_group, subgrp, is_rna,
                        rc.q_score_thresh))
                except TomboTpuError as e:
                    seqs.append(e)
        return raw, seqs

    while True:
        job = in_q.get()
        if job is None:
            break
        chunk_id, fns = job
        units = []
        for fn in fns:
            try:
                raw, seqs = prep_and_read(fn)
            except TomboTpuError as e:
                units.append((fn, rc.basecall_subgroups[0], None, str(e)))
                continue
            except Exception as e:  # noqa: BLE001
                units.append((fn, rc.basecall_subgroups[0], None,
                              "Unexpected error: " + repr(e)))
                continue
            if not (rc.signal_length_range is None or
                    rc.signal_length_range[0] < raw.shape[0] <
                    rc.signal_length_range[1]):
                units.extend(
                    (fn, sg, None,
                     "Raw signal not within --signal-length-range")
                    for sg in rc.basecall_subgroups)
                continue
            for subgrp, seq_data in zip(rc.basecall_subgroups, seqs):
                try:
                    if isinstance(seq_data, TomboTpuError):
                        raise seq_data
                    from ..seq import invalid_seq
                    mr = rsq.map_read(seq_data, aligner, std_ref,
                                      seq_samp_type, subgrp,
                                      rc.sequence_length_range)
                    if invalid_seq(mr.genome_seq):
                        raise TomboTpuError(
                            "Reference mapping contains non-canonical "
                            "bases")
                    mr = mr.replace(
                        raw_signal=raw.astype(np.float64))
                    mr = rsq.adjust_map_res(mr, seq_samp_type,
                                            rsqgl_params)
                    # wire compaction: FAST5 raw is int16 DAC values; the
                    # batched lane consumes int16 natively and re-derives
                    # float64 (RNA signal flips preserve integrality)
                    rs = mr.raw_signal
                    if rs is not None and rs.dtype != np.int16 and \
                            rs.size and np.abs(rs).max() < 2 ** 15 and \
                            np.all(rs == np.trunc(rs)):
                        mr = mr.replace(
                            raw_signal=np.ascontiguousarray(
                                rs.astype(np.int16)))
                    units.append((fn, subgrp, mr, None))
                except TomboTpuError as e:
                    units.append((fn, subgrp, None, str(e)))
                except Exception as e:  # noqa: BLE001
                    units.append((fn, subgrp, None,
                                  "Unexpected error: " + repr(e)))
        out_q.put((chunk_id, units))


class IngestPool:
    """Spawned FAST5 ingest workers (file -> mapped-read units)."""

    CHUNK = 16

    def __init__(self, n: int, spec, std_ref, seq_samp_type, rsqgl_params,
                 rc_fields):
        import multiprocessing as mp
        ctx = mp.get_context("spawn")
        self.in_q = ctx.Queue()
        self.out_q = ctx.Queue(maxsize=64)
        self.n = n
        self.procs = [
            ctx.Process(target=_worker_main,
                        args=(self.in_q, self.out_q, spec, std_ref,
                              seq_samp_type, rsqgl_params, rc_fields),
                        daemon=True)
            for _ in range(n)]
        for p in self.procs:
            p.start()

    def alive(self) -> bool:
        return all(p.is_alive() for p in self.procs)

    def run(self, fns: List[str]):
        """Yield mapped-unit lists for ``fns`` (arbitrary order across
        chunks; within a chunk, file order is preserved)."""
        chunks = [fns[i:i + self.CHUNK]
                  for i in range(0, len(fns), self.CHUNK)]
        for cid, chunk in enumerate(chunks):
            self.in_q.put((cid, chunk))
        seen = 0
        while seen < len(chunks):
            try:
                _, units = self.out_q.get(timeout=5.0)
            except Exception:  # noqa: BLE001 — queue.Empty: health check
                if not self.alive():
                    raise RuntimeError("ingest worker died")
                continue
            seen += 1
            yield units

    def shutdown(self):
        for _ in self.procs:
            try:
                self.in_q.put(None)
            except Exception:  # noqa: BLE001
                pass
        for p in self.procs:
            p.join(timeout=2.0)
            if p.is_alive():
                p.terminate()


_POOL: Optional[IngestPool] = None
_POOL_KEY = None


def get_ingest_pool(n: int, aligner, std_ref, seq_samp_type, rsqgl_params,
                    rc) -> Optional[IngestPool]:
    """Process-wide ingest pool, rebuilt only when the configuration
    changes (aligner identity, model, params, run options)."""
    global _POOL, _POOL_KEY
    spec = aligner_spec(aligner)
    if spec is None:
        return None
    rc_fields = dict(
        corrected_group=rc.corrected_group,
        basecall_group=rc.basecall_group,
        basecall_subgroups=tuple(rc.basecall_subgroups),
        overwrite=rc.overwrite, dry_run=rc.dry_run,
        q_score_thresh=rc.q_score_thresh,
        signal_length_range=rc.signal_length_range,
        sequence_length_range=rc.sequence_length_range)
    key = (n, id(aligner), id(std_ref), repr(rsqgl_params),
           repr(seq_samp_type), repr(sorted(rc_fields.items())))
    if _POOL is not None and _POOL_KEY == key and _POOL.alive():
        return _POOL
    if _POOL is not None:
        _POOL.shutdown()
        _POOL = None
    try:
        _POOL = IngestPool(n, spec, std_ref, seq_samp_type, rsqgl_params,
                           rc_fields)
        _POOL_KEY = key
    except Exception:  # noqa: BLE001 — no mp support: thread fallback
        _POOL = None
    return _POOL
