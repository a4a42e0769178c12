"""Multi-host execution: jax.distributed runtime, deterministic read
sharding, and cross-host reduction of per-site accumulators.

The reference is strictly single-node — its only scaling axis is
N processes x M threads over ``multiprocessing`` queues (reference:
tombo/resquiggle.py:1859-1948, tombo/tombo_stats.py:4400-4608; SURVEY
§2.3/§5.8).  The TPU-native equivalent scales across hosts on the jax
distributed runtime:

* **resquiggle**: hosts own disjoint read sets via a stable hash of the
  read identity (``read_shard``); FAST5 writeback and index shards are
  per-host and merge trivially (disjoint files).
* **detection**: each host computes dense per-site accumulators
  (coverage, valid coverage, above-threshold counts — the quantities
  that *do* reduce) over its read shard, then sums them across hosts
  (``psum_hosts``).  Every host ends with identical totals, so per-site
  statistics are independent of the host count — the multi-host form of
  the reference's process-count-invariance guarantee (reference:
  docs/modified_base_detection.rst:151-153).

The reduction rides ``multihost_utils.process_allgather`` (fixed process
order, so float sums are deterministic).  With one host every helper is
an exact no-op, keeping a single code path in callers.
"""
from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass(frozen=True)
class DistContext:
    """Identity of this host within a multi-host run."""
    n_hosts: int = 1
    host_id: int = 0

    @property
    def is_main(self) -> bool:
        return self.host_id == 0

    def owns_read(self, read_key: str) -> bool:
        return read_shard(read_key, self.n_hosts) == self.host_id

    def owns_region(self, region_index: int) -> bool:
        """Deterministic region->host assignment (used for level/group
        statistics, whose per-site tests need every read at a site)."""
        return region_index % self.n_hosts == self.host_id


def read_shard(read_key: str, n_hosts: int) -> int:
    """Deterministic host index for a read (CRC32 of the read identity).

    Stable across runs, processes and platforms — the multi-host analog
    of the reference's dynamic work queue (reference:
    tombo/resquiggle.py:1851-1857 ``_fill_files_queue``), chosen static
    so that every host can compute the full assignment without
    communication."""
    if n_hosts <= 1:
        return 0
    return zlib.crc32(read_key.encode("utf-8")) % n_hosts


def read_key(r_data) -> str:
    """Sharding key for an index record: the read id when present, else
    the (filename, mapped-start) pair, which is equally stable."""
    if getattr(r_data, "read_id", None):
        return r_data.read_id
    return "%s:%d" % (getattr(r_data, "fn", ""), getattr(r_data, "start", 0))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> DistContext:
    """Join (or create) a multi-host jax runtime and return this host's
    identity.  With ``num_processes`` absent or 1 this is a no-op
    single-host context — no distributed service is started."""
    if num_processes in (None, 1):
        return DistContext()
    import jax
    try:
        # CPU backends need an explicit cross-process collectives layer
        # (TPU slices get one from the platform); must be set before the
        # backend initializes
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    if jax.process_count() != num_processes:
        raise RuntimeError(
            "jax backend reports %d processes but %d were requested — the "
            "backend was initialized before init_distributed() (import "
            "order / platform plugin touched jax.devices() first?)"
            % (jax.process_count(), num_processes))
    return DistContext(n_hosts=jax.process_count(),
                       host_id=jax.process_index())


def psum_hosts(ctx: DistContext, *arrays):
    """Element-wise sum of each array across all hosts.

    Every host receives the identical totals (allgather over the fixed
    process order, then a local sum — deterministic float reduction
    order).  Single-host: returns the inputs unchanged.

    Integer count arrays ride the wire as int32 (per-host site counts
    are bounded by per-host coverage, far below 2^31; the width must be
    chosen identically on every host, so no data-dependent narrowing)
    and sum in int64 — half the bytes per detection collective."""
    if ctx.n_hosts <= 1:
        return arrays
    from jax.experimental import multihost_utils
    out = []
    for a in arrays:
        a = np.asarray(a)
        int_in = np.issubdtype(a.dtype, np.integer)
        wire = a.astype(np.int32) if int_in else a
        g = multihost_utils.process_allgather(wire)
        out.append(np.sum(np.asarray(g), axis=0,
                          dtype=np.int64 if int_in else None))
    return tuple(out)
