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
    ctx = DistContext(n_hosts=jax.process_count(),
                      host_id=jax.process_index())
    _establish_device_collective(ctx)
    return ctx


def _establish_device_collective(ctx: DistContext) -> None:
    """Bring up the device-collective transport NOW, while all hosts
    are still in lock-step at startup.

    A collective's first contact has a ~30 s rendezvous timeout; probing
    it lazily at the first mid-run merge meant host-to-host workload
    skew could exceed the timeout, and a per-call try/except fallback
    then had different hosts entering DIFFERENT collectives — the
    classic mismatched-rendezvous cascade.  The probe runs here (skew =
    process startup, seconds), its outcome is agreed across hosts via
    one allgather (which also warms the fallback transport), and
    ``psum_hosts`` never switches paths mid-run."""
    import os
    if os.environ.get("TOMBO_TPU_DEV_COLLECTIVE", "") == "0":
        _DEV_COLLECTIVE_STATE["ok"] = False
        return
    ok = 1
    try:
        (tot,) = psum_hosts_device(ctx, np.zeros(8, np.int32))
        ok = int(tot.shape == (8,))
    except Exception:  # noqa: BLE001 — transport/platform limitation
        ok = 0
    from jax.experimental import multihost_utils
    all_ok = np.asarray(multihost_utils.process_allgather(
        np.array([ok], np.int32)))
    _DEV_COLLECTIVE_STATE["ok"] = bool(all_ok.min() == 1)


# which reduction path served the last multi-host run (recorded by the
# scaling bench artifacts; SURVEY §5.8 asks for a production device
# collective, with the host allgather kept as fallback)
LAST_PSUM_PATH = {"path": None}

_HOST_MESH_CACHE: dict = {}


def _hosts_mesh(ctx: DistContext):
    """One-device-per-host mesh in fixed process order (collectives ride
    ICI/NCCL-equivalent transports on real platforms, gloo on CPU)."""
    import jax
    from jax.sharding import Mesh
    m = _HOST_MESH_CACHE.get(ctx.n_hosts)
    if m is None:
        devs = []
        for pidx in range(ctx.n_hosts):
            cand = [d for d in jax.devices() if d.process_index == pidx]
            if not cand:
                return None
            devs.append(cand[0])
        m = Mesh(np.array(devs), ("hosts",))
        _HOST_MESH_CACHE[ctx.n_hosts] = m
    return m


_PSUM_JIT = None


def psum_hosts_device(ctx: DistContext, *arrays):
    """Device-collective cross-host sum: each host contributes its slice
    of a (n_hosts, N) global array on ITS device; one jitted reduction
    runs the allreduce through the platform's collective transport and
    every host reads back the identical replicated total.  int32 wire,
    int64 results (counts are far below 2^31)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    global _PSUM_JIT
    mesh = _hosts_mesh(ctx)
    if mesh is None:
        raise RuntimeError("no device for some host")
    sh = NamedSharding(mesh, P("hosts"))
    rep = NamedSharding(mesh, P())
    my_dev = mesh.devices[ctx.host_id]
    if _PSUM_JIT is None:
        _PSUM_JIT = jax.jit(lambda x: jnp.sum(x, axis=0),
                            out_shardings=rep)
    out = []
    for a in arrays:
        a = np.asarray(a)
        int_in = np.issubdtype(a.dtype, np.integer)
        flat = a.reshape(-1)
        # pow2 width buckets (floor 2048) so every region span reuses
        # ONE compiled collective — a fresh compile mid-run would add
        # host-skew inside a rendezvous window
        width = max(1 << max(int(flat.shape[0]) - 1, 1).bit_length(),
                    2048)
        wire = np.zeros(width, np.int32 if int_in else flat.dtype)
        wire[:flat.shape[0]] = flat.astype(wire.dtype)
        local = jax.device_put(wire[None], my_dev)
        garr = jax.make_array_from_single_device_arrays(
            (ctx.n_hosts, width), sh, [local])
        tot = _PSUM_JIT(garr)
        res = np.asarray(tot.addressable_data(0))[:flat.shape[0]]
        out.append(res.astype(np.int64 if int_in else a.dtype)
                   .reshape(a.shape))
    return tuple(out)


def psum_collective_dryrun(devices) -> None:
    """Single-process exercise of the production device-collective merge
    program (the exact jitted reduction ``psum_hosts_device`` runs):
    one int32 shard per device over a ("hosts",) mesh, replicated sum
    out, value-checked.  Driven by the multichip dryrun contract
    (__graft_entry__.dryrun_multichip)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devices = list(devices)
    n = len(devices)
    mesh = Mesh(np.array(devices), ("hosts",))
    sh = NamedSharding(mesh, P("hosts"))
    rep = NamedSharding(mesh, P())
    width = 1024
    shards = [jax.device_put(np.full((1, width), i + 1, np.int32), d)
              for i, d in enumerate(devices)]
    g = jax.make_array_from_single_device_arrays((n, width), sh, shards)
    tot = jax.jit(lambda x: jnp.sum(x, axis=0), out_shardings=rep)(g)
    got = int(np.asarray(tot.addressable_data(0))[0])
    assert got == n * (n + 1) // 2, (got, n)


# device-collective availability, decided ONCE at init_distributed on
# every host identically (see _establish_device_collective); per-call
# probing or fallback would let hosts enter mismatched collectives
_DEV_COLLECTIVE_STATE = {"ok": False}


def _device_collective_ok(ctx: DistContext, arrays) -> bool:
    if not _DEV_COLLECTIVE_STATE["ok"]:
        return False
    # f64 payloads (group-test dense stats) keep the host path: the
    # production device lane runs without x64, and truncating the merge
    # would change results vs the single-host run.  The dtype choice is
    # value-independent, so every host picks the same path.
    for a in arrays:
        a = np.asarray(a)
        if (not np.issubdtype(a.dtype, np.integer) and
                a.dtype != np.float32):
            return False
    return True


def psum_hosts(ctx: DistContext, *arrays):
    """Element-wise sum of each array across all hosts.

    Every host receives the identical totals.  Production path: a
    device collective over a one-device-per-host mesh
    (``psum_hosts_device`` — on real multi-chip platforms this rides
    ICI instead of the host network).  Fallback (f64 payloads, no
    per-host device): allgather over the fixed process order + local
    sum — deterministic float reduction order.  Single-host: returns
    the inputs unchanged.

    Integer count arrays ride the wire as int32 (per-host site counts
    are bounded by per-host coverage, far below 2^31; the width must be
    chosen identically on every host, so no data-dependent narrowing)
    and sum in int64 — half the bytes per detection collective."""
    if ctx.n_hosts <= 1:
        return arrays
    if _device_collective_ok(ctx, arrays):
        # no try/except here: every host picked this path by the same
        # deterministic predicate, and a mid-collective fallback would
        # leave the others waiting in a mismatched rendezvous
        out = psum_hosts_device(ctx, *arrays)
        LAST_PSUM_PATH["path"] = "device"
        return out
    LAST_PSUM_PATH["path"] = "host"
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
