"""Device-resident per-read event means: fused resquiggle -> detect.

When detection runs in the same process as resquiggle (the standard
``resquiggle`` -> ``detect_modifications`` workflow driven end-to-end, or
the runner's post-resquiggle detection), every read's event means were
just computed ON DEVICE by the batched rescale fit
(pipeline/batch.py ``_stage_fit``).  The packed detection lane
previously re-uploaded those means as a flat f32 buffer — 4 bytes per
site-observation, the measured ceiling of the device detection lane
(round-4: compute_device_vs_host ~1.3, wire-bound).  This cache keeps
the (B, L) mean matrices device-resident and hands the packer
(stats/device.py) row handles instead of numpy slices, so region
dispatches gather levels on-chip and the wire carries ~16 bytes per
read-region intersection instead of 4 bytes per site.

Reference behavior being beaten: per-test FAST5/Events re-reads
(tombo/tombo_stats.py:3705,3803,4013).

Numerics: the cached means are the device f32 fit values; the sidecar /
FAST5 route serves float64 means recomputed by the writeback path.  The
two agree to f32 ulp (the rescale is affine and the packed lane casts
levels to f32 before testing anyway); borderline per-site threshold
flips are the same documented tolerance class as the f32 device stats
lane (docs/performance.md).

The cache is per-process and keyed by read id; a re-resquiggle in this
process overwrites entries (last registration wins).  Entries are only
served when the requested span length matches the registration, so an
index row from a different (older) resquiggle never silently pairs with
mismatched means.
"""
from __future__ import annotations

import os
import threading
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

_lock = threading.Lock()
# batch_key -> (arr (B, L) device, {read_id: (row, n_bases)})
_batches: "OrderedDict[int, tuple]" = OrderedDict()
_by_read: Dict[str, Tuple[int, int, int]] = {}   # read_id -> (key, row, L)
_total_bytes = 0
_next_key = 0


def cap_bytes() -> int:
    return int(os.environ.get("TOMBO_TPU_DEV_LEVELS_CAP_MB", "512")) << 20


def enabled() -> bool:
    return os.environ.get("TOMBO_TPU_DEV_LEVELS", "1") == "1"


def register_batch(arr, entries: List[Tuple[str, int, int]]) -> None:
    """Keep one resquiggle batch's device mean matrix.

    arr: (B_pad, L_max) device array (read-centric event means, final
    rescaled values).  entries: (read_id, row, n_bases) for the reads
    whose results were actually consumed.
    """
    global _total_bytes, _next_key
    if not enabled() or arr is None or not entries:
        return
    with _lock:
        key = _next_key
        _next_key += 1
        rows = {}
        for read_id, row, nb in entries:
            if not read_id:
                continue
            old = _by_read.get(read_id)
            if old is not None:
                bkey = old[0]
                b = _batches.get(bkey)
                if b is not None:
                    b[1].pop(read_id, None)
            rows[read_id] = (row, nb)
            _by_read[read_id] = (key, row, nb)
        if not rows:
            return
        _batches[key] = (arr, rows)
        _total_bytes += arr.nbytes
        while _total_bytes > cap_bytes() and len(_batches) > 1:
            old_key, (old_arr, old_rows) = _batches.popitem(last=False)
            _total_bytes -= old_arr.nbytes
            for rid in old_rows:
                if _by_read.get(rid, (None,))[0] == old_key:
                    del _by_read[rid]


def _ensure_compact_locked() -> None:
    """Merge all registered batch matrices into ONE device array (pad to
    the widest, concatenate on device).  Detection then has a single
    gather source, so the packed kernel folds the level gather into its
    own dispatch instead of paying one extra device call per source
    array per group (measured: per-array scatter dispatches cost more
    than the upload they saved)."""
    global _total_bytes
    if len(_batches) <= 1:
        return
    import jax.numpy as jnp
    arrs = []
    entries: List[Tuple[str, int, int]] = []
    row0 = 0
    width = max(b[0].shape[1] for b in _batches.values())
    for key, (arr, rows) in _batches.items():
        if arr.shape[1] < width:
            arr = jnp.pad(arr, ((0, 0), (0, width - arr.shape[1])))
        arrs.append(arr)
        for rid, (row, nb) in rows.items():
            if _by_read.get(rid, (None,))[0] == key:
                entries.append((rid, row0 + row, nb))
        row0 += arr.shape[0]
    big = jnp.concatenate(arrs, axis=0)
    _batches.clear()
    _by_read.clear()
    key = 0
    rows2 = {}
    for rid, row, nb in entries:
        rows2[rid] = (row, nb)
        _by_read[rid] = (key, row, nb)
    _batches[key] = (big, rows2)
    _total_bytes = big.nbytes


def lookup(read_id: Optional[str], n_bases: int):
    """(device_array, row) when ``read_id`` was registered with exactly
    ``n_bases`` mean values, else None."""
    if not enabled() or not read_id:
        return None
    with _lock:
        hit = _by_read.get(read_id)
        if hit is None:
            return None
        _ensure_compact_locked()
        hit = _by_read.get(read_id)
        if hit is None:
            return None
        key, row, nb = hit
        if nb != n_bases:
            return None
        b = _batches.get(key)
        if b is None:
            return None
        return b[0], row


def unregister(read_id: Optional[str]) -> None:
    """Drop one read's entry (the read finalized through a host lane or
    errored after an earlier pass registered it — its cached means no
    longer match what writeback records)."""
    if not read_id:
        return
    with _lock:
        hit = _by_read.pop(read_id, None)
        if hit is None:
            return
        b = _batches.get(hit[0])
        if b is not None:
            b[1].pop(read_id, None)


def clear() -> None:
    global _total_bytes
    with _lock:
        _batches.clear()
        _by_read.clear()
        _total_bytes = 0


def stats() -> dict:
    with _lock:
        return {"batches": len(_batches), "reads": len(_by_read),
                "bytes": _total_bytes}
