"""Split per-stage wall time into host work vs blocking device fetches.

Monkeypatches batch._fetch to attribute blocking time per stage, running
one sequential (non-pipelined) pass at the bench batch size.
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import bench
from tombo_tpu import config
from tombo_tpu.pipeline import batch as pb

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512

fetch_time = {"t": 0.0, "n": 0}
orig_fetch = pb._fetch


def timed_fetch(*arrs):
    t0 = time.perf_counter()
    out = orig_fetch(*arrs)
    fetch_time["t"] += time.perf_counter() - t0
    fetch_time["n"] += 1
    return out


pb._fetch = timed_fetch


def main():
    model, params, sst, map_results = bench.build_dataset(2 * B)
    br = pb.BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                               dtype=jnp.float32)
    br.resquiggle_batch(map_results[:B])     # warm compile
    pb.STAGE_TIMINGS.clear()
    fetch_time["t"] = 0.0
    fetch_time["n"] = 0

    stage_fetch = {}
    stages = ["_plan_reads", "_segment_batch", "_start_discovery",
              "_adaptive_batch", "_static_reads", "_finalize"]
    for name in stages:
        orig = getattr(pb.BatchedResquiggler, name)

        def wrap(orig=orig, name=name):
            def inner(self, *a, **kw):
                f0, t0 = fetch_time["t"], time.perf_counter()
                out = orig(self, *a, **kw)
                dt = time.perf_counter() - t0
                df = fetch_time["t"] - f0
                rec = stage_fetch.setdefault(name, [0.0, 0.0])
                rec[0] += dt
                rec[1] += df
                return out
            return inner
        setattr(pb.BatchedResquiggler, name, wrap())

    t0 = time.perf_counter()
    out = br.resquiggle_batch(map_results[B:2 * B])
    wall = time.perf_counter() - t0
    ok = sum(1 for r, e in out if r is not None)
    print("B=%d sequential pass: %.3fs (%d ok) -> %.1f reads/s"
          % (B, wall, ok, ok / wall))
    print("total fetches: %d, %.3fs" % (fetch_time["n"], fetch_time["t"]))
    for name, (dt, df) in sorted(stage_fetch.items(), key=lambda kv: -kv[1][0]):
        print("  %-16s %.3fs wall, %.3fs in fetch (%.0f%%), host %.3fs"
              % (name, dt, df, 100 * df / max(dt, 1e-9), dt - df))


if __name__ == "__main__":
    main()
