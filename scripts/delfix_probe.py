"""Characterize deletion-fix work in the bench dataset (CPU backend ok)."""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("TOMBO_TPU_BENCH_NO_PROBE", "1")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

import bench
from tombo_tpu import config, native
from tombo_tpu.pipeline import batch as pb
from tombo_tpu.types import DpResults

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128


def main():
    model, params, sst, map_results = bench.build_dataset(B)
    br = pb.BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                               dtype=jnp.float32)
    captured = {}
    orig = pb.BatchedResquiggler._finalize

    def grab(self, states, skip_seq_scaling=False):
        if "states" not in captured:
            captured["states"] = states
            raise RuntimeError("stop")
        return orig(self, states, skip_seq_scaling)

    pb.BatchedResquiggler._finalize = grab
    try:
        br.resquiggle_batch(map_results)
    except RuntimeError:
        pass
    finally:
        pb.BatchedResquiggler._finalize = orig
    states = [s for s in captured["states"]
              if s.error is None and getattr(s, "dp_segs", None) is not None]
    print("live:", len(states))

    jobs = []
    n_del = []
    for s in states:
        dp_res = DpResults(s.dp_rsrtr, s.dp_segs, s.ref_means, s.ref_sds,
                           s.genome_seq_trim)
        norm = br._host_norm(s, dp_res.read_start_rel_to_raw,
                             dp_res.read_start_rel_to_raw +
                             int(dp_res.segs[-1]))
        segs = np.asarray(dp_res.segs, np.int64)
        nd = int(np.sum(np.diff(segs) == 0))
        n_del.append(nd)
        jobs.append((norm, np.asarray(dp_res.ref_means),
                     np.asarray(dp_res.ref_sds), segs.copy()))
    n_del = np.array(n_del)
    print("reads with >=1 deletion: %d/%d; mean dels/read %.1f; "
          "max %d" % ((n_del > 0).sum(), len(n_del), n_del.mean(),
                      n_del.max()))

    only_del = [j for j, nd in zip(jobs, n_del) if nd > 0]
    for tag, js in (("all-reads", jobs), ("del-only", only_del)):
        native.del_fix_batch([(j[0], j[1], j[2], j[3].copy())
                              for j in js], params)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            native.del_fix_batch([(j[0], j[1], j[2], j[3].copy())
                                  for j in js], params)
            best = min(best, time.perf_counter() - t0)
        print("del_fix_batch %-9s: %d jobs, %.1f ms (%.2f ms/job)"
              % (tag, len(js), best * 1e3, best * 1e3 / max(1, len(js))))


if __name__ == "__main__":
    main()
