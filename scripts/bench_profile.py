"""Run the bench workload with per-stage wall-clock profiling output."""
import os
import sys
import time

os.environ["TOMBO_TPU_PROFILE"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

import bench
from tombo_tpu import config
from tombo_tpu.pipeline import batch as pb


def main():
    n_reads = bench.BATCH_SIZE * (bench.N_BATCHES + 1)
    model, params, sst, map_results = bench.build_dataset(n_reads)
    br = pb.BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                               dtype=jnp.float32)
    for b in range(bench.N_BATCHES + 1):
        br.resquiggle_batch(
            map_results[b * bench.BATCH_SIZE:(b + 1) * bench.BATCH_SIZE])
    pb.STAGE_TIMINGS.clear()
    pb.TRANSFER_BYTES.clear()
    batches = [map_results[b * bench.BATCH_SIZE:(b + 1) * bench.BATCH_SIZE]
               for b in range(1, bench.N_BATCHES + 1)]
    t0 = time.perf_counter()
    total = 0
    for out in br.resquiggle_batches(batches):
        total += sum(1 for r, e in out if r is not None)
    dt = time.perf_counter() - t0
    print("timed: %d reads in %.3f s -> %.1f reads/s" % (total, dt,
                                                         total / dt))
    pb.print_stage_timings(sys.stdout)


if __name__ == "__main__":
    main()
