"""Capture real Theil-Sen inputs from the bench dataset and time them."""
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def main():
    model, params, sst, map_results = bench.build_dataset(B)
    br = pb.BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                               dtype=jnp.float32)
    captured = {}
    orig = native.theil_sen_batch

    def grab(ev, mod, n_points, *a, **kw):
        if "ev" not in captured:
            captured["ev"] = np.array(ev)
            captured["mod"] = np.array(mod)
            captured["np"] = np.array(n_points)
        return orig(ev, mod, n_points, *a, **kw)

    native.theil_sen_batch = grab
    pass  # from-import inside _finalize resolves via native module
    try:
        br.resquiggle_batch(map_results)
    finally:
        native.theil_sen_batch = orig

    ev, mod, n_pts = captured["ev"], captured["mod"], captured["np"]
    np.savez("/tmp/ts_inputs.npz", ev=ev, mod=mod, n=n_pts)
    print("captured", ev.shape, "n:", n_pts.min(), n_pts.max())
    for use_f32 in (False, True):
        orig(ev, mod, n_pts, use_f32=use_f32)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            orig(ev, mod, n_pts, use_f32=use_f32)
            best = min(best, time.perf_counter() - t0)
        print("%s real-data: %.3f s (%.2f ms/read)"
              % ("f32" if use_f32 else "f64", best, best * 1e3 / ev.shape[0]))


if __name__ == "__main__":
    main()
