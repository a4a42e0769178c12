"""cProfile the production _finalize at bench shape (B=512).

Runs on the ambient JAX backend by design: point it at the device
attachment (or JAX_PLATFORMS=cpu) to profile the corresponding lane."""
import cProfile
import pstats
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import bench
from tombo_tpu import config
from tombo_tpu.pipeline import batch as pb

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def main():
    model, params, sst, map_results = bench.build_dataset(B)
    br = pb.BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                               dtype=jnp.float32)
    # run device stages once, capturing states right before _finalize
    captured = {}
    orig = pb.BatchedResquiggler._finalize

    def grab(self, states, skip_seq_scaling=False, will_retry=False):
        if "states" not in captured:
            captured["states"] = states
            captured["skip"] = skip_seq_scaling
            raise RuntimeError("stop-before-finalize")
        return orig(self, states, skip_seq_scaling, will_retry)

    pb.BatchedResquiggler._finalize = grab
    try:
        br.resquiggle_batch(map_results)
    except RuntimeError:
        pass
    finally:
        pb.BatchedResquiggler._finalize = orig
    states = captured["states"]
    print("states:", len(states))
    pr = cProfile.Profile()
    pr.enable()
    br._finalize(states, captured["skip"])
    pr.disable()
    stats = pstats.Stats(pr)
    stats.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
