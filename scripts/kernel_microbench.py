"""Microbenchmark per-seq-step cost models for the adaptive DP kernel.

Variants, each a pallas kernel running N_STEPS sequential steps:
  base:   3 Hillis-Steele scans over (R, W) + elementwise   (no gathers)
  gather: base + 2R per-read dynamic-slice+roll gathers      (band-aligned
          layout, the current kernel's per-step shape)
  evt:    base + rare recenter block under pl.when           (event-aligned
          layout estimate)

Usage: python scripts/kernel_microbench.py [R,W ...]
e.g.   python scripts/kernel_microbench.py 8,384 32,640 64,640
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
import tombo_tpu  # noqa: F401  (jax cache setup)

N_STEPS = 1024
NEG = -1e30


def lane_iota(r, w):
    return lax.broadcasted_iota(jnp.int32, (r, w), 1)


def cumsum_lanes(x):
    r, w = x.shape
    lanes = lane_iota(r, w)
    shift = 1
    while shift < w:
        rolled = pltpu.roll(x, shift, 1)
        x = x + jnp.where(lanes >= shift, rolled, 0.0)
        shift *= 2
    return x


def cummax_lanes(x):
    r, w = x.shape
    lanes = lane_iota(r, w)
    shift = 1
    while shift < w:
        rolled = pltpu.roll(x, shift, 1)
        x = jnp.maximum(x, jnp.where(lanes >= shift, rolled, NEG))
        shift *= 2
    return x


def make_kernel(R, W, variant):
    W_seg = W + 256

    def kernel(em_ref, out_ref, win_ref):
        def body(r, fwd):
            lanes = lane_iota(R, W)
            # data-dependent band placement: argmax of the carried row
            # feeds every address (models the real kernel's critical path)
            m = jnp.max(fwd, axis=1, keepdims=True)
            idx = jnp.where(fwd == m, lanes, jnp.int32(W))
            amax = jnp.min(idx, axis=1, keepdims=True)
            bstart = jnp.clip(amax + r, 0, N_STEPS * 3)
            if variant == "gather":
                for i in range(R):
                    start = bstart[i, 0] + W
                    base = pl.multiple_of((start // 128) * 128, 128)
                    seg = em_ref[pl.ds(i, 1), pl.ds(base, W_seg)]
                    row = pltpu.roll(seg, W_seg - (start - base), 1)
                    win_ref[pl.ds(i, 1), :] = row[:, :W]
                win = win_ref[:, :]
            elif variant == "evt":
                # recenter only when some band nears its window edge
                need = jnp.max(jnp.where(
                    bstart % 29 == 0, jnp.int32(1), jnp.int32(0)))

                @pl.when(need == 1)
                def _():
                    for i in range(R):
                        start = bstart[i, 0] + W
                        base = pl.multiple_of((start // 128) * 128, 128)
                        seg = em_ref[pl.ds(i, 1), pl.ds(base, W)]
                        win_ref[pl.ds(i, 1), :] = seg
                win = win_ref[:, :]
            else:
                win = win_ref[:, :]
            z = jnp.abs(win - 0.5) * 0.35
            shifted = 5.0 - jnp.minimum(z, 20.0)
            d = jnp.maximum(pltpu.roll(fwd, 1, 1) + shifted, fwd - 4.2)
            s = jnp.where(lanes == 0, 0.0, shifted - 4.2)
            c = cumsum_lanes(s)
            u = jnp.where(lanes == 0, d[:, 0:1], d - c)
            run = cummax_lanes(u)
            new_fwd = jnp.where(lanes == 0, d[:, 0:1], c + run)
            return new_fwd

        fwd = lax.fori_loop(0, N_STEPS, body,
                            jnp.zeros((R, W), jnp.float32))
        out_ref[:, :] = fwd

    return kernel


def run(R, W, variant):
    E = N_STEPS * 4 + 2 * W + 512
    E = ((E + 127) // 128) * 128
    em = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (R, E)).astype(np.float32))
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        make_kernel(R, W, variant),
        in_specs=[full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, W), jnp.float32)],
    )
    out = jax.block_until_ready(f(em))  # compile
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(em))
        best = min(best, time.perf_counter() - t0)
    us_step = best / N_STEPS * 1e6
    print("%-7s R=%-3d W=%-4d  %7.2f us/step  %8.1f read-steps/us"
          % (variant, R, W, us_step, R / us_step))


def main():
    shapes = [tuple(map(int, a.split(","))) for a in sys.argv[1:]] or [
        (8, 384), (32, 640), (64, 640)]
    for R, W in shapes:
        for variant in ("base", "gather", "evt"):
            if variant == "gather" and W > 384 and R > 32:
                continue
            try:
                run(R, W, variant)
            except Exception as e:
                print("%-7s R=%-3d W=%-4d  FAILED: %s"
                      % (variant, R, W, str(e)[:120]))


if __name__ == "__main__":
    main()
