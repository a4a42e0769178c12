"""Time the fused Pallas DP at several read-block sizes (R sweep) and
across the three window-gather variants (loop / gather / shift).

Usage: python scripts/kernel_layout_bench.py [R ...]   (default 8 16 32)
Builds one bench-shaped batch (B=512, L=1024, bw=300) and times
adaptive_banded_dp_tb at each (block_reads, variant); a variant whose
lowering Mosaic rejects prints FAILED and is skipped.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import bench
from tombo_tpu import config
from tombo_tpu.ops import dp as dpo
from tombo_tpu.ops import pallas_dp as pdp
from tombo_tpu.pipeline import batch as pb
from tombo_tpu.pipeline import resquiggle as rsq


def main():
    rs_list = [int(x) for x in sys.argv[1:]] or [8, 16, 32]
    B = 512
    model, params, sst, mrs = bench.build_dataset(B)
    br = pb.BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                               dtype=jnp.float32)
    # drive one real batch to capture the dp_args the adaptive stage sees
    captured = {}
    orig = pdp.adaptive_banded_dp_tb

    def capture(*args, **kw):
        import jax.core
        if "args" not in captured and not isinstance(args[0],
                                                     jax.core.Tracer):
            # keep the FIRST concrete (full-batch) call; the start-DP
            # path invokes this under jit with tracer args
            captured["args"] = args
            captured["kw"] = dict(kw)
        return orig(*args, **kw)

    pdp.adaptive_banded_dp_tb = capture
    try:
        br.resquiggle_batch(mrs)
    finally:
        pdp.adaptive_banded_dp_tb = orig
    if "args" not in captured:
        sys.exit("adaptive stage never hit the fused kernel "
                 "(layout routed elsewhere)")
    import inspect
    bound = inspect.signature(orig).bind(*captured["args"],
                                         **captured["kw"])
    bound.apply_defaults()
    all_kw = dict(bound.arguments)
    args = tuple(all_kw.pop(name) for name in (
        "event_means", "n_events", "ref_means", "ref_sds", "seq_lens",
        "prefix_starts", "prefix_valid_start", "prefix_end", "start_rows",
        "params"))
    kw = all_kw
    print("captured dp_args: em %s, L=%d, P=%d" % (
        args[0].shape, kw.get("n_rows"), kw.get("prefix_rows")))

    ref_segs = None
    for R in rs_list:
        for variant in ("loop", "gather", "shift"):
            kw2 = dict(kw)
            kw2["block_reads"] = R
            kw2["variant"] = variant
            try:
                out = orig(*args, **kw2)
                jax.block_until_ready(out)
                # amortize the tunnel RTT: 8 async dispatches per timing
                best = np.inf
                n_rep = 8
                for _ in range(3):
                    t0 = time.perf_counter()
                    outs = [orig(*args, **kw2) for _ in range(n_rep)]
                    jax.block_until_ready(outs)
                    best = min(best, (time.perf_counter() - t0) / n_rep)
                segs = np.asarray(out[0])
                if ref_segs is None:
                    ref_segs = segs
                ok = "" if np.array_equal(segs, ref_segs) else "  MISMATCH"
                print("fused R=%-3d %-6s %.3fs  (%.0f reads/s DP-only)%s"
                      % (R, variant, best, args[0].shape[0] / best, ok))
            except Exception as e:  # noqa: BLE001 — report lowering errors
                print("fused R=%-3d %-6s FAILED: %s"
                      % (R, variant, str(e)[:200]))


if __name__ == "__main__":
    main()
