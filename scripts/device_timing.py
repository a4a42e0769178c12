"""Time individual device calls of the batched lane at several batch sizes.

Usage: python scripts/device_timing.py [B ...]
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
from tombo_tpu.pipeline import batch as pb


def timeit(fn, n=6):
    fn()  # warm
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    b_list = [int(x) for x in sys.argv[1:]] or [64, 128, 256]
    n_max = max(b_list)
    model, params, sst, map_results = bench.build_dataset(n_max)
    br = pb.BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                               dtype=jnp.float32)
    p = params
    for B in b_list:
        mrs = map_results[:B]
        # ---- stage A inputs
        raws = [np.asarray(mr.raw_signal, np.float64) for mr in mrs]
        S_max = pb._pow2_bucket(max(r.shape[0] for r in raws), 1024)
        B_pad = pb._pow2_bucket(B, 8)
        raw_pad = np.zeros((B, S_max), np.int16)
        sig_lens = np.array([r.shape[0] for r in raws], np.int64)
        num_cpts = []
        for i, (mr, r) in enumerate(zip(mrs, raws)):
            raw_pad[i, :r.shape[0]] = r.astype(np.int16)
            nmb = len(mr.genome_seq) - model.kmer_width + 1
            num_cpts.append(pb.rsq.compute_num_events(
                r.shape[0], nmb, p.mean_obs_per_event))
        num_cpts = np.array(num_cpts, np.int64)
        max_cpts = pb._pow2_bucket(int(num_cpts.max()), 256)
        nb = p.start_n_bases
        rm_start = np.ones((B, nb))
        rs_start = np.ones((B, nb))
        levels = [model.get_exp_levels_from_seq(mr.genome_seq) for mr in mrs]
        for i, (rmv, rsv) in enumerate(levels):
            rm_start[i] = rmv[:nb]
            rs_start[i] = rsv[:nb]
        sp = dpo.StartDpParams(
            z_shift=p.z_shift, skip_pen=p.skip_pen, stay_pen=p.stay_pen,
            max_half_z_score=p.max_half_z_score or -1.0,
            num_bases=nb, num_events=p.start_bw)
        host_args = dict(
            raw=raw_pad, lens=sig_lens, has_sv=np.zeros(B, bool),
            z=np.zeros(B), o=np.ones(B),
            lo=np.full(B, -pb.nrm.POS_LARGE),
            hi=np.full(B, pb.nrm.POS_LARGE))

        def upload():
            arrs = [jnp.asarray(pb._pad_rows(a, B_pad)) for a in (
                raw_pad, sig_lens, num_cpts)]
            jax.block_until_ready(arrs)
            return arrs

        t_up = timeit(lambda: upload())
        raw_j, lens_j, ncpts_j = upload()
        sv_args = [jnp.asarray(pb._pad_rows(a.astype(np.float32), B_pad))
                   for a in (host_args["z"], host_args["o"],
                             host_args["lo"], host_args["hi"])]
        hsv_j = jnp.asarray(pb._pad_rows(host_args["has_sv"], B_pad))
        rm_j = jnp.asarray(pb._pad_rows(rm_start.astype(np.float32), B_pad))
        rs_j = jnp.asarray(pb._pad_rows(rs_start.astype(np.float32), B_pad))

        def stage_a():
            out = pb._stage_a_dna(
                raw_j, lens_j, hsv_j, *sv_args, ncpts_j, rm_j, rs_j,
                float(config.OUTLIER_THRESH), p.running_stat_width,
                p.min_obs_per_base, max_cpts, sp, True)
            jax.block_until_ready(out)
            return out

        t_a = timeit(stage_a)
        outs = stage_a()
        t_fetch_a = timeit(lambda: pb._fetch(*outs[2:]))

        # ---- adaptive DP timing through the real driver path
        states = []
        for i, mr in enumerate(mrs):
            st = pb._ReadState(idx=i, map_res=mr, raw=raws[i],
                               num_events=int(num_cpts[i]))
            states.append(st)
        br2 = pb.BatchedResquiggler(model, params, sst,
                                    config.OUTLIER_THRESH,
                                    dtype=jnp.float32)
        for s in states:
            s.n_ev = s.num_events - 1
        br2._plan_reads(states)
        ctx = br2._segment_batch(states)
        failed = br2._start_discovery(states, ctx, p.start_bw, True,
                                      precomputed=ctx.get("start"))
        for s in failed:
            s.use_static = True

        def adaptive():
            for s in states:
                if hasattr(s, "dp_segs"):
                    del s.dp_segs
            br2._adaptive_batch(states, ctx)

        t_dp = timeit(adaptive, n=4)

        def finalize():
            for s in states:
                s.result = None
                s.error = None if s.error is None else s.error
            br2._finalize(states)

        t_fin = timeit(finalize, n=4)
        n_ok = sum(1 for s in states if s.result is not None)
        print("B=%3d  upload %5.1fms  stageA %6.1fms  fetchA %5.1fms  "
              "adaptive %6.1fms  finalize %6.1fms  ok=%d" %
              (B, t_up * 1e3, t_a * 1e3, t_fetch_a * 1e3, t_dp * 1e3,
               t_fin * 1e3, n_ok))


if __name__ == "__main__":
    main()
