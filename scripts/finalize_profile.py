"""Break down the host finalize stage cost at B=64."""
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import bench
from tombo_tpu import config, native
from tombo_tpu.ops import ref_impl
from tombo_tpu.pipeline import batch as pb
from tombo_tpu.pipeline import resquiggle as rsq
from tombo_tpu.types import DpResults

B = 256


def main():
    model, params, sst, map_results = bench.build_dataset(B)
    br = pb.BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                               dtype=jnp.float32)
    states = []
    for i, mr in enumerate(map_results):
        raw = np.asarray(mr.raw_signal, np.float64)
        nmb = len(mr.genome_seq) - model.kmer_width + 1
        st = pb._ReadState(idx=i, map_res=mr, raw=raw,
                           num_events=rsq.compute_num_events(
                               raw.shape[0], nmb, params.mean_obs_per_event))
        st.n_ev = st.num_events - 1
        states.append(st)
    br._plan_reads(states)
    ctx = br._segment_batch(states)
    failed = br._start_discovery(states, ctx, params.start_bw, True,
                                 precomputed=ctx.get("start"))
    for s in failed:
        s.use_static = True
    br._adaptive_batch(states, ctx)

    live = [s for s in states if s.error is None and hasattr(s, "dp_segs")]
    print("live reads:", len(live))

    t = {}

    def tick(name, fn, n=5):
        fn()
        best = np.inf
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        t[name] = best

    def host_norms():
        for s in live:
            s.norm = br._host_norm(s)
    tick("host_norm", host_norms)

    def del_fix():
        for s in live:
            dp_res = DpResults(s.dp_rsrtr, s.dp_segs, s.ref_means, s.ref_sds,
                               s.genome_seq_trim)
            norm_signal = s.norm[
                dp_res.read_start_rel_to_raw:
                dp_res.read_start_rel_to_raw + dp_res.segs[-1]]
            s._dp_res = dp_res
            s._norm_signal = norm_signal
            s._segs = rsq.resolve_skipped_bases_with_raw(
                dp_res, norm_signal, params)
    tick("del_fix", del_fix)

    def ts_inputs():
        max_n = config.MAX_POINTS_FOR_THEIL_SEN
        n = len(live)
        ev = np.zeros((n, max_n)); mod = np.zeros((n, max_n))
        n_pts = np.zeros(n, np.int64)
        for i, s in enumerate(live):
            r_ev = ref_impl.new_means(s._norm_signal, s._segs)
            m = s._dp_res.ref_means.shape[0]
            ev[i, :m] = r_ev
            mod[i, :m] = s._dp_res.ref_means
            n_pts[i] = m
        return ev, mod, n_pts
    tick("ts_inputs", ts_inputs)
    ev, mod, n_pts = ts_inputs()
    tick("theil_sen", lambda: native.theil_sen_batch(ev, mod, n_pts))

    def scores():
        for s in live:
            rsq.get_read_seg_score(
                ref_impl.new_means(s._norm_signal, s._segs),
                s._dp_res.ref_means, s._dp_res.ref_sds)
    tick("score", scores)

    total = sum(t.values())
    for k, v in sorted(t.items(), key=lambda kv: -kv[1]):
        print("  %-10s %7.1f ms (%4.1f%%)" % (k, v * 1e3, 100 * v / total))
    print("  total      %7.1f ms" % (total * 1e3))

    n_wins = 0
    for s in live:
        n_wins += int(np.sum(np.diff(s._segs) == 0) > 0)
    print("reads with deletion windows: %d/%d" % (n_wins, len(live)))


if __name__ == "__main__":
    main()
