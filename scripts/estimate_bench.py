"""Model-estimation wall-clock: device packed lane vs spawn process
workers vs the GIL-bound thread lane (round-4 task 8 / round-5 task 6;
reference fan-out: tombo/tombo_stats.py:1361-1452).

Usage: python scripts/estimate_bench.py [n_reads] [read_len]
Prints one JSON line with the three walls and speedups.  Run without
JAX_PLATFORMS so the device lane sees the real chip; the host lanes
never dispatch to it.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from tombo_tpu import config
    from tombo_tpu.io.index import ReadsIndex
    from tombo_tpu.io.model_io import KmerModel
    from tombo_tpu.pipeline.aligner import ExactAligner
    from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
    from tombo_tpu.stats import estimate as est
    from tombo_tpu.stats.region import clear_levels_cache
    from tombo_tpu.testing import make_synthetic_dataset
    from tombo_tpu.types import SeqSampleType

    with tempfile.TemporaryDirectory() as tmp:
        fasta, _, fast5_dir = make_synthetic_dataset(
            tmp, n_reads=n_reads, seed=13, read_len=read_len,
            ref_len=120000)
        model = KmerModel.load_default(config.DNA_SAMP_TYPE)
        summary, _ = resquiggle_all_reads(
            fast5_dir, ExactAligner(fasta), model,
            SeqSampleType(config.DNA_SAMP_TYPE, False),
            config.load_resquiggle_parameters(config.DNA_SAMP_TYPE),
            RunConfig(overwrite=True, batch_size=64, num_io_threads=4))
        index = ReadsIndex([fast5_dir])

        def run(flag, device="0"):
            os.environ["TOMBO_TPU_EST_PROCS"] = flag
            os.environ["TOMBO_TPU_EST_DEVICE"] = device
            clear_levels_cache()
            t0 = time.perf_counter()
            out = est.extract_kmer_levels(
                index, fasta, region_size=config.DEFAULT_REGION_SIZE,
                cov_thresh=1, upstrm_bases=2, dnstrm_bases=3,
                cs_cov_thresh=None, num_processes=4)
            return time.perf_counter() - t0, out

        run(os.environ.get("_WARM", "0"))            # warm file caches
        thr_s, thr_out = run("0")
        proc_s, proc_out = run("1")
        run("0", "1")                                # compile warm
        dev_s, dev_out = run("0", "1")
        # identical tabulation regardless of host worker kind
        def merge(out):
            m = {}
            for reg in out:
                for km, vals in reg.items():
                    m.setdefault(km, []).extend(map(tuple, vals))
            return {k: sorted(v) for k, v in m.items()}
        merged = [merge(o) for o in (thr_out, proc_out, dev_out)]
        assert merged[0] == merged[1], "proc/thread tabulations differ"
        # device lane: identical per-region site counts per k-mer and
        # sites compared IN ORDER (a merged-sorted comparison mispairs
        # sites when f32 values shuffle sort ranks); values agree to f32
        # statistics precision
        max_dev = 0.0
        assert len(thr_out) == len(dev_out)
        for hd, dd in zip(thr_out, dev_out):
            assert set(hd) == set(dd)
            for km, vals in hd.items():
                dvals = dd[km]
                assert len(vals) == len(dvals), km
                for (a, b), (c, d) in zip(vals, dvals):
                    max_dev = max(max_dev, abs(a - c), abs(b - d))
        print(json.dumps({
            "metric": "estimate_kmer_levels_wall_s",
            "n_reads": summary.n_success, "read_len": read_len,
            "thread_lane_s": round(thr_s, 2),
            "process_lane_s": round(proc_s, 2),
            "device_lane_s": round(dev_s, 2),
            "speedup_proc": round(thr_s / proc_s, 2),
            "speedup_device": round(thr_s / dev_s, 2),
            "identical_tabulation": True,
            "device_max_value_dev": round(max_dev, 8),
        }))


if __name__ == "__main__":
    main()
