"""Multi-host scaling measurement under CPU emulation (VERDICT round 2,
next-round item 6).

Spawns 1-, 2- and 4-process ``jax.distributed`` clusters on localhost
(one pinned CPU core per emulated host — scaling numbers reflect the
distribution machinery, not core oversubscription), runs the full
multi-host resquiggle + de_novo detection flow on one shared synthetic
dataset, asserts the merged statistics are IDENTICAL for every host
count (the reference's process-count-invariance guarantee extended
across hosts; reference: docs/modified_base_detection.rst:151-153), and
writes ``MULTIHOST_r04.json`` at the repo root.

Usage: python scripts/multihost_bench.py [n_reads] [read_len]
"""
import glob
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORKER = os.path.join(REPO, "scripts", "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_run_state(ds_dir):
    for pat in (".fast5s.*.tombo.index*", "fast5s/.*.tombo.levels",
                ".fast5s.tombo.lock*", "mh*.tombo.stats"):
        for fn in glob.glob(os.path.join(ds_dir, pat)):
            os.unlink(fn)


def _stats_fingerprint(stats_fn):
    from tombo_tpu.stats.files import ModelStats
    st = ModelStats(stats_fn)
    out = []
    for chrm, strand, start, end, block in st:
        out.append((chrm, strand, start,
                    block["pos"].tolist(), block["frac"].tolist(),
                    block["cov"].tolist(), block["valid_cov"].tolist()))
    st.close()
    return out


def run_hosts(n, ds_dir, env):
    port = _free_port()
    outs = [os.path.join(ds_dir, "host%d_of_%d.json" % (i, n))
            for i in range(n)]
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(i), str(n), ds_dir,
         outs[i]], env=env) for i in range(n)]
    for p in procs:
        assert p.wait(timeout=1800) == 0, "worker failed"
    res = [json.load(open(o)) for o in outs]
    return {
        "rsq_s": max(r["rsq_s"] for r in res),
        "det_s": max(r["det_s"] for r in res),
        "n_success": sum(r["n_success"] for r in res),
        # per-host detail: hash-shard skew shows up as rsq_s spread
        "per_host_rsq_s": [round(r["rsq_s"], 3) for r in res],
        "per_host_det_s": [round(r["det_s"], 3) for r in res],
        "per_host_reads": [r["n_success"] for r in res],
        "psum_path": res[0].get("psum_path"),
    }


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    n_runs = int(os.environ.get("TOMBO_TPU_MH_RUNS", "3"))

    from tombo_tpu.testing import make_synthetic_dataset

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)

    result = {"metric": "multihost_scaling_cpu_emulated",
              "n_reads": n_reads, "read_len": read_len,
              "note": ("each emulated host pinned to ONE cpu core; "
                       "efficiency = T1 / (n * Tn) at fixed total work; "
                       "median of %d full runs (round-5 protocol: one "
                       "run cannot distinguish a regression from "
                       "shared-vCPU noise)" % n_runs)}
    runs = []
    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_dataset(tmp, n_reads=n_reads, seed=23,
                               read_len=read_len, ref_len=50000)
        for run_i in range(n_runs):
            rr = {}
            fps = {}
            for n in (1, 2, 4):
                _clean_run_state(tmp)
                # ALWAYS warm: a measured attempt to skip the warmup
                # pass on later sweeps put cold compile-cache loads and
                # first-touch I/O inside the timed window (and produced
                # one timing-dependent read failure), poisoning exactly
                # the run-to-run comparison the protocol exists for
                env["TOMBO_TPU_MH_WARM"] = "1"
                t0 = time.perf_counter()
                r = run_hosts(n, tmp, env)
                r["wall_s"] = time.perf_counter() - t0
                assert r["n_success"] >= n_reads * 0.95, r
                rr["hosts_%d" % n] = r
                fps[n] = _stats_fingerprint(
                    os.path.join(tmp, "mh%d.tombo.stats" % n))
                print("run %d n=%d rsq %.2fs det %.2fs (%d ok)" % (
                    run_i, n, r["rsq_s"], r["det_s"], r["n_success"]),
                    flush=True)
            # host-count invariance: identical merged statistics, every run
            rr["invariant_1_vs_2"] = fps[1] == fps[2]
            rr["invariant_1_vs_4"] = fps[1] == fps[4]
            assert rr["invariant_1_vs_2"], "2-host stats differ"
            assert rr["invariant_1_vs_4"], "4-host stats differ"
            for n in (2, 4):
                for phase in ("rsq_s", "det_s"):
                    t1 = rr["hosts_1"][phase]
                    tn = rr["hosts_%d" % n][phase]
                    rr["eff_%s_%dhosts" % (phase[:3], n)] = round(
                        t1 / (n * tn), 3)
            runs.append(rr)

    import statistics
    result["runs"] = runs
    for key in ("eff_rsq_2hosts", "eff_det_2hosts", "eff_rsq_4hosts",
                "eff_det_4hosts"):
        vals = [r[key] for r in runs]
        result[key] = round(statistics.median(vals), 3)
        result[key + "_runs"] = vals
    result["invariant_all_runs"] = all(
        r["invariant_1_vs_2"] and r["invariant_1_vs_4"] for r in runs)
    result["psum_path"] = runs[-1]["hosts_4"].get("psum_path")
    with open(os.path.join(REPO, "MULTIHOST_r05.json"), "w") as fp:
        json.dump(result, fp, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "runs"}))


if __name__ == "__main__":
    main()
