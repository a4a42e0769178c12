"""One emulated host of the multi-host scaling bench.

Usage: _multihost_worker.py <port> <pid> <n_hosts> <dataset_dir> <out_json>

Pins itself to ONE cpu core (each emulated host gets one core, so the
measured scaling reflects the distribution machinery — sharding skew,
cross-host reductions, duplicated region scans — not core
oversubscription), joins an ``n_hosts``-process jax.distributed cluster
on localhost, then times the two multi-host phases on its shard:

1. resquiggle (hash-sharded FAST5 files, per-host index shard)
2. de_novo detection (read-sharded accumulators + cross-host psum)
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["TOMBO_TPU_LEVELS_SIDECAR"] = "0"   # no cross-run I/O caching
# each emulated host owns ONE pinned core; XLA's Eigen pool otherwise
# spawns hardware_concurrency() SPIN-WAITING workers per process, and at
# 4 hosts those spinners steal whole cores from other hosts' real work
# (measured 4-5x per-read slowdown).  One intra-op thread per host.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_cpu_multi_thread_eigen=false "
                           "intra_op_parallelism_threads=1").strip()
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    port, pid, n, ds_dir, out_json = sys.argv[1:6]
    pid, n = int(pid), int(n)
    try:
        ncores = len(os.sched_getaffinity(0))
        os.sched_setaffinity(0, {pid % ncores})
    except (AttributeError, OSError):
        pass

    # join the cluster BEFORE any import that might initialize the XLA
    # backend (jax.distributed.initialize must run first)
    from tombo_tpu.parallel.distributed import DistContext, init_distributed
    if n > 1:
        dist = init_distributed("localhost:%s" % port, n, pid)
    else:
        dist = DistContext()

    from tombo_tpu import config
    from tombo_tpu.io.fasta import Fasta
    from tombo_tpu.io.index import ReadsIndex
    from tombo_tpu.io.model_io import KmerModel
    from tombo_tpu.pipeline.aligner import ExactAligner
    from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
    from tombo_tpu.stats import detect as dt
    from tombo_tpu.stats.files import DE_NOVO_TXT

    fast5_dir = os.path.join(ds_dir, "fast5s")
    fasta = Fasta(os.path.join(ds_dir, "reference.fasta"))
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    sst_params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    from tombo_tpu.types import SeqSampleType
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    aligner = ExactAligner(fasta)

    # warmup outside the timed window: compile/load the device programs
    # for this process (shared on-disk jax cache); later sweeps of the
    # median-of-3 protocol skip it — the disk caches are already warm
    if os.environ.get("TOMBO_TPU_MH_WARM", "1") == "1":
        resquiggle_all_reads(
            fast5_dir, aligner, model, sst, sst_params,
            RunConfig(overwrite=True, batch_size=32, num_io_threads=2,
                      dist=dist, skip_index=True, dry_run=True,
                      ignore_read_locks=True))

    t0 = time.perf_counter()
    summary, _ = resquiggle_all_reads(
        fast5_dir, aligner, model, sst, sst_params,
        RunConfig(overwrite=True, batch_size=32, num_io_threads=2,
                  dist=dist, ignore_read_locks=True))
    rsq_s = time.perf_counter() - t0

    if n > 1:
        # barrier so detection sees every host's index shard + writeback
        from tombo_tpu.parallel.distributed import psum_hosts
        import numpy as np
        psum_hosts(dist, np.zeros(1, np.int64))

    index = ReadsIndex([fast5_dir])
    thresh = config.DE_NOVO_THRESH[config.DNA_SAMP_TYPE]
    params = dt.TestParams(
        stat_type=DE_NOVO_TXT, single_read_thresh=thresh[1],
        lower_thresh=thresh[0], region_size=1000)
    stats_fn = os.path.join(ds_dir, "mh%d.tombo.stats" % n)
    # warm pass: the merge collectives' jitted programs compile on
    # first use (one per width bucket); timing them would measure the
    # compiler, not the distribution machinery (resquiggle is warmed
    # the same way above)
    dt.test_significance(index, params, stats_fn + ".warm", fasta=fasta,
                         std_ref=model, num_processes=1, dist=dist)
    t0 = time.perf_counter()
    dt.test_significance(index, params, stats_fn, fasta=fasta,
                         std_ref=model, num_processes=1, dist=dist)
    det_s = time.perf_counter() - t0

    from tombo_tpu.parallel import distributed as dst
    with open(out_json, "w") as fp:
        json.dump({"host": pid, "n_hosts": n, "rsq_s": rsq_s,
                   "det_s": det_s, "n_success": summary.n_success,
                   "psum_path": dst.LAST_PSUM_PATH["path"]},
                  fp)


if __name__ == "__main__":
    main()
