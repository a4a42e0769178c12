"""Worker process for the multi-host detection test.

Usage: python _dist_detect_worker.py <port> <process_id> <n_processes>
           <fast5_dir> <fasta_fn> <out_prefix>

Joins a 2-process jax.distributed cluster on localhost, runs de-novo
(read-sharded + cross-host psum) and KS (region-sharded) detection, and
lets the main host write ``<out_prefix>.denovo`` / ``<out_prefix>.ks``.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    port, pid, n, fast5_dir, fasta_fn, out_prefix = sys.argv[1:7]
    from tombo_tpu import config
    from tombo_tpu.io.fasta import Fasta
    from tombo_tpu.io.index import ReadsIndex
    from tombo_tpu.io.model_io import KmerModel
    from tombo_tpu.parallel.distributed import init_distributed
    from tombo_tpu.stats import detect as dt
    from tombo_tpu.stats.files import DE_NOVO_TXT, KS_TEST_TXT

    dist = init_distributed("localhost:%s" % port, int(n), int(pid))
    index = ReadsIndex([fast5_dir])
    fasta = Fasta(fasta_fn)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)

    thresh = config.DE_NOVO_THRESH[config.DNA_SAMP_TYPE]
    params = dt.TestParams(
        stat_type=DE_NOVO_TXT, single_read_thresh=thresh[1],
        lower_thresh=thresh[0], region_size=1000, num_most_signif=500)
    dt.test_significance(index, params, out_prefix + ".denovo",
                         fasta=fasta, std_ref=model, num_processes=2,
                         dist=dist)
    from tombo_tpu.parallel import distributed as dst
    print("PSUM_PATH=%s" % dst.LAST_PSUM_PATH["path"])

    params = dt.TestParams(
        stat_type=KS_TEST_TXT, single_read_thresh=None, lower_thresh=None,
        region_size=1000, num_most_signif=500, min_test_reads=1)
    dt.test_significance(index, params, out_prefix + ".ks",
                         ctrl_reads_index=index, num_processes=2,
                         dist=dist)
    print("WORKER_%s_DONE" % pid)


if __name__ == "__main__":
    main()
