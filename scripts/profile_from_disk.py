"""Profile the from-disk resquiggle lane: where does end-to-end time go?

Mirrors bench.bench_from_disk but with TOMBO_TPU_PROFILE=1 stage timings
plus a cProfile over the timed pass (host-side hotspots).
"""
import cProfile
import io
import os
import pstats
import sys
import time

os.environ["TOMBO_TPU_PROFILE"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from tombo_tpu import config
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline import batch as pb
from tombo_tpu.pipeline.aligner import MinimizerAligner
from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
from tombo_tpu.testing import make_synthetic_dataset
from tombo_tpu.types import SeqSampleType

N_READS = int(os.environ.get("N_READS", "768"))
READ_LEN = int(os.environ.get("READ_LEN", "1000"))


def main():
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        fasta, _, fast5_dir = make_synthetic_dataset(
            tmp, n_reads=N_READS, seed=11, read_len=READ_LEN,
            ref_len=60000, noisy_frac=0.2, noisy_err=0.05)
        print("dataset build: %.1f s" % (time.perf_counter() - t0))
        aligner = MinimizerAligner(fasta)
        cfg = RunConfig(overwrite=True, batch_size=512, num_io_threads=4)
        t0 = time.perf_counter()
        summary, _ = resquiggle_all_reads(
            fast5_dir, aligner, model, sst, params, cfg)
        print("warm pass: %.1f s (%d ok)" % (time.perf_counter() - t0,
                                             summary.n_success))
        pb.STAGE_TIMINGS.clear()
        pb.TRANSFER_BYTES.clear()
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        summary, _ = resquiggle_all_reads(
            fast5_dir, aligner, model, sst, params, cfg)
        pr.disable()
        dt = time.perf_counter() - t0
        print("timed pass: %d ok in %.2f s -> %.1f reads/s" % (
            summary.n_success, dt, N_READS / dt))
        pb.print_stage_timings(sys.stdout)
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(35)
        print(s.getvalue())


if __name__ == "__main__":
    main()
