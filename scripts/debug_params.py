#!/usr/bin/env python3
"""Grid-search re-squiggle signal-alignment parameters on a dataset.

Python equivalent of the reference's R-based parameter debug workflow
(reference: tombo/resquiggle.py:83-105 _DEBUG_PARAMS +
scripts/debug_params.R): runs the batched lane over a FAST5 directory for
each (match_evalue, skip_pen, bandwidth) combination and reports mean
signal-match score and failure counts.
"""
import argparse
import itertools
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from tombo_tpu import config
from tombo_tpu.io.fasta import Fasta
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline.aligner import ExactAligner, MappyAligner
from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
from tombo_tpu.errors import TomboTpuError
from tombo_tpu.types import SeqSampleType


def main():
    p = argparse.ArgumentParser()
    p.add_argument("fast5_basedir")
    p.add_argument("reference")
    p.add_argument("--match-evalues", type=float, nargs="+",
                   default=[4.2, 5.0, 6.0])
    p.add_argument("--skip-pens", type=float, nargs="+",
                   default=[4.2, 6.0, 8.0])
    p.add_argument("--bandwidths", type=int, nargs="+",
                   default=[300, 500])
    p.add_argument("--rna", action="store_true")
    args = p.parse_args()

    samp = config.RNA_SAMP_TYPE if args.rna else config.DNA_SAMP_TYPE
    sst = SeqSampleType(samp, args.rna)
    model = KmerModel.load_default(samp)
    try:
        aligner = MappyAligner(args.reference)
    except TomboTpuError:
        aligner = ExactAligner(Fasta(args.reference))

    print("match_evalue\tskip_pen\tbandwidth\tn_ok\tn_fail\t"
          "mean_sig_match_score")
    for me, sp, bw in itertools.product(
            args.match_evalues, args.skip_pens, args.bandwidths):
        z_shift, stay_pen = config.get_dynamic_prog_params(me)
        params = config.load_resquiggle_parameters(samp).replace(
            match_evalue=me, skip_pen=sp, bandwidth=bw,
            z_shift=z_shift, stay_pen=stay_pen)
        summary, idx = resquiggle_all_reads(
            args.fast5_basedir, aligner, model, sst, params,
            RunConfig(overwrite=True))
        scores = [rd.sig_match_score for rd in idx.iter_reads()
                  if rd.sig_match_score is not None] if idx else []
        print("%g\t%g\t%d\t%d\t%d\t%.4f" % (
            me, sp, bw, summary.n_success, summary.n_failed,
            float(np.mean(scores)) if scores else float("nan")))


if __name__ == "__main__":
    main()
