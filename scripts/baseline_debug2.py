"""Per-iteration divergence hunt on one read (default: the parity-check
read index given by argv[1])."""
import sys

import numpy as np

from tombo_tpu import config, native
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline import resquiggle as rsq
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.testing import random_reference, simulate_read
from tombo_tpu.types import SeqSampleType, SequenceData

IDX = int(sys.argv[1]) if len(sys.argv) > 1 else 35


def main():
    rng = np.random.default_rng(1234)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    fasta = random_reference(np.random.default_rng(5), 60000)
    aligner = ExactAligner(fasta)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    smt = config.SIG_MATCH_THRESH[config.DNA_SAMP_TYPE]

    for i in range(IDX + 1):
        read = simulate_read(rng, fasta, model, read_len=1000,
                             read_id="par_%05d" % i)
    seq_data = SequenceData(read.seq, read.read_id, 12.0)
    mr = rsq.map_read(seq_data, aligner, model, sst)
    mr = mr.replace(raw_signal=read.raw_signal.astype(np.float64))
    mr = rsq.adjust_map_res(mr, sst, params)
    ref_means, ref_sds = model.get_exp_levels_from_seq(mr.genome_seq)

    # python, iteration by iteration
    cur = mr
    for it in range(3):
        res = rsq.resquiggle_read(cur, model, params, config.OUTLIER_THRESH,
                                  seq_samp_type=sst)
        print("py it%d: shift=%.12f scale=%.12f changed=%s rsrtr=%d "
              "segsum=%d score=%.12f" %
              (it, res.scale_values.shift, res.scale_values.scale,
               res.norm_params_changed, res.read_start_rel_to_raw,
               int(res.segs.sum()), res.sig_match_score))
        if not res.norm_params_changed:
            break
        cur = mr.replace(scale_values=res.scale_values)

    for max_iters in (1, 2, 3):
        try:
            segs, rsrtr, scale, score = native.resquiggle_read_baseline(
                mr.raw_signal, ref_means, ref_sds, params,
                config.OUTLIER_THRESH, smt, max_scaling_iters=max_iters)
            print("cc n=%d: shift=%.12f scale=%.12f rsrtr=%d segsum=%d "
                  "score=%.12f" % (max_iters, scale[0], scale[1], rsrtr,
                                   int(segs.sum()), score))
        except Exception as e:  # noqa: BLE001
            print("cc n=%d: FAIL %s" % (max_iters, e))


if __name__ == "__main__":
    main()
