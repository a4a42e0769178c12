"""Ad-hoc check: native C++ baseline vs the Python single-read path.

Run with: PYTHONPATH=/root/repo:$PYTHONPATH JAX_PLATFORMS=cpu python scripts/baseline_parity_check.py
"""
import sys
import time

import numpy as np

from tombo_tpu import config, native
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline import resquiggle as rsq
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.testing import random_reference, simulate_read
from tombo_tpu.types import SeqSampleType, SequenceData

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
READ_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def main():
    rng = np.random.default_rng(1234)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    fasta = random_reference(np.random.default_rng(5), 60000)
    aligner = ExactAligner(fasta)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    save_params = config.load_resquiggle_parameters(
        config.DNA_SAMP_TYPE, use_save_bandwidth=True)
    smt = config.SIG_MATCH_THRESH[config.DNA_SAMP_TYPE]

    n_match = n_total = 0
    t_py = t_cc = 0.0
    for i in range(N_READS):
        read = simulate_read(rng, fasta, model, read_len=READ_LEN,
                             read_id="par_%05d" % i)
        seq_data = SequenceData(read.seq, read.read_id, 12.0)
        mr = rsq.map_read(seq_data, aligner, model, sst)
        mr = mr.replace(raw_signal=read.raw_signal.astype(np.float64))
        mr = rsq.adjust_map_res(mr, sst, params)

        t0 = time.perf_counter()
        try:
            py = rsq.resquiggle_read_with_retries(
                mr, model, params, save_params,
                outlier_thresh=config.OUTLIER_THRESH, seq_samp_type=sst)
            py_fail = None
        except Exception as e:  # noqa: BLE001
            py, py_fail = None, str(e)
        t_py += time.perf_counter() - t0

        ref_means, ref_sds = model.get_exp_levels_from_seq(mr.genome_seq)
        t0 = time.perf_counter()
        try:
            cc = native.resquiggle_read_baseline(
                mr.raw_signal, ref_means, ref_sds, params,
                config.OUTLIER_THRESH, smt)
            cc_fail = None
        except Exception as e:  # noqa: BLE001
            cc, cc_fail = None, str(e)
        t_cc += time.perf_counter() - t0

        n_total += 1
        if py is None or cc is None:
            print("read %d: py_fail=%r cc_fail=%r" % (i, py_fail, cc_fail))
            continue
        segs_cc, rsrtr_cc, scale_cc, score_cc = cc
        seg_eq = (py.segs.shape == segs_cc.shape and
                  np.array_equal(py.segs, segs_cc))
        rs_eq = py.read_start_rel_to_raw == rsrtr_cc
        sc_eq = np.allclose(
            [py.scale_values.shift, py.scale_values.scale],
            scale_cc[:2], rtol=0, atol=1e-9)
        score_eq = abs(py.sig_match_score - score_cc) < 1e-9
        ok = seg_eq and rs_eq and sc_eq and score_eq
        n_match += ok
        if not ok:
            print("read %d MISMATCH: segs=%s rsrtr=%s (%d vs %d) scale=%s "
                  "score=%s (%.9f vs %.9f)" %
                  (i, seg_eq, rs_eq, py.read_start_rel_to_raw, rsrtr_cc,
                   sc_eq, score_eq, py.sig_match_score, score_cc))
            if py.segs.shape == segs_cc.shape:
                d = np.where(py.segs != segs_cc)[0]
                print("   first diffs at", d[:10], py.segs[d[:5]],
                      segs_cc[d[:5]])

    print("match %d/%d   python %.1f ms/read   native %.2f ms/read  (%.1fx)"
          % (n_match, n_total, 1e3 * t_py / n_total, 1e3 * t_cc / n_total,
             t_py / max(t_cc, 1e-9)))


if __name__ == "__main__":
    main()
