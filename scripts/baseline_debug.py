"""Stage-by-stage divergence hunt: native baseline vs Python path."""
import ctypes

import numpy as np

from tombo_tpu import config, native
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.ops import ref_impl
from tombo_tpu.pipeline import resquiggle as rsq
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.testing import random_reference, simulate_read
from tombo_tpu.types import SeqSampleType, SequenceData


def main():
    rng = np.random.default_rng(1234)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    fasta = random_reference(np.random.default_rng(5), 60000)
    aligner = ExactAligner(fasta)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    smt = config.SIG_MATCH_THRESH[config.DNA_SAMP_TYPE]

    read = simulate_read(rng, fasta, model, read_len=1000, read_id="dbg")
    seq_data = SequenceData(read.seq, read.read_id, 12.0)
    mr = rsq.map_read(seq_data, aligner, model, sst)
    mr = mr.replace(raw_signal=read.raw_signal.astype(np.float64))
    mr = rsq.adjust_map_res(mr, sst, params)

    # ---- Python intermediates (first scaling iteration)
    num_mapped_bases = len(mr.genome_seq) - model.kmer_width + 1
    num_events = rsq.compute_num_events(
        mr.raw_signal.shape[0], num_mapped_bases, params.mean_obs_per_event)
    valid_cpts, norm_signal, nsv = rsq.segment_signal(
        mr, num_events, params, config.OUTLIER_THRESH)
    event_means = ref_impl.new_means(norm_signal, valid_cpts)
    r_ref_means, r_ref_sds = model.get_exp_levels_from_seq(mr.genome_seq)
    mapped_start, epb = rsq.find_seq_start_in_events(
        event_means, r_ref_means, r_ref_sds, params,
        params.start_n_bases, params.start_bw, sst)
    print("py: num_events=%d mapped_start=%d epb=%.6f  shift=%.6f scale=%.6f"
          % (num_events, mapped_start, epb, nsv.shift, nsv.scale))

    half_bw = params.bandwidth // 2
    if mapped_start < half_bw:
        esc, mso = 0, mapped_start
    else:
        esc, mso = mapped_start - half_bw, half_bw
    bes, valid_start, row_end = rsq.build_masked_start_plan(
        event_means.shape[0] - esc, mso, params, epb, config.MASK_BASES)
    print("py: esc=%d mso=%d mask_seq_len=%d n_ev_c=%d bes[:8]=%s"
          % (esc, mso, bes.shape[0], event_means.shape[0] - esc, bes[:8]))

    dp_res = rsq.find_adaptive_base_assignment(
        valid_cpts, event_means, params, model, mr.genome_seq,
        seq_samp_type=sst)
    print("py: rsrtr=%d segs[:6]=%s segs[-3:]=%s"
          % (dp_res.read_start_rel_to_raw, dp_res.segs[:6], dp_res.segs[-3:]))

    # ---- native, with debug taps
    from tombo_tpu.native import _as_c, get_lib
    lib = get_lib()
    lib.resquiggle_read_baseline_dbg.restype = ctypes.c_int
    seq_len = r_ref_means.shape[0]
    iparams = np.array([
        params.bandwidth, params.start_bw, params.start_save_bw,
        params.start_n_bases, params.running_stat_width,
        params.min_obs_per_base, params.mean_obs_per_event,
        params.raw_min_obs_per_base, params.band_bound_thresh,
        config.MASK_BASES, config.DEL_FIX_WINDOW, config.MAX_DEL_FIX_WINDOW,
        config.MAX_RAW_CPTS, 3, config.MAX_POINTS_FOR_THEIL_SEN], np.int64)
    dparams = np.array([
        params.z_shift, params.skip_pen, params.stay_pen,
        -1.0 if params.max_half_z_score is None else params.max_half_z_score,
        config.OUTLIER_THRESH, smt, config.MASK_FILL_Z_SCORE,
        config.MIN_EVENT_TO_SEQ_RATIO, config.EXTRA_SIG_FACTOR,
        config.SHIFT_CHANGE_THRESH, config.SCALE_CHANGE_THRESH], np.float64)
    segs = np.zeros(seq_len + 1, np.int64)
    rsrtr = np.zeros(1, np.int64)
    scale = np.zeros(4, np.float64)
    score = np.zeros(1, np.float64)
    dbg_i = np.full(6, -1, np.int64)
    dbg_epb = np.zeros(1, np.float64)
    dbg_tb = np.full(seq_len + 1, -7777, np.int64)
    raw = np.ascontiguousarray(mr.raw_signal, np.float64)
    code = lib.resquiggle_read_baseline_dbg(
        _as_c(raw, ctypes.c_double), raw.shape[0],
        _as_c(np.ascontiguousarray(r_ref_means), ctypes.c_double),
        _as_c(np.ascontiguousarray(r_ref_sds), ctypes.c_double),
        seq_len, _as_c(iparams, ctypes.c_int64),
        _as_c(dparams, ctypes.c_double), _as_c(segs, ctypes.c_int64),
        _as_c(rsrtr, ctypes.c_int64), _as_c(scale, ctypes.c_double),
        _as_c(score, ctypes.c_double), _as_c(dbg_i, ctypes.c_int64),
        _as_c(dbg_epb, ctypes.c_double), _as_c(dbg_tb, ctypes.c_int64))
    print("cc: code=%d num_events=%d mapped_start=%d epb=%.6f" %
          (code, dbg_i[0], dbg_i[1], dbg_epb[0]))
    print("cc: esc=%d mso=%d mask_seq_len=%d n_ev_c=%d" %
          (dbg_i[2], dbg_i[3], dbg_i[4], dbg_i[5]))
    if code == 0:
        print("cc: rsrtr=%d segs[:6]=%s segs[-3:]=%s" %
              (rsrtr[0], segs[:6], segs[-3:]))


if __name__ == "__main__":
    main()
