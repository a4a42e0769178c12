"""Deep stage diagnostic for a still-diverging read (pass 1)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

from tombo_tpu import config
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.ops import ref_impl
from tombo_tpu.pipeline import resquiggle as rsq
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.batch import BatchedResquiggler, _ReadState
from tombo_tpu.testing import random_reference, simulate_read
from tombo_tpu.types import SeqSampleType, SequenceData
from tombo_tpu.config import MASK_FILL_Z_SCORE

samp_type = config.DNA_SAMP_TYPE
seed = 11
rng = np.random.default_rng(seed)
model = KmerModel.load_default(samp_type)
fasta = random_reference(np.random.default_rng(seed + 1), 60000)
aligner = ExactAligner(fasta)
sst = SeqSampleType(samp_type, False)
params = config.load_resquiggle_parameters(samp_type)

read_lens = [500, 600, 650, 700, 800]
mrs = []
for i in range(16):
    read = simulate_read(rng, fasta, model, read_id="x_%03d" % i,
                         read_len=int(read_lens[i % len(read_lens)]))
    mr = rsq.map_read(SequenceData(read.seq, read.read_id, 12.0),
                      aligner, model, sst)
    mr = mr.replace(raw_signal=read.raw_signal)
    mrs.append(rsq.adjust_map_res(mr, sst, params))

TARGET = 13
CHUNK = mrs[8:16]
POS = TARGET - 8
mr = mrs[TARGET]

# ---------------- single path pieces (pass 1, explicit)
num_mapped_bases = len(mr.genome_seq) - model.kmer_width + 1
num_events = rsq.compute_num_events(
    mr.raw_signal.shape[0], num_mapped_bases, params.mean_obs_per_event)
vc_s, norm_s, sv_s = rsq.segment_signal(
    mr, num_events, params, config.OUTLIER_THRESH)
em_s = ref_impl.new_means(norm_s, vc_s)

std_ref = model
dnstrm = std_ref.kmer_width - std_ref.central_pos - 1
r_means, r_sds = std_ref.get_exp_levels_from_seq(mr.genome_seq)
gseq = mr.genome_seq[std_ref.central_pos:-dnstrm]

mapped_start, epb = rsq.find_seq_start_in_events(
    em_s, r_means, r_sds, params, params.start_n_bases, params.start_bw, sst)
print("single: mapped_start=%d epb=%.17g" % (mapped_start, epb))

half_bw = params.bandwidth // 2
if mapped_start < half_bw:
    clip_s, mso = 0, mapped_start
else:
    clip_s, mso = mapped_start - half_bw, half_bw
cem = em_s[clip_s:]
fwd0, tb0, starts0, _ = rsq._masked_start_fwd_pass(
    cem, r_means, r_sds, mso, params, epb)
seq_len = r_means.shape[0]
fwd = np.empty((seq_len + 1, params.bandwidth))
fwd[:starts0.shape[0] + 1] = fwd0
tbm = np.zeros((seq_len + 1, params.bandwidth), np.int8)
tbm[:starts0.shape[0] + 1] = tb0
bes = np.empty(seq_len, np.int64)
bes[:starts0.shape[0]] = starts0
do_w = params.max_half_z_score is not None
ref_impl.adaptive_banded_forward_pass(
    fwd, tbm, bes, cem, r_means, r_sds, params.z_shift, params.skip_pen,
    params.stay_pen, starts0.shape[0], MASK_FILL_Z_SCORE, do_w,
    params.max_half_z_score if do_w else 0.0)
top = int(np.argmax(fwd[-1]))
read_tb = ref_impl.banded_traceback(tbm, bes, top, params.band_bound_thresh)
read_tb = rsq._trim_traceback(read_tb, events_len=em_s.shape[0] - clip_s)
seq_segs_s, rsrtr_s = rsq.get_rel_raw_coords(vc_s[clip_s:], read_tb)
print("single: dp rsrtr=%d segs[-1]=%d" % (rsrtr_s, seq_segs_s[-1]))

# ---------------- batch path internals on the chunk
br = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                        dtype=jnp.float64)
states = []
for idx, m in enumerate(CHUNK):
    raw = np.asarray(m.raw_signal, np.float64)
    nmb = len(m.genome_seq) - model.kmer_width + 1
    st = _ReadState(idx=idx, map_res=m, raw=raw, num_events=0)
    st.num_events = rsq.compute_num_events(
        raw.shape[0], nmb, params.mean_obs_per_event)
    st.n_ev = st.num_events - 1
    states.append(st)
br._plan_reads(states)
ctx = br._segment_batch(states)
s0 = states[POS]
print("batch: cpts equal:", np.array_equal(vc_s, s0.cpts))
em_b = np.asarray(ctx["em"][s0.dev_row], np.float64)[:s0.n_ev]
print("batch: em equal:", np.array_equal(em_s, em_b))

failed = br._start_discovery(states, ctx, params.start_bw,
                             check_score=True, precomputed=ctx.get("start"))
print("batch: mapped_start=%d epb=%.17g (failed=%s)" % (
    s0.mapped_start, s0.events_per_base, s0 in failed))

br._adaptive_batch(states, ctx)
br._static_reads(states, ctx)
print("batch: use_static=%s err=%s" % (s0.use_static, s0.error))
if hasattr(s0, "dp_segs"):
    print("batch: dp rsrtr=%d segs[-1]=%d" % (s0.dp_rsrtr, s0.dp_segs[-1]))
    eq = np.array_equal(seq_segs_s, s0.dp_segs)
    print("dp segs equal:", eq)
    if not eq:
        d = np.where(seq_segs_s != s0.dp_segs)[0]
        print("  ndiff %d first %s single %s batch %s" % (
            d.shape[0], d[:6], seq_segs_s[d[:4]], s0.dp_segs[d[:4]]))
        print("  has_del flag:", s0.has_del,
              "single n zero-diff:", int((np.diff(seq_segs_s) == 0).sum()))

# del fix comparison
norm_trim_s = norm_s[rsrtr_s:rsrtr_s + seq_segs_s[-1]]
from tombo_tpu.types import DpResults
dp_res_s = DpResults(rsrtr_s, seq_segs_s, r_means, r_sds, gseq)
segs_fix_s = rsq.resolve_skipped_bases_with_raw(
    dp_res_s, norm_trim_s, params)
br._finalize(states)
if s0.error is None and s0._segs is not None:
    print("post-delfix segs equal:", np.array_equal(segs_fix_s, s0._segs))

# theil-sen
(shift_s, scale_s, shc, scc) = rsq.calc_kmer_fitted_shift_scale(
    sv_s.shift, sv_s.scale, ref_impl.new_means(norm_trim_s, segs_fix_s),
    r_means, method="theil_sen")
print("single TS: shift=%.17g scale=%.17g" % (shift_s, scale_s))
if s0.result is not None:
    print("batch  TS: shift=%.17g scale=%.17g" % (
        s0.result.scale_values.shift, s0.result.scale_values.scale))

# ---- score-level comparison for the target read
from tombo_tpu.ops import segment as segm
from tombo_tpu.native import greedy_cpts_batch
p = params
w = p.running_stat_width
scores_h = ref_impl.cpt_scores_diff(norm_s, w)
# device scores from the padded batch
live = [s for s in states if s.error is None]
S_max = max(s.raw.shape[0] for s in live)
import tombo_tpu.pipeline.batch as bt
S_max = bt._pow2_bucket(S_max, 1024)
B = len(live)
raw_pad = np.zeros((B, S_max), np.float64)
sig_lens = np.array([s.raw.shape[0] for s in live], np.int64)
for i, s in enumerate(live):
    raw_pad[i, :s.raw.shape[0]] = s.raw
import tombo_tpu.ops.normalize as nrm
norm_j, shift_j, scale_j, lo_j, hi_j = nrm.normalize_median_batch(
    jnp.asarray(raw_pad), jnp.asarray(sig_lens), float(config.OUTLIER_THRESH))
norm_b_full = np.asarray(norm_j)[POS][:sig_lens[POS]]
print("norm equal:", np.array_equal(norm_s, norm_b_full))
scores_j = segm.cpt_scores_diff_batch(norm_j, jnp.asarray(sig_lens), w)
scores_b = np.asarray(scores_j)[POS][:sig_lens[POS] - 2 * w]
print("scores shapes", scores_h.shape, scores_b.shape)
eq = np.array_equal(scores_h, scores_b)
print("scores equal:", eq)
if not eq:
    d = np.where(scores_h != scores_b)[0]
    print("  ndiff %d first %s" % (d.shape[0], d[:5]))
    print("  h %s b %s" % (scores_h[d[:3]], scores_b[d[:3]]))

# selection on identical (host) scores: native vs device
cpts_n, status_n = greedy_cpts_batch(
    scores_h[None], np.array([scores_h.shape[0]]),
    np.array([num_events]), shift=w, min_base_obs=p.min_obs_per_base)
from tombo_tpu.ops import select as selm
sc_pad = np.full((1, scores_b.shape[0]), -1.0)
sc_pad[0] = scores_h
cpts_d, status_d = selm.greedy_cpts_device(
    jnp.asarray(sc_pad), jnp.asarray([scores_h.shape[0]]),
    jnp.asarray([num_events]), p.min_obs_per_base, w, num_events)
cpts_d = np.asarray(cpts_d)[0][:num_events]
print("selection on same scores equal:",
      np.array_equal(cpts_n[0][:num_events], cpts_d))
if not np.array_equal(cpts_n[0][:num_events], cpts_d):
    d = np.where(cpts_n[0][:num_events] != cpts_d)[0]
    print("  ndiff %d first %s native %s device %s" % (
        d.shape[0], d[:5], cpts_n[0][d[:4]], cpts_d[d[:4]]))
    # are there exact ties in scores?
    u, c = np.unique(scores_h, return_counts=True)
    print("  tied score values:", int((c > 1).sum()))
