"""Find the FIRST diverging stage between batch and single on pass 1."""
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
from tombo_tpu.pipeline import batch as bt
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.batch import BatchedResquiggler, _ReadState
from tombo_tpu.testing import random_reference, simulate_read
from tombo_tpu.types import SeqSampleType, SequenceData

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
for i in range(8):
    read = simulate_read(rng, fasta, model, read_id="x_%03d" % i,
                         read_len=int(read_lens[i % len(read_lens)]))
    mr = rsq.map_read(SequenceData(read.seq, read.read_id, 12.0),
                      aligner, model, sst)
    mr = mr.replace(raw_signal=read.raw_signal)
    mrs.append(rsq.adjust_map_res(mr, sst, params))

TARGET = 0   # read 0 diverges
mr = mrs[TARGET]

# ---------------- single path pieces
num_mapped_bases = len(mr.genome_seq) - model.kmer_width + 1
num_events = rsq.compute_num_events(
    mr.raw_signal.shape[0], num_mapped_bases, params.mean_obs_per_event)
vc_s, norm_s, sv_s = rsq.segment_signal(
    mr, num_events, params, config.OUTLIER_THRESH)
em_s = ref_impl.new_means(norm_s, vc_s)

# ---------------- batch path pieces (drive internals on the 8-read batch)
br = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                        dtype=jnp.float64)
states = []
for idx, m in enumerate(mrs):
    raw = np.asarray(m.raw_signal, np.float64)
    nmb = len(m.genome_seq) - model.kmer_width + 1
    st = _ReadState(idx=idx, map_res=m, raw=raw, num_events=0)
    st.num_events = rsq.compute_num_events(
        raw.shape[0], nmb, params.mean_obs_per_event)
    st.n_ev = st.num_events - 1
    states.append(st)
br._plan_reads(states)
ctx = br._segment_batch(states)
s0 = states[TARGET]

print("num_events single=%d batch=%d" % (num_events, s0.num_events))
print("scale pre-fit: single shift=%.17g scale=%.17g" % (
    sv_s.shift, sv_s.scale))
print("               batch  shift=%.17g scale=%.17g" % (
    s0.scale_values.shift, s0.scale_values.scale))
print("lims single (%s, %s)  batch (%s, %s)" % (
    sv_s.lower_lim, sv_s.upper_lim,
    s0.scale_values.lower_lim, s0.scale_values.upper_lim))
print("cpts equal:", np.array_equal(vc_s, s0.cpts),
      "n %d/%d" % (vc_s.shape[0], s0.cpts.shape[0]))
if not np.array_equal(vc_s, s0.cpts):
    d = np.where(vc_s != s0.cpts)[0]
    print("  first diffs idx", d[:8], "single", vc_s[d[:4]],
          "batch", s0.cpts[d[:4]])

# event means: device vs host
em_b = np.asarray(ctx["em"][s0.dev_row], np.float64)[:s0.n_ev]
print("event means equal:", np.array_equal(em_s, em_b))
if not np.array_equal(em_s, em_b):
    d = np.where(em_s != em_b)[0]
    rel = np.abs(em_s[d] - em_b[d]) / np.abs(em_s[d])
    print("  %d/%d differ, max rel %.3g, first idx %s" % (
        d.shape[0], em_s.shape[0], rel.max(), d[:8]))

# norm signal: host recompute vs single
norm_b = br._host_norm(s0)
print("norm equal:", np.array_equal(norm_s, norm_b))
if not np.array_equal(norm_s, norm_b):
    d = np.where(norm_s != norm_b)[0]
    print("  %d/%d differ" % (d.shape[0], norm_s.shape[0]))

# start discovery
mapped_start_s, epb_s = rsq.find_seq_start_in_events(
    em_s, s0.ref_means, s0.ref_sds, params, params.start_n_bases,
    params.start_bw, sst)
start_segs, start_score = ctx["start"]
tb_b = start_segs[s0.dev_row]
print("start: single mapped=%d epb=%.17g" % (mapped_start_s, epb_s))
print("       batch  mapped=%d epb=%.17g score=%.17g" % (
    tb_b[0], (tb_b[-1] - tb_b[0]) / len(tb_b), start_score[s0.dev_row]))
