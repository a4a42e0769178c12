"""Diagnose batched-vs-single f64 divergence: stage-by-stage comparison.

Run: python scripts/diag_parity.py
"""
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
from tombo_tpu.pipeline import resquiggle as rsq
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.batch import BatchedResquiggler
from tombo_tpu.testing import random_reference, simulate_read
from tombo_tpu.types import SeqSampleType, SequenceData

samp_type = config.DNA_SAMP_TYPE
n_reads = 56
seed = 11
read_lens = [500, 600, 650, 700, 800]

rng = np.random.default_rng(seed)
model = KmerModel.load_default(samp_type)
fasta = random_reference(np.random.default_rng(seed + 1), 60000)
aligner = ExactAligner(fasta)
sst = SeqSampleType(samp_type, samp_type == config.RNA_SAMP_TYPE)
params = config.load_resquiggle_parameters(samp_type)
save_params = config.load_resquiggle_parameters(
    samp_type, use_save_bandwidth=True)
mrs = []
for i in range(n_reads):
    read = simulate_read(rng, fasta, model, read_id="x_%03d" % i,
                         read_len=int(read_lens[i % len(read_lens)]))
    mr = rsq.map_read(SequenceData(read.seq, read.read_id, 12.0),
                      aligner, model, sst)
    mr = mr.replace(raw_signal=read.raw_signal)
    mrs.append(rsq.adjust_map_res(mr, sst, params))

singles = []
for mr in mrs:
    try:
        singles.append(rsq.resquiggle_read_with_retries(
            mr, model, params, save_params,
            outlier_thresh=config.OUTLIER_THRESH, seq_samp_type=sst))
    except Exception as e:
        singles.append(e)

br = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                        dtype=jnp.float64)
batch_out = []
for c in range(0, n_reads, 8):
    batch_out.extend(br.resquiggle_batch(mrs[c:c + 8]))

div = []
for i, ((b_res, b_err), s_res) in enumerate(zip(batch_out, singles)):
    if isinstance(s_res, Exception) or b_res is None:
        continue
    frac_eq = float(np.mean(b_res.segs == s_res.segs))
    tag = "OK " if frac_eq == 1.0 else "DIV"
    if frac_eq < 1.0:
        div.append(i)
    print("%s read %2d iter=%d frac_eq=%.4f rsrtr %d/%d "
          "shift %.17g/%.17g scale %.17g/%.17g clip_active=%s" % (
              tag, i, s_res.norm_params_changed, frac_eq,
              b_res.read_start_rel_to_raw, s_res.read_start_rel_to_raw,
              b_res.scale_values.shift, s_res.scale_values.shift,
              b_res.scale_values.scale, s_res.scale_values.scale,
              "?"))

print("\ndiverging:", div)

# deep dive on the first diverging read: single path pass-by-pass
if div:
    i = div[0]
    mr = mrs[i]
    # first pass single
    r1 = rsq.resquiggle_read(mr, model, params, config.OUTLIER_THRESH,
                             seq_samp_type=sst)
    print("\nread %d single pass1: changed=%s shift=%.17g scale=%.17g" % (
        i, r1.norm_params_changed, r1.scale_values.shift,
        r1.scale_values.scale))
    # batch pass 1 only (max_scaling_iters=1, no retry lane since
    # result exists)
    b1 = br.resquiggle_batch([mr], max_scaling_iters=1)[0][0]
    print("read %d batch  pass1: changed=%s shift=%.17g scale=%.17g" % (
        i, b1.norm_params_changed, b1.scale_values.shift,
        b1.scale_values.scale))
    print("pass1 segs equal: %.4f  rsrtr %d/%d" % (
        float(np.mean(b1.segs == r1.segs)), b1.read_start_rel_to_raw,
        r1.read_start_rel_to_raw))

    if r1.norm_params_changed:
        # second pass single
        mr2 = mr.replace(scale_values=r1.scale_values)
        # compare changepoints pass2 vs pass1
        num_mapped_bases = len(mr.genome_seq) - model.kmer_width + 1
        num_events = rsq.compute_num_events(
            mr.raw_signal.shape[0], num_mapped_bases,
            params.mean_obs_per_event)
        vc1, ns1, sv1 = rsq.segment_signal(
            mr, num_events, params, config.OUTLIER_THRESH)
        vc2, ns2, sv2 = rsq.segment_signal(
            mr2, num_events, params, config.OUTLIER_THRESH)
        print("pass1 vs pass2 cpts equal:", np.array_equal(vc1, vc2),
              "n=%d" % vc1.shape[0])
        # how many samples clip in pass2?
        raw = np.asarray(mr.raw_signal, np.float64)
        sv = r1.scale_values
        unc = (raw - sv.shift) / sv.scale
        n_clip = int(np.sum((unc < sv.lower_lim) | (unc > sv.upper_lim)))
        print("pass2 clipped samples: %d / %d  (lims %.6g %.6g)" % (
            n_clip, raw.shape[0], sv.lower_lim, sv.upper_lim))
        if not np.array_equal(vc1, vc2):
            d = np.where(vc1 != vc2)[0]
            print("first cpt diffs at", d[:10], vc1[d[:5]], vc2[d[:5]])
