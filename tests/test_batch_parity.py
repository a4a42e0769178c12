"""Batched TPU lane vs single-read reference path: results must agree."""
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


def _prep_reads(n_reads, samp_type, seed=7, **sim_kw):
    rng = np.random.default_rng(seed)
    model = KmerModel.load_default(samp_type)
    fasta = random_reference(np.random.default_rng(seed + 1), 30000)
    aligner = ExactAligner(fasta)
    seq_samp_type = SeqSampleType(samp_type,
                                  samp_type == config.RNA_SAMP_TYPE)
    params = config.load_resquiggle_parameters(samp_type)
    map_results, reads = [], []
    for i in range(n_reads):
        read = simulate_read(rng, fasta, model,
                             read_id="p_%03d" % i, **sim_kw)
        seq_data = SequenceData(read.seq, read.read_id, 12.0)
        mr = rsq.map_read(seq_data, aligner, model, seq_samp_type)
        mr = mr.replace(raw_signal=read.raw_signal)
        mr = rsq.adjust_map_res(mr, seq_samp_type, params)
        map_results.append(mr)
        reads.append(read)
    return model, params, seq_samp_type, map_results, reads


@pytest.mark.parametrize("samp_type,sim_kw", [
    (config.DNA_SAMP_TYPE, dict(read_len=650)),
])
def test_batch_matches_single(samp_type, sim_kw):
    model, params, sst, map_results, _ = _prep_reads(6, samp_type,
                                                     **sim_kw)
    # single-read reference results
    singles = []
    for mr in map_results:
        res = rsq.resquiggle_read_with_retries(
            mr, model, params,
            config.load_resquiggle_parameters(
                samp_type, use_save_bandwidth=True),
            outlier_thresh=config.OUTLIER_THRESH, seq_samp_type=sst)
        singles.append(res)

    # batched (float64 on CPU so results are comparable beyond fp ties)
    br = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                            dtype=jnp.float64)
    batch_out = br.resquiggle_batch(map_results)

    for i, ((b_res, b_err), s_res) in enumerate(zip(batch_out, singles)):
        assert b_err is None, (i, b_err)
        assert b_res.segs.shape[0] == s_res.segs.shape[0]
        assert b_res.read_start_rel_to_raw == s_res.read_start_rel_to_raw
        # identical except possibly a few co-optimal DP tie positions
        frac_eq = np.mean(b_res.segs == s_res.segs)
        assert frac_eq > 0.99, (i, frac_eq)
        # co-optimal tie boundaries shift event means slightly, so scores
        # and fitted scale parameters agree only to ~1e-2
        assert abs(b_res.sig_match_score - s_res.sig_match_score) < 1e-2
        sc = s_res.scale_values.scale
        assert abs(b_res.scale_values.shift -
                   s_res.scale_values.shift) / sc < 2e-3
        assert abs(b_res.scale_values.scale - sc) / sc < 2e-3
        assert b_res.genome_seq == s_res.genome_seq


def test_batch_long_read_save_bandwidth():
    """A long read through the batched lane at the save bandwidth (the
    retry lane for hard reads) matches the single-read path; on TPU this
    shape routes to the seq-axis-chunked Pallas kernels."""
    samp_type = config.DNA_SAMP_TYPE
    model, params, sst, map_results, _ = _prep_reads(
        1, samp_type, seed=23, read_len=8000)
    save_params = config.load_resquiggle_parameters(
        samp_type, use_save_bandwidth=True)
    single = rsq.resquiggle_read_with_retries(
        map_results[0], model, save_params, save_params,
        outlier_thresh=config.OUTLIER_THRESH, seq_samp_type=sst)
    br = BatchedResquiggler(model, save_params, sst, config.OUTLIER_THRESH,
                            dtype=jnp.float64)
    (res, err), = br.resquiggle_batch(map_results)
    assert err is None, err
    assert res.segs.shape[0] == single.segs.shape[0]
    assert np.mean(res.segs == single.segs) > 0.99


def test_batch_rna():
    model, params, sst, map_results, _ = _prep_reads(
        3, config.RNA_SAMP_TYPE, read_len=1700, mean_dwell=12.0,
        rev_sig=True, adapter_len=(600, 900))
    br = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                            dtype=jnp.float64)
    out = br.resquiggle_batch(map_results)
    for i, (res, err) in enumerate(out):
        assert err is None, (i, err)
        single = rsq.resquiggle_read_with_retries(
            map_results[i], model, params,
            config.load_resquiggle_parameters(
                config.RNA_SAMP_TYPE, use_save_bandwidth=True),
            outlier_thresh=config.OUTLIER_THRESH, seq_samp_type=sst)
        assert np.mean(res.segs == single.segs) > 0.99
        assert abs(res.sig_match_score - single.sig_match_score) < 1e-2


def test_finalize_delta_wire_format():
    """The device finalize's int16-delta wire format reconstructs the
    segment table exactly via host cumsum; a read with a >32767-sample
    segment (multi-second stall) raises the per-read overflow flag so the
    production path refetches its full int32 row instead."""
    import jax.numpy as jnp
    from tombo_tpu.pipeline import batch as pb

    B, L, C = 2, 8, 16
    cpts = np.cumsum(np.full((B, C), 10, np.int64), axis=1)
    cpts[1, 8:] += 40000          # one segment of 40010 raw samples
    rows = np.arange(B, dtype=np.int64)
    clips = np.zeros(B, np.int64)
    segs_dp = np.tile(np.arange(L + 1, dtype=np.int64), (B, 1))
    seq_lens = np.full(B, L, np.int64)
    ev_lens = np.full(B, C - 1, np.int64)
    seq_segs, d16, over, rsrtr, has_del = pb._stage_finalize(
        jnp.asarray(cpts), jnp.asarray(rows), jnp.asarray(clips),
        jnp.asarray(segs_dp), jnp.asarray(seq_lens), jnp.asarray(ev_lens),
        n_rows=L)
    full = np.asarray(seq_segs, np.int64)
    rec = np.zeros((B, L + 1), np.int64)
    np.cumsum(np.asarray(d16).astype(np.int64), axis=1, out=rec[:, 1:])
    over = np.asarray(over)
    assert not over[0] and over[1]
    np.testing.assert_array_equal(rec[0], full[0])
    assert not np.array_equal(rec[1], full[1])   # wrapped -> refetch path


def test_ragged_raw_wire_format():
    """Flat ragged signal upload + device scatter reproduces the dense
    padded int16 matrix bit for bit."""
    from tombo_tpu.pipeline.batch import _unflatten_rows, _geo_bucket
    rng = np.random.default_rng(3)
    lens = rng.integers(100, 5000, size=17)
    rows = [rng.integers(-2000, 2000, size=n).astype(np.int16)
            for n in lens]
    S = 5120
    dense = np.zeros((len(rows), S), np.int16)
    for i, r in enumerate(rows):
        dense[i, :r.shape[0]] = r
    flat = np.zeros(_geo_bucket(int(lens.sum())), np.int16)
    offs = np.zeros(len(rows), np.int32)
    o = 0
    for i, r in enumerate(rows):
        flat[o:o + r.shape[0]] = r
        offs[i] = o
        o += r.shape[0]
    out = np.asarray(_unflatten_rows(
        jnp.asarray(flat), jnp.asarray(offs),
        jnp.asarray(lens.astype(np.int32)), S))
    assert out.dtype == np.int16
    np.testing.assert_array_equal(out, dense)


@pytest.mark.parametrize("clip", [False, True])
def test_packed_codes_wire_format(clip):
    """2-bit packed bases + device k-mer derivation matches the dense
    sentinel-padded int code rows exactly (both clip modes)."""
    from tombo_tpu.pipeline.batch import _pack_bases, _codes_from_packed
    from tombo_tpu.seq import encode_seq, seq_to_kmer_codes
    rng = np.random.default_rng(11)
    k, width, n_sent = 6, 256, 4096
    seqs = ["".join(rng.choice(list("ACGT"), size=n))
            for n in [40, 200, 256 + k - 1, 400, 261]]
    B = len(seqs)
    PB = (width + k - 1 + 3) // 4
    packed = np.zeros((B, PB), np.uint8)
    n_codes = np.zeros(B, np.int32)
    dense = np.full((B, width), n_sent, np.int64)
    for i, s in enumerate(seqs):
        c = seq_to_kmer_codes(encode_seq(s), k)
        n_codes[i] = c.shape[0]
        if clip:
            if c.shape[0] >= width:
                dense[i] = c[:width]
        else:
            dense[i, :min(c.shape[0], width)] = c[:width]
        pb = _pack_bases(encode_seq(s).astype(np.uint8))
        m = min(PB, pb.shape[0])
        packed[i, :m] = pb[:m]
    out = np.asarray(_codes_from_packed(
        jnp.asarray(packed), jnp.asarray(n_codes),
        width, k, n_sent, clip))
    np.testing.assert_array_equal(out, dense.astype(np.int32))


def test_batch_device_fit_lane(monkeypatch):
    """The opt-in fused device finalize fit (TOMBO_TPU_DEV_FIT=1:
    on-device event means + Theil-Sen + score + changed mask) must match
    the host finalize lane within the f32 policy tolerances."""
    monkeypatch.setenv("TOMBO_TPU_DEV_FIT", "1")
    samp_type = config.DNA_SAMP_TYPE
    model, params, sst, map_results, _ = _prep_reads(
        6, samp_type, read_len=650)
    br = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                            dtype=jnp.float32)
    dev_out = br.resquiggle_batch(map_results)
    monkeypatch.setenv("TOMBO_TPU_DEV_FIT", "0")
    br2 = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                             dtype=jnp.float32)
    host_out = br2.resquiggle_batch(map_results)
    n_ok = 0
    for i, ((d_res, d_err), (h_res, h_err)) in enumerate(
            zip(dev_out, host_out)):
        assert (d_err is None) == (h_err is None), (i, d_err, h_err)
        if d_res is None:
            continue
        n_ok += 1
        assert np.mean(d_res.segs == h_res.segs) > 0.99, i
        assert d_res.read_start_rel_to_raw == h_res.read_start_rel_to_raw
        sc = h_res.scale_values.scale
        assert abs(d_res.scale_values.shift -
                   h_res.scale_values.shift) / sc < 1e-3, i
        assert abs(d_res.scale_values.scale - sc) / sc < 1e-3, i
        assert abs(d_res.sig_match_score - h_res.sig_match_score) < 1e-2, i
        assert d_res.raw_signal is not None
        np.testing.assert_allclose(d_res.raw_signal, h_res.raw_signal,
                                   rtol=1e-4, atol=1e-4)
    assert n_ok >= 5
