"""K-mer model I/O: npz/HDF5 round-trips, lookup semantics."""
import os

import numpy as np
import pytest

from tombo_tpu import config
from tombo_tpu.io.model_io import AltModel, KmerModel
from tombo_tpu.seq import encode_seq, seq_to_kmer_codes


def test_load_default_dna_model():
    m = KmerModel.load_default(config.DNA_SAMP_TYPE)
    assert m.kmer_width == 6
    assert m.central_pos == 2
    assert m.means.shape == (4096,)
    assert not np.any(np.isnan(m.means))
    # the reference DNA model has a constant sd ~0.3529 (SURVEY.md §2)
    assert np.allclose(m.sds, m.sds[0])
    assert 0.3 < m.sds[0] < 0.4


def test_exp_levels_from_seq():
    m = KmerModel.load_default(config.DNA_SAMP_TYPE)
    seq = "ACGTACGTACGTAC"
    means, sds = m.get_exp_levels_from_seq(seq)
    assert means.shape[0] == len(seq) - m.kmer_width + 1
    codes = seq_to_kmer_codes(encode_seq(seq), 6)
    np.testing.assert_array_equal(means, m.means[codes])


def test_hdf5_roundtrip(tmp_path):
    m = KmerModel.load_default(config.DNA_SAMP_TYPE)
    fn = str(tmp_path / "model.h5")
    m.write_model(fn)
    m2 = KmerModel.load(fn)
    np.testing.assert_allclose(m.means, m2.means)
    np.testing.assert_allclose(m.sds, m2.sds)
    assert m2.central_pos == m.central_pos


def test_alt_model_lookup():
    alt = AltModel.load_default("5mC", config.DNA_SAMP_TYPE)
    assert alt is not None
    assert alt.kmer_width == 6
    assert alt.alt_base == "C"
    # all-context alt models have entries for every position containing C
    codes = seq_to_kmer_codes(encode_seq("ACCGTACCGTA"), 6)
    means, sds = alt.get_exp_levels_from_kmer_codes(codes[:6])
    assert means.shape == (6,)


def test_alt_hdf5_roundtrip(tmp_path):
    alt = AltModel.load_default("dam", config.DNA_SAMP_TYPE)
    fn = str(tmp_path / "alt.h5")
    alt.write_model(fn)
    alt2 = AltModel.load(fn)
    valid = ~np.isnan(alt.means)
    np.testing.assert_allclose(alt.means[valid], alt2.means[valid])
    assert alt2.motif.raw_motif == "GATC"
    assert alt2.motif.mod_pos == 2


def test_reverse_sequence_copy():
    m = KmerModel.load_default(config.DNA_SAMP_TYPE)
    r = m.reverse_sequence_copy()
    assert r.central_pos == m.kmer_width - m.central_pos - 1
    seq = "AACGTTCA"
    f_means, _ = m.get_exp_levels_from_seq(seq)
    r_means, _ = r.get_exp_levels_from_seq(seq[::-1])
    np.testing.assert_allclose(f_means, r_means[::-1])
