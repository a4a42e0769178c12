"""Model estimation: canonical, motif-alt, and KDE alt models."""
import os

import numpy as np
import pytest

from tombo_tpu import config
from tombo_tpu.io.index import ReadsIndex
from tombo_tpu.io.model_io import AltModel, KmerModel
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
from tombo_tpu.seq import all_kmers, encode_seq, seq_to_kmer_codes
from tombo_tpu.stats import estimate as est
from tombo_tpu.testing import make_synthetic_dataset
from tombo_tpu.types import SeqSampleType


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("est_ds"))
    fasta, reads, fast5_dir = make_synthetic_dataset(
        tmp, n_reads=24, seed=5, read_len=500, ref_len=2000)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    summary, _ = resquiggle_all_reads(
        fast5_dir, ExactAligner(fasta), model,
        SeqSampleType(config.DNA_SAMP_TYPE, False),
        config.load_resquiggle_parameters(config.DNA_SAMP_TYPE),
        RunConfig(overwrite=True, batch_size=8, num_io_threads=2))
    assert summary.n_success >= 22
    return tmp, fasta, model, ReadsIndex([fast5_dir])


def test_estimate_canonical_3mer(dataset):
    tmp, fasta, model6, index = dataset
    est_ref = est.estimate_kmer_model(
        index, fasta, cov_thresh=1, upstrm_bases=1, dnstrm_bases=1,
        min_kmer_obs=1, kmer_specific_sd=False, cs_cov_thresh=None,
        region_size=1000)
    assert est_ref.kmer_width == 3
    assert est_ref.central_pos == 1
    assert np.isfinite(est_ref.means).all()
    # constant SD applied
    assert np.allclose(est_ref.sds, est_ref.sds[0])
    # estimated levels must correlate with the generating 6-mer model
    # marginalized onto its central trimer
    tri_sum = np.zeros(64)
    tri_n = np.zeros(64)
    k6, c6 = model6.kmer_width, model6.central_pos
    for code, km in enumerate(all_kmers(k6)):
        tri = km[c6 - 1:c6 + 2]
        tcode = int(seq_to_kmer_codes(encode_seq(tri), 3)[0])
        tri_sum[tcode] += model6.means[code]
        tri_n[tcode] += 1
    tri_means = tri_sum / tri_n
    r = np.corrcoef(tri_means, est_ref.means)[0, 1]
    assert r > 0.7, r

    # model round-trips through the reference HDF5 format
    fn = os.path.join(tmp, "est.model")
    est_ref.write_model(fn)
    loaded = KmerModel.load(fn)
    np.testing.assert_allclose(loaded.means, est_ref.means)
    assert loaded.central_pos == 1


def test_estimate_motif_alt(dataset):
    tmp, fasta, model6, index = dataset
    alt_ref = est.estimate_motif_alt_model(
        index, fasta, "C:1", upstrm_bases=1, dnstrm_bases=1,
        min_kmer_obs=1, cov_thresh=1, cs_cov_thresh=None,
        region_size=1000)
    assert alt_ref.kmer_width == 3
    assert alt_ref.motif.raw_motif == "C"
    # entries exist only for k-mers containing C at the mod offset
    has_entry = ~np.isnan(alt_ref.means)
    assert has_entry.any()
    for code, km in enumerate(all_kmers(3)):
        for pos in range(3):
            if has_entry[code, pos]:
                assert km[pos] == "C", (km, pos)

    fn = os.path.join(tmp, "alt.model")
    alt_ref.write_model(fn)
    loaded = AltModel.load(fn)
    np.testing.assert_allclose(
        np.nan_to_num(loaded.means), np.nan_to_num(alt_ref.means))


def test_estimate_alt_kde(dataset, tmp_path):
    tmp, fasta, model6, index = dataset
    std3 = est.estimate_kmer_model(
        index, fasta, cov_thresh=1, upstrm_bases=1, dnstrm_bases=1,
        min_kmer_obs=1, kmer_specific_sd=False, cs_cov_thresh=None,
        region_size=1000)
    # simulate an "alternative" sample: C-containing 6-mers shifted up,
    # resquiggled against the canonical model
    alt_model = KmerModel(model6.means.copy(), model6.sds.copy(),
                          model6.central_pos)
    for code, km in enumerate(all_kmers(model6.kmer_width)):
        if "C" in km:
            alt_model.means[code] += 1.0
    from tombo_tpu.testing import simulate_read, write_synthetic_fast5
    alt_dir = str(tmp_path / "alt_fast5s")
    os.makedirs(alt_dir, exist_ok=True)
    rng = np.random.default_rng(6)
    for i in range(24):
        read = simulate_read(rng, fasta, alt_model, read_len=500,
                             read_id="alt_%04d" % i)
        write_synthetic_fast5(
            os.path.join(alt_dir, read.read_id + ".fast5"), read)
    summary, _ = resquiggle_all_reads(
        alt_dir, ExactAligner(fasta), model6,
        SeqSampleType(config.DNA_SAMP_TYPE, False),
        config.load_resquiggle_parameters(config.DNA_SAMP_TYPE),
        RunConfig(overwrite=True, batch_size=8, num_io_threads=2))
    assert summary.n_success >= 10
    alt_index = ReadsIndex([alt_dir])

    dens_bn = os.path.join(tmp, "dens")
    alt_ref = est.estimate_alt_model(
        alt_index, index, std3, alt_base="C", alt_frac_pctl=5,
        kmer_obs_thresh=10, density_basename=dens_bn,
        kernel_dens_bw=0.05)
    assert alt_ref.kmer_width == 3
    assert alt_ref.alt_base == "C"
    has_entry = ~np.isnan(alt_ref.means)
    assert has_entry.any()
    # density files written and parse back
    alt_dens_fn = dens_bn + ".alternate_density.txt"
    std_dens_fn = dens_bn + ".control_density.txt"
    assert os.path.exists(alt_dens_fn) and os.path.exists(std_dens_fn)
    alt2 = est.estimate_alt_model(
        None, None, std3, alt_base="C", alt_frac_pctl=5,
        kmer_obs_thresh=10, alt_dens_fn=alt_dens_fn,
        std_dens_fn=std_dens_fn)
    np.testing.assert_allclose(np.nan_to_num(alt2.means),
                               np.nan_to_num(alt_ref.means))


def test_process_workers_match_threads(dataset, monkeypatch):
    """Spawn-worker k-mer level extraction == thread-pool extraction."""
    tmp, fasta, model6, index = dataset

    def run():
        out = est.extract_kmer_levels(
            index, fasta, region_size=1000, cov_thresh=1,
            upstrm_bases=1, dnstrm_bases=1, cs_cov_thresh=None,
            num_processes=2)
        merged = {}
        for reg_levels in out:
            for km, vals in reg_levels.items():
                merged.setdefault(km, []).extend(vals)
        return merged

    monkeypatch.setenv("TOMBO_TPU_EST_PROCS", "0")
    thr = run()
    monkeypatch.setenv("TOMBO_TPU_EST_PROCS", "1")
    proc = run()
    assert set(thr) == set(proc)
    for km in thr:
        assert sorted(thr[km]) == sorted(proc[km])
