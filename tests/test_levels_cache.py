"""Per-directory read-levels sidecar: warm detection without HDF5."""
import glob
import os
import struct

import numpy as np
import pytest

from tombo_tpu import config
from tombo_tpu.io.index import ReadsIndex
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
from tombo_tpu.stats import ModelStats
from tombo_tpu.stats import detect as dt
from tombo_tpu.stats import levels_cache as lc
from tombo_tpu.stats import region as rg
from tombo_tpu.stats.files import DE_NOVO_TXT
from tombo_tpu.testing import make_synthetic_dataset
from tombo_tpu.types import SeqSampleType


@pytest.fixture(scope="module")
def resquiggled(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("lc_ds"))
    fasta, reads, fast5_dir = make_synthetic_dataset(
        tmp, n_reads=8, seed=41, read_len=400)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    summary, _ = resquiggle_all_reads(
        fast5_dir, ExactAligner(fasta), model, sst, params,
        RunConfig(overwrite=True, batch_size=4, num_io_threads=2))
    assert summary.n_success == 8
    return tmp, fasta, model, ReadsIndex([fast5_dir]), fast5_dir


def _detect(tmp, fasta, model, index, name):
    thresh = config.DE_NOVO_THRESH[config.DNA_SAMP_TYPE]
    params = dt.TestParams(
        stat_type=DE_NOVO_TXT, single_read_thresh=thresh[1],
        lower_thresh=thresh[0], region_size=1000, num_most_signif=500)
    fn = os.path.join(tmp, name + ".tombo.stats")
    dt.test_significance(index, params, fn, fasta=fasta, std_ref=model,
                         num_processes=2)
    return fn


def _all_stats(fn, fasta):
    st = ModelStats(fn)
    chrm = fasta.iter_chrms()[0]
    out = {}
    for strand in "+-":
        a = st.get_reg_stats(chrm, strand, 0, 10 ** 9)
        out[strand] = None if a is None else np.sort(a, order="pos")
    st.close()
    return out


def test_sidecar_builds_and_serves_without_hdf5(resquiggled, monkeypatch):
    """Run 1 builds the sidecar from FAST5 loads; run 2 must produce the
    identical stats file with HDF5 access forbidden."""
    tmp, fasta, model, index, fast5_dir = resquiggled
    rg.clear_levels_cache()
    fn1 = _detect(tmp, fasta, model, index, "cold")
    # resquiggle itself now builds writer-shard sidecars (.w*), so
    # the cold detection run may already be a full cache hit
    caches = glob.glob(os.path.join(fast5_dir, ".*.tombo.levels*"))
    assert caches, "no sidecar present after the cold run"

    def _no_h5(r_data):
        raise AssertionError("HDF5 touched on a warm run: %s" % r_data.fn)

    rg.clear_levels_cache()
    monkeypatch.setattr(rg, "_load_levels_raw", _no_h5)
    fn2 = _detect(tmp, fasta, model, index, "warm")
    a, b = _all_stats(fn1, fasta), _all_stats(fn2, fasta)
    for strand in "+-":
        if a[strand] is None:
            assert b[strand] is None
            continue
        np.testing.assert_array_equal(a[strand], b[strand])


def test_estimate_builds_and_uses_sidecar(resquiggled, monkeypatch,
                                          tmp_path):
    """Model-estimation k-mer level extraction populates the sidecar on a
    cold run and is served entirely from it (no HDF5) on a warm run."""
    from tombo_tpu.stats import estimate as est
    tmp, fasta, model, index, fast5_dir = resquiggled
    for fn in glob.glob(os.path.join(fast5_dir, ".*.tombo.levels*")):
        os.unlink(fn)
    rg.clear_levels_cache()

    def _run():
        return est.extract_kmer_levels(
            index, fasta, region_size=1000, cov_thresh=1,
            upstrm_bases=1, dnstrm_bases=1, cs_cov_thresh=None)

    ref = _run()
    assert glob.glob(os.path.join(fast5_dir, ".*.tombo.levels")), \
        "estimation did not build the sidecar"

    def _no_h5(r_data):
        raise AssertionError("HDF5 touched on a warm run: %s" % r_data.fn)

    rg.clear_levels_cache()
    monkeypatch.setattr(rg, "_load_levels_raw", _no_h5)
    warm = _run()
    assert len(ref) == len(warm)
    for a, b in zip(ref, warm):
        assert set(a) == set(b)
        for km in a:
            np.testing.assert_array_equal(a[km], b[km])


def test_sidecar_stale_entries_fall_back(resquiggled, monkeypatch):
    """A rewritten FAST5 (changed mtime/size) must not be served from the
    sidecar: its read falls back to the HDF5 loader."""
    tmp, fasta, model, index, fast5_dir = resquiggled
    f5s = sorted(glob.glob(os.path.join(fast5_dir, "*.fast5")))
    victim = f5s[0]
    with open(victim, "ab") as fp:       # size + mtime change
        fp.write(b"\0")
    raw_calls = []
    orig = rg._load_levels_raw

    def counting(r_data):
        raw_calls.append(r_data.fn)
        return orig(r_data)

    rg.clear_levels_cache()
    monkeypatch.setattr(rg, "_load_levels_raw", counting)
    _detect(tmp, fasta, model, index, "stale")
    assert set(raw_calls) == {victim}


def test_builder_recovers_truncated_tail(tmp_path):
    """A crashed writer's partial trailing record is ignored by readers
    and truncated away by the next builder."""
    path = str(tmp_path / "x.tombo.levels")
    b = lc.LevelsCacheBuilder(path)
    b.add("a.fast5", "G", "rid-a", 1, 2, np.arange(5.0), "ACGTT")
    b.finalize()
    good_size = os.path.getsize(path)
    with open(path, "ab") as fp:         # partial record: header only
        fp.write(struct.pack("<I", 10 ** 6))
        fp.write(b"garbage")
    rd = lc.LevelsCache(path)
    assert len(rd) == 1 and rd.valid_end == good_size
    means, seq, rid = rd.get("dir/a.fast5", "G", 1, 2)
    np.testing.assert_array_equal(means, np.arange(5.0))
    assert seq == "ACGTT" and rid == "rid-a"
    assert rd.get("dir/a.fast5", "G", 1, 3) is None   # stale stat
    rd.close()

    b2 = lc.LevelsCacheBuilder(path)
    b2.add("b.fast5", "G", "rid-b", 3, 4, np.zeros(2), "AC")
    b2.finalize()
    rd = lc.LevelsCache(path)
    assert len(rd) == 2
    assert rd.get("b.fast5", "G", 3, 4)[2] == "rid-b"
    rd.close()
