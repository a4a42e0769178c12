"""Golden on-disk format fixtures.

The files under tests/golden/ were crafted with raw h5py/pickle straight
from the REFERENCE source schemas (see tests/golden/make_golden.py for
file:line citations) and are committed as frozen bytes.  These tests
parse them with tombo_tpu's readers — a failure means this build's
on-disk compatibility contract drifted from the reference layouts.
"""
import os
import shutil

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _stage_index(tmp_path, fixture):
    """Place an index fixture beside a FAST5 dir under its hidden name."""
    d = tmp_path / "f5s"
    d.mkdir()
    shutil.copy(os.path.join(GOLDEN, fixture),
                str(tmp_path / ".f5s.RawGenomeCorrected_000.tombo.index"))
    return str(d)


def test_golden_index_v11(tmp_path):
    from tombo_tpu.io.index import ReadsIndex
    idx = ReadsIndex([_stage_index(tmp_path, "golden_v11.index")])
    reads = {rd.read_id: rd for rd in idx.iter_reads()}
    assert set(reads) == {"rid_a", "rid_b"}
    rd = reads["rid_a"]
    assert (rd.start, rd.end, rd.read_start_rel_to_raw) == (100, 200, 42)
    assert rd.corr_group == "RawGenomeCorrected_000/BaseCalled_template"
    assert rd.strand == "+" and rd.rna is False
    assert rd.sig_match_score == 0.55 and rd.mean_q_score == 11.5
    assert rd.fn.endswith("f5s/read_a.fast5")
    cov = idx.get_coverage("chrA", 160, "+")
    assert cov == 2  # both reads span position 160


def test_golden_index_historic_layouts(tmp_path):
    from tombo_tpu.io.index import ReadsIndex
    idx10 = ReadsIndex([_stage_index(tmp_path, "golden_v10.index")])
    (rd,) = list(idx10.iter_reads())
    assert rd.read_id is None and rd.sig_match_score == 0.55
    assert rd.strand == "-"

    b = tmp_path / "b"
    b.mkdir()
    idx8 = ReadsIndex([_stage_index(b, "golden_v8.index")])
    (rd,) = list(idx8.iter_reads())
    assert rd.sig_match_score is None and rd.read_id is None
    assert (rd.start, rd.end) == (100, 200)


def test_golden_corrected_fast5(tmp_path):
    import h5py
    from tombo_tpu.io import fast5 as f5io
    from tombo_tpu.io.fast5 import read_corrected_events
    from tombo_tpu.io.index import ReadsIndex

    fn = os.path.join(GOLDEN, "golden_corrected.fast5")
    with h5py.File(fn, "r") as fp:
        raw = f5io.get_raw_signal(fp)
        assert raw.shape == (60,) and raw[1] == 1
        assert f5io.get_read_id(fp) == "golden_read"
        ch = f5io.get_channel_info(fp)
        assert ch.digitisation == 8192.0 and ch.range == 1400.0

    events, rsrtr, align_info, rna = read_corrected_events(
        fn, "RawGenomeCorrected_000/BaseCalled_template")
    assert rsrtr == 10
    assert rna is False
    assert events.shape == (4,)
    assert events["base"].tobytes() == b"ACGT"
    assert np.array_equal(events["start"], [0, 5, 9, 14])
    assert np.array_equal(events["length"], [5, 4, 5, 6])
    assert events["norm_mean"][0] == 1.5
    assert align_info["mapped_chrom"] in ("chrA", b"chrA")
    assert align_info["clipped_bases_start"] == 2
    with h5py.File(fn, "r") as fp:
        grp = fp["Analyses/RawGenomeCorrected_000/BaseCalled_template"]
        assert grp.attrs["shift"] == 3.5 and grp.attrs["scale"] == 2.25

    # index-less directory scan builds the same record from the layout
    d = tmp_path / "scan"
    d.mkdir()
    shutil.copy(fn, str(d / "golden_corrected.fast5"))
    idx = ReadsIndex([str(d)])
    (rd,) = list(idx.iter_reads())
    assert (rd.start, rd.end, rd.strand) == (1000, 1004, "+")
    assert rd.read_start_rel_to_raw == 10
    assert rd.read_id == "golden_read"


def test_golden_tombo_model():
    from tombo_tpu.io.model_io import KmerModel
    model = KmerModel.load(os.path.join(GOLDEN, "golden.tombo.model"))
    assert model.kmer_width == 2
    assert model.central_pos == 1
    assert model.name == "golden_standard"
    # AA is code 0, TT is code 15 in lexicographic ACGT coding
    assert model.means[0] == -2.0
    assert model.means[15] == 2.0
    assert np.allclose(model.sds, 0.65)


def test_golden_model_stats():
    from tombo_tpu.stats.files import ModelStats
    stats = ModelStats(os.path.join(GOLDEN, "golden_model.tombo.stats"))
    assert stats.stat_type == "de_novo"
    assert stats.region_size == 1000
    assert stats.cov_damp_counts == {"unmod": 2.0, "mod": 0.0}
    blk = stats.get_reg_stats("chrA", "+", 0, 1000)
    assert blk.shape == (2,)
    assert np.array_equal(blk["pos"], [11, 17])
    assert blk["damp_frac"][0] == 0.25
    regions = stats.get_most_signif_regions(3, 2)
    assert regions[0][0] == "chrA"
    positions = {r[1] + 1 for r in regions}  # start = pos - num_bases//2
    assert positions == {11, 17}
    stats.close()


def test_golden_level_stats():
    from tombo_tpu.stats.files import LevelStats
    stats = LevelStats(os.path.join(GOLDEN, "golden_level.tombo.stats"))
    assert stats.stat_type == "ks"
    blk = stats.get_reg_stats("chrA", "-", 0, 1000)
    assert np.array_equal(blk["pos"], [5, 9])
    assert blk["stat"][0] == 0.001
    stats.close()


def test_golden_per_read_stats():
    from tombo_tpu.stats.files import PerReadStats
    prs = PerReadStats(os.path.join(GOLDEN,
                                    "golden.tombo.per_read_stats"))
    assert prs.stat_type == "de_novo"
    blk = prs.get_region_per_read_stats("chrA", "+", 0, 1000)
    assert blk.shape == (3,)
    by_read = {(int(r["pos"]), r["read_id"]): float(r["stat"])
               for r in blk}
    assert by_read[(11, "rid_a")] == 0.01
    assert by_read[(11, "rid_b")] == 0.9
    assert by_read[(17, "rid_a")] == 0.5
    prs.close()


def test_golden_wrong_class_rejected():
    """Opening a level file with ModelStats (and vice versa) fails with
    the reference's guidance error."""
    from tombo_tpu.errors import TomboTpuError
    from tombo_tpu.stats.files import LevelStats, ModelStats
    with pytest.raises(TomboTpuError):
        ModelStats(os.path.join(GOLDEN, "golden_level.tombo.stats"))
    with pytest.raises(TomboTpuError):
        LevelStats(os.path.join(GOLDEN, "golden_model.tombo.stats"))
