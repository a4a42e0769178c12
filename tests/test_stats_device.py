"""Device detection-lane kernels vs the host lane (stats/kernels.py +
stats/detect.py) — exact parity under the float64 CPU configuration.

Covers VERDICT round-2 item 3: the statistics engine's device lane.
"""
import numpy as np
import pytest
from scipy import stats as sps

from tombo_tpu.stats import detect as dt
from tombo_tpu.stats import device as dev
from tombo_tpu.stats import kernels


def _rand_block(rng, B=24, W=160, nan_frac=0.15):
    means = rng.normal(0, 1, (B, W))
    valid = rng.random((B, W)) > nan_frac
    # contiguous per-read extents (reads shorter than the span)
    for i in range(B):
        lo = rng.integers(0, W // 3)
        hi = rng.integers(2 * W // 3, W)
        valid[i, :lo] = False
        valid[i, hi:] = False
    return np.where(valid, means, np.nan), valid


def test_model_test_pvals_matches_host_fisher():
    rng = np.random.default_rng(0)
    means, valid = _rand_block(rng)
    ref_means = rng.normal(0, 1, means.shape[1])
    ref_sds = rng.uniform(0.2, 1.0, means.shape[1])
    for fm, clamp in ((1, True), (3, False), (0, False)):
        p_dev = np.asarray(dev.model_test_pvals(
            means, ref_means, ref_sds, valid, fm, clamp))
        z = np.abs((means - ref_means) / ref_sds)
        p_host = kernels.pvals_from_z(z)
        if fm > 0:
            p_host = kernels.calc_window_fishers_method(p_host, fm)
        if clamp:
            with np.errstate(invalid="ignore"):
                p_host = np.maximum(p_host, kernels.SMALLEST_PVAL)
        np.testing.assert_allclose(p_dev, p_host, rtol=1e-9, atol=1e-300,
                                   equal_nan=True)


@pytest.mark.parametrize("mode,thresh,lower", [
    ("two_way", 0.5, 0.15), ("alt", 2.5, None), ("plain", 0.4, None)])
def test_site_accumulate_matches_host(mode, thresh, lower):
    rng = np.random.default_rng(1)
    B, W = 30, 120
    stats = rng.uniform(-4, 4, (B, W))
    stats[rng.random((B, W)) < 0.2] = np.nan
    emit = rng.random((B, W)) > 0.3
    cov_d, valid_d, above_d = (np.asarray(x) for x in dev.site_accumulate(
        jnp_arr(stats), jnp_arr(emit), thresh,
        lower if lower is not None else -1e30, mode))

    stats_list, locs_list = [], []
    for i in range(B):
        sel = emit[i]
        stats_list.append(stats[i][sel])
        locs_list.append(np.where(sel)[0])
    cov_h, valid_h, above_h = dt.site_accumulators(
        stats_list, locs_list, 0, W, thresh, lower,
        "MODEL_TXT_alt" if mode == "alt" else "x")
    if mode == "alt":
        from tombo_tpu.stats.files import ALT_MODEL_TXT
        cov_h, valid_h, above_h = dt.site_accumulators(
            stats_list, locs_list, 0, W, thresh, lower, ALT_MODEL_TXT)
    np.testing.assert_array_equal(cov_d, cov_h)
    np.testing.assert_array_equal(valid_d, valid_h)
    np.testing.assert_array_equal(above_d, above_h)


def jnp_arr(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


def _level_pair(rng, P=60, C=24, shift=0.4):
    samp = rng.normal(0, 1, (P, C))
    ctrl = rng.normal(shift, 1, (P, C))
    # ragged NaN-padded coverage, min 3 reads per site
    for x in (samp, ctrl):
        for i in range(P):
            n = rng.integers(3, C + 1)
            x[i, n:] = np.nan
    # note: exact cross-sample ties are NOT injected — the host/reference
    # U test ranks ties by np.argsort's (unstable quicksort) internal
    # order, which is not a reproducible semantic; real per-read float64
    # level means never tie across samples
    return samp, ctrl


def test_ks_tests_match_host():
    rng = np.random.default_rng(2)
    samp, ctrl = _level_pair(rng)
    for return_stat in (False, True):
        d = np.asarray(dev.ks_tests(jnp_arr(samp), jnp_arr(ctrl),
                                    return_stat))
        h = kernels.compute_ks_tests(samp, ctrl, return_stat)
        np.testing.assert_allclose(d, h, rtol=1e-9, atol=1e-12)


def test_u_tests_match_host():
    rng = np.random.default_rng(3)
    samp, ctrl = _level_pair(rng)
    for return_stat in (False, True):
        d = np.asarray(dev.u_tests(jnp_arr(samp), jnp_arr(ctrl),
                                   return_stat))
        h = kernels.compute_u_tests(samp, ctrl, return_stat)
        np.testing.assert_allclose(d, h, rtol=1e-9, atol=1e-12)


def test_t_tests_match_host():
    rng = np.random.default_rng(4)
    samp, ctrl = _level_pair(rng)
    for return_stat in (False, True):
        d = np.asarray(dev.t_tests(jnp_arr(samp), jnp_arr(ctrl),
                                   return_stat))
        h = kernels.compute_t_tests(samp, ctrl, return_stat)
        np.testing.assert_allclose(d, h, rtol=1e-8, atol=1e-12)


def test_kolmogorov_sf_matches_scipy():
    x = np.concatenate([np.linspace(0.05, 0.99, 40),
                        np.linspace(1.0, 3.5, 40)])
    d = np.asarray(dev._kolmogorov_sf(jnp_arr(x)))
    h = sps.distributions.kstwobign.sf(x)
    np.testing.assert_allclose(d, h, rtol=1e-9, atol=1e-14)


def test_build_read_block_places_and_trims():
    from tombo_tpu.stats.region import ReadLevels
    from tombo_tpu.types import ReadData

    span_lo, span_n = 100, 60
    rd = ReadData(start=110, end=140, filtered=False,
                  read_start_rel_to_raw=0, strand="+", fn="x",
                  corr_group="g", rna=False, read_id="r0")
    means = np.arange(30, dtype=np.float64)
    rl = ReadLevels(rd, means, None, "r0")
    out = dev.build_read_block([rl], span_lo, span_n,
                               place_lo=105, place_hi=135,
                               begin_lag=2, end_lag=3)
    m, valid, emit = out
    # means placed at genome columns 110..134 (clipped by place_hi)
    assert np.isnan(m[0, :10]).all()
    np.testing.assert_array_equal(m[0, 10:35], means[:25])
    assert np.isnan(m[0, 35:]).all()
    # emission trimmed by lags: [112, 135-3) -> columns 12..31
    assert emit[0, 12] and emit[0, 31]
    assert not emit[0, 11] and not emit[0, 32]


# ---------------------------------------------------------------------------
# end-to-end: device lane vs host lane on a resquiggled synthetic dataset
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def resquiggled(tmp_path_factory):
    from tombo_tpu import config
    from tombo_tpu.io.index import ReadsIndex
    from tombo_tpu.io.model_io import KmerModel
    from tombo_tpu.pipeline.aligner import ExactAligner
    from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
    from tombo_tpu.testing import make_synthetic_dataset
    from tombo_tpu.types import SeqSampleType

    tmp = str(tmp_path_factory.mktemp("dev_stats_ds"))
    fasta, reads, fast5_dir = make_synthetic_dataset(
        tmp, n_reads=14, seed=57, read_len=500, ref_len=4000)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    summary, _ = resquiggle_all_reads(
        fast5_dir, ExactAligner(fasta), model,
        SeqSampleType(config.DNA_SAMP_TYPE, False),
        config.load_resquiggle_parameters(config.DNA_SAMP_TYPE),
        RunConfig(overwrite=True, batch_size=8, num_io_threads=2))
    assert summary.n_success == 14
    return tmp, fasta, model, ReadsIndex([fast5_dir])


def _regions(index, params):
    return [dt.RegionData(chrm, strand, start, start + params.region_size)
            for chrm, strand, start in index.iter_cov_regs(
                1, params.region_size)]


@pytest.mark.parametrize("stat_type", ["de_novo", "sample_compare"])
def test_device_region_stats_match_host(resquiggled, stat_type):
    """compute_reg_stats_device == compute_reg_stats on every region:
    identical positions, coverage, valid coverage, and fractions (f64
    CPU configuration)."""
    from tombo_tpu import config
    from tombo_tpu.errors import TomboTpuError
    from tombo_tpu.stats.files import SAMP_COMP_TXT

    tmp, fasta, model, index = resquiggled
    th = (config.DE_NOVO_THRESH if stat_type == "de_novo"
          else config.SAMP_COMP_THRESH)[config.DNA_SAMP_TYPE]
    params = dt.TestParams(
        stat_type=stat_type, single_read_thresh=th[1], lower_thresh=th[0],
        region_size=1000)
    n_checked = 0
    for reg in _regions(index, params):
        reg.add_reads(index)
        ctrl_reg = None
        if stat_type == SAMP_COMP_TXT:
            ctrl_reg = dt.RegionData(
                reg.chrm, reg.strand, reg.start, reg.end).add_reads(index)
        try:
            host = dt.compute_reg_stats(reg, params, ctrl_reg, fasta,
                                        model, None, emit_per_read=False)
        except TomboTpuError:
            host = None
        try:
            devr = dt.compute_reg_stats_device(reg, params, ctrl_reg,
                                               fasta, model)
        except TomboTpuError:
            devr = None
        if host is None or devr is None:
            assert host is None and devr is None
            continue
        (h_name, h_stats, _), = host
        (d_name, d_stats, _), = devr
        assert h_name == d_name
        np.testing.assert_array_equal(d_stats.reg_poss, h_stats.reg_poss)
        np.testing.assert_array_equal(d_stats.reg_cov, h_stats.reg_cov)
        np.testing.assert_array_equal(d_stats.valid_cov, h_stats.valid_cov)
        np.testing.assert_allclose(d_stats.reg_frac_standard_base,
                                   h_stats.reg_frac_standard_base,
                                   rtol=1e-12, equal_nan=True)
        n_checked += 1
    assert n_checked >= 2


def test_device_level_stats_match_host(resquiggled, tmp_path, monkeypatch):
    """test_significance with the device lane forced on == host lane off
    for the group KS test (identical stats files block by block)."""
    import os

    from tombo_tpu import config
    from tombo_tpu.stats.files import KS_TEST_TXT, LevelStats

    tmp, fasta, model, index = resquiggled
    params = dt.TestParams(stat_type=KS_TEST_TXT, region_size=1000,
                           min_test_reads=2)
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("TOMBO_TPU_STATS_DEVICE", flag)
        fn = os.path.join(str(tmp_path), "lv%s.tombo.stats" % flag)
        dt.test_significance(index, params, fn, ctrl_reads_index=index,
                             num_processes=2)
        st = LevelStats(fn)
        outs[flag] = list(st)
        st.close()
    assert len(outs["0"]) == len(outs["1"]) and outs["0"]
    for (c0, s0, st0, e0, b0), (c1, s1, st1, e1, b1) in zip(
            outs["0"], outs["1"]):
        assert (c0, s0, st0) == (c1, s1, st1)
        assert b0.dtype.names == b1.dtype.names
        for name in b0.dtype.names:
            if b0[name].dtype.kind == "f":
                np.testing.assert_allclose(b1[name], b0[name], rtol=1e-9,
                                           equal_nan=True)
            else:
                np.testing.assert_array_equal(b1[name], b0[name])


@pytest.mark.parametrize("stat_type", ["de_novo", "sample_compare"])
def test_packed_batch_matches_per_region(resquiggled, stat_type):
    """One packed multi-region dispatch == per-region device calls ==
    host lane, including with a tiny sub-span width (reads crossing
    many sub-span boundaries)."""
    import os

    from tombo_tpu import config
    from tombo_tpu.errors import TomboTpuError
    from tombo_tpu.stats.files import SAMP_COMP_TXT

    tmp, fasta, model, index = resquiggled
    th = (config.DE_NOVO_THRESH if stat_type == "de_novo"
          else config.SAMP_COMP_THRESH)[config.DNA_SAMP_TYPE]
    params = dt.TestParams(
        stat_type=stat_type, single_read_thresh=th[1], lower_thresh=th[0],
        region_size=1000)
    jobs, hosts = [], []
    for reg in _regions(index, params):
        reg.add_reads(index)
        ctrl_reg = None
        if stat_type == SAMP_COMP_TXT:
            ctrl_reg = dt.RegionData(
                reg.chrm, reg.strand, reg.start, reg.end).add_reads(index)
        try:
            hosts.append(dt.compute_reg_stats(
                reg, params, ctrl_reg, fasta, model, None,
                emit_per_read=False))
        except TomboTpuError:
            hosts.append(None)
        try:
            jobs.append(dt._device_region_job(reg, params, ctrl_reg,
                                              fasta, model))
        except TomboTpuError:
            jobs.append(None)
    os.environ["TOMBO_TPU_STATS_SUBSPAN"] = "256"   # force many sub-spans
    try:
        packed = dt.compute_reg_stats_device_batch(jobs, params)
    finally:
        del os.environ["TOMBO_TPU_STATS_SUBSPAN"]
    n_checked = 0
    for host, dres in zip(hosts, packed):
        if host is None or not dres:
            continue
        (h_name, h_stats, _), = host
        (d_name, d_stats, _), = dres
        assert h_name == d_name
        np.testing.assert_array_equal(d_stats.reg_poss, h_stats.reg_poss)
        np.testing.assert_array_equal(d_stats.reg_cov, h_stats.reg_cov)
        np.testing.assert_array_equal(d_stats.valid_cov, h_stats.valid_cov)
        np.testing.assert_allclose(d_stats.reg_frac_standard_base,
                                   h_stats.reg_frac_standard_base,
                                   rtol=1e-12, equal_nan=True)
        n_checked += 1
    assert n_checked >= 2


def test_device_lane_serves_per_read_stats(resquiggled, tmp_path,
                                           monkeypatch):
    """--per-read-statistics-basename no longer forfeits the device
    lane: test_significance with the device lane forced on writes
    per-read blocks matching the host lane's values."""
    import os

    from tombo_tpu import config
    from tombo_tpu.stats.files import PerReadStats

    tmp, fasta, model, index = resquiggled
    th = config.DE_NOVO_THRESH[config.DNA_SAMP_TYPE]
    params = dt.TestParams(stat_type="de_novo", single_read_thresh=th[1],
                           lower_thresh=th[0], region_size=1000)
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("TOMBO_TPU_STATS_DEVICE", flag)
        fn = os.path.join(str(tmp_path), "m%s.tombo.stats" % flag)
        prfn = os.path.join(str(tmp_path), "m%s.tombo.per_read_stats" % flag)
        dt.test_significance(index, params, fn, fasta=fasta, std_ref=model,
                             per_read_bn=prfn, num_processes=2)
        pr = PerReadStats(prfn)
        blocks = {}
        for chrm, strand, start, block_stats, lookup in \
                pr.iter_per_read_blocks():
            poss = block_stats["pos"]
            stats = block_stats["stat"]
            ids = np.array([lookup[r] for r in block_stats["read_id"]])
            order = np.lexsort((ids, stats, poss))
            blocks[(chrm, strand, start)] = (poss[order], stats[order],
                                             ids[order])
        pr.close()
        outs[flag] = blocks
    assert outs["0"] and set(outs["0"]) == set(outs["1"])
    for key in outs["0"]:
        p0, s0, i0 = outs["0"][key]
        p1, s1, i1 = outs["1"][key]
        np.testing.assert_array_equal(p0, p1)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, rtol=1e-12)


def test_alt_device_lane_matches_host(resquiggled, tmp_path, monkeypatch):
    """ALT scaled-LLR via the fused device kernel == host lane
    (stats files block by block, plus per-read blocks)."""
    import os

    from tombo_tpu import config
    from tombo_tpu.io.model_io import load_alt_refs
    from tombo_tpu.stats.files import ModelStats

    tmp, fasta, model, index = resquiggled
    alt_refs = load_alt_refs(["5mC"], config.DNA_SAMP_TYPE)
    assert alt_refs
    th = config.LLR_THRESH[config.DNA_SAMP_TYPE]
    params = dt.TestParams(stat_type="model_compare",
                           single_read_thresh=th[1],
                           lower_thresh=th[0], region_size=1000)
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("TOMBO_TPU_STATS_DEVICE", flag)
        fn = os.path.join(str(tmp_path), "alt%s.tombo.stats" % flag)
        dt.test_significance(index, params, fn, fasta=fasta, std_ref=model,
                             alt_refs=alt_refs, num_processes=2)
        produced = [f for f in os.listdir(str(tmp_path))
                    if f.startswith("alt%s" % flag)]
        assert produced
        st = ModelStats(os.path.join(str(tmp_path), produced[0]))
        chrm = fasta.iter_chrms()[0]
        blocks = {}
        for strand in "+-":
            a = st.get_reg_stats(chrm, strand, 0, 10 ** 9)
            blocks[strand] = None if a is None else np.sort(a, order="pos")
        st.close()
        outs[flag] = blocks
    for strand in "+-":
        a, b = outs["0"][strand], outs["1"][strand]
        if a is None:
            assert b is None
            continue
        np.testing.assert_array_equal(a["pos"], b["pos"])
        np.testing.assert_array_equal(a["cov"], b["cov"])
        np.testing.assert_array_equal(a["valid_cov"], b["valid_cov"])
        np.testing.assert_allclose(a["frac"], b["frac"], rtol=1e-9,
                                   equal_nan=True)


def test_packed_counts_overflow_escape():
    """Sub-spans whose per-site coverage exceeds a byte must re-fetch
    exact int32 counts (the uint8 wire is an optimization, not a cap)."""
    from tombo_tpu.stats.region import ReadLevels
    from tombo_tpu.types import ReadData

    rng = np.random.default_rng(8)
    span_lo, span_n = 1000, 300
    n_reads = 300          # coverage 300 > 255 at every interior site
    levels = []
    for i in range(n_reads):
        rd = ReadData(start=span_lo, end=span_lo + span_n, filtered=False,
                      read_start_rel_to_raw=0, strand="+", fn="f%d" % i,
                      corr_group="g", rna=False, read_id="r%d" % i)
        levels.append(ReadLevels(rd, rng.normal(0, 1, span_n), None,
                                 "r%d" % i))
    ref_m = rng.normal(0, 1, span_n)
    ref_s = np.full(span_n, 0.5)
    packer = dev.PackedRegionBatch(1, core=128)
    packer.add_region(0, span_lo, span_n, ref_m, ref_s, levels,
                      place_lo=span_lo, place_hi=span_lo + span_n,
                      begin_lag=0, end_lag=0)
    counts, _ = packer.dispatch(1, False, 0.5, 0.1, "two_way", False)
    cov, valid, above = packer.unpack_region(0, span_lo, span_n, counts)
    # host reference
    stats_list, locs_list = [], []
    import jax.numpy as jnp
    for rl in levels:
        z = np.abs((rl.means - ref_m) / ref_s)
        p = kernels.pvals_from_z(z)
        p = kernels.calc_window_fishers_method(p, 1)
        keep = ~np.isnan(p)
        stats_list.append(p[keep])
        locs_list.append(np.arange(span_lo, span_lo + span_n)[keep])
    cov_h, valid_h, above_h = dt.site_accumulators(
        stats_list, locs_list, span_lo, span_n, 0.5, 0.1, "x")
    assert cov.max() == n_reads            # proves the u8 wire overflowed
    np.testing.assert_array_equal(cov, cov_h)
    np.testing.assert_array_equal(valid, valid_h)
    np.testing.assert_array_equal(above, above_h)
