"""Statistics engine: detection methods + stats file round trips."""
import os

import numpy as np
import pytest

from tombo_tpu import config
from tombo_tpu.io.fasta import Fasta
from tombo_tpu.io.index import ReadsIndex
from tombo_tpu.io.model_io import KmerModel, load_alt_refs
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
from tombo_tpu.stats import (LevelStats, ModelStats, PerReadStats,
                             aggregate_per_read_stats)
from tombo_tpu.stats import detect as dt
from tombo_tpu.stats import kernels
from tombo_tpu.stats.files import DE_NOVO_TXT, KS_TEST_TXT, SAMP_COMP_TXT
from tombo_tpu.testing import make_synthetic_dataset
from tombo_tpu.types import SeqSampleType


@pytest.fixture(scope="module")
def resquiggled(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("stats_ds"))
    fasta, reads, fast5_dir = make_synthetic_dataset(
        tmp, n_reads=12, seed=31, read_len=400)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    aligner = ExactAligner(fasta)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    summary, _ = resquiggle_all_reads(
        fast5_dir, aligner, model, sst, params,
        RunConfig(overwrite=True, batch_size=6, num_io_threads=2))
    assert summary.n_success == 12
    index = ReadsIndex([fast5_dir])
    return tmp, fasta, model, index


def test_de_novo_detection_and_aggregate(resquiggled):
    tmp, fasta, model, index = resquiggled
    thresh = config.DE_NOVO_THRESH[config.DNA_SAMP_TYPE]
    params = dt.TestParams(
        stat_type=DE_NOVO_TXT, single_read_thresh=thresh[1],
        lower_thresh=thresh[0], region_size=1000, num_most_signif=500)
    stats_fn = os.path.join(tmp, "test.tombo.stats")
    pr_fn = os.path.join(tmp, "test.tombo.per_read_stats")
    dt.test_significance(index, params, stats_fn, fasta=fasta,
                      std_ref=model, per_read_bn=pr_fn, num_processes=2)

    st = ModelStats(stats_fn)
    assert st.stat_type == DE_NOVO_TXT
    assert st.num_blocks >= 1
    sites = list(st.iter_most_signif_sites())
    assert sites, "no most-significant sites stored"
    for chrm, strand, pos, frac_alt in sites[:50]:
        assert strand in "+-"
        assert 0.0 <= frac_alt <= 1.0

    # reg stats lookup covers simulated span with sane coverage
    chrm = fasta.iter_chrms()[0]
    covered = [st.get_reg_stats(chrm, s, 0, 10 ** 9) for s in "+-"]
    covered = [c for c in covered if c is not None]
    assert covered
    allb = np.concatenate(covered)
    assert (allb["cov"] >= 1).all()
    assert ((allb["frac"] >= 0) & (allb["frac"] <= 1)).all()
    st.close()

    # per-read stats re-aggregate to the identical per-site fractions
    agg_fn = os.path.join(tmp, "agg.tombo.stats")
    aggregate_per_read_stats(pr_fn, agg_fn, thresh[1], thresh[0],
                             num_most_signif=500)
    st1 = ModelStats(stats_fn)
    st2 = ModelStats(agg_fn)
    for strand in "+-":
        a = st1.get_reg_stats(chrm, strand, 0, 10 ** 9)
        b = st2.get_reg_stats(chrm, strand, 0, 10 ** 9)
        if a is None:
            assert b is None
            continue
        a = np.sort(a, order="pos")
        b = np.sort(b, order="pos")
        np.testing.assert_array_equal(a["pos"], b["pos"])
        np.testing.assert_allclose(a["frac"], b["frac"])
        np.testing.assert_allclose(a["damp_frac"], b["damp_frac"])
    st1.close()
    st2.close()

    # per-read stats region API
    prs = PerReadStats(pr_fn)
    reg = prs.get_region_per_read_stats(chrm, "+", 0, 10 ** 9)
    if reg is not None:
        assert ((reg["stat"] >= 0) & (reg["stat"] <= 1)).all()
    prs.close()


def test_sample_compare_and_level_tests(resquiggled):
    tmp, fasta, model, index = resquiggled
    thresh = config.SAMP_COMP_THRESH[config.DNA_SAMP_TYPE]
    params = dt.TestParams(
        stat_type=SAMP_COMP_TXT, single_read_thresh=thresh[1],
        lower_thresh=thresh[0], region_size=1000, min_test_reads=2,
        num_most_signif=500)
    sc_fn = os.path.join(tmp, "sc.tombo.stats")
    # self-vs-self comparison: nothing should look strongly modified
    dt.test_significance(index, params, sc_fn, fasta=fasta, std_ref=model,
                      ctrl_reads_index=index, num_processes=2)
    st = ModelStats(sc_fn)
    assert st.stat_type == SAMP_COMP_TXT
    chrm = fasta.iter_chrms()[0]
    found = False
    for strand in "+-":
        blk = st.get_reg_stats(chrm, strand, 0, 10 ** 9)
        if blk is not None and blk.shape[0]:
            found = True
            assert (blk["control_cov"] >= 0).all()
    assert found
    st.close()

    lv_params = dt.TestParams(stat_type=KS_TEST_TXT, region_size=1000,
                           min_test_reads=2, num_most_signif=500)
    lv_fn = os.path.join(tmp, "lv.tombo.stats")
    dt.test_significance(index, lv_params, lv_fn, ctrl_reads_index=index,
                      num_processes=2)
    lv = LevelStats(lv_fn)
    assert lv.stat_type == KS_TEST_TXT
    blks = [lv.get_reg_stats(chrm, s, 0, 10 ** 9) for s in "+-"]
    blks = [b for b in blks if b is not None]
    assert blks
    allb = np.concatenate(blks)
    # self-comparison p-values should not be systematically tiny
    assert np.nanmedian(allb["stat"]) > 0.05
    lv.close()


def test_alt_model_detection(resquiggled):
    tmp, fasta, model, index = resquiggled
    alt_refs = load_alt_refs(["5mC"], config.DNA_SAMP_TYPE)
    assert alt_refs, "bundled 5mC model missing"
    thresh = config.LLR_THRESH[config.DNA_SAMP_TYPE]
    params = dt.TestParams(
        stat_type="model_compare", single_read_thresh=thresh[1],
        lower_thresh=thresh[0], region_size=1000, num_most_signif=500)
    alt_fn = os.path.join(tmp, "alt.tombo.stats")
    dt.test_significance(index, params, alt_fn, fasta=fasta, std_ref=model,
                      alt_refs=alt_refs, num_processes=2)
    st = ModelStats(alt_fn)
    assert st.stat_type == "model_compare"
    chrm = fasta.iter_chrms()[0]
    blks = [st.get_reg_stats(chrm, s, 0, 10 ** 9) for s in "+-"]
    blks = [b for b in blks if b is not None]
    assert blks, "no alt-model stats produced"
    st.close()


def test_fishers_method_matches_reference_shape():
    rng = np.random.default_rng(0)
    pvals = rng.random(50)
    f = kernels.calc_window_fishers_method(pvals, 1)
    assert np.isnan(f[0]) and np.isnan(f[-1])
    # manual check at an interior position
    from scipy import stats as sps
    i = 10
    expect = sps.chi2.sf(-2 * np.log(pvals[i - 1:i + 2]).sum(), 6)
    assert abs(f[i] - expect) < 1e-12


def test_level_kernels_match_scipy():
    rng = np.random.default_rng(3)
    s = rng.normal(0, 1, (20, 15))
    c = rng.normal(0.5, 1, (20, 12))
    from scipy import stats as sps
    ks_p = kernels.compute_ks_tests(s, c, False)
    u_p = kernels.compute_u_tests(s, c, False)
    for i in range(5):
        ref_d = sps.ks_2samp(s[i], c[i], method="asymp")
        # reference uses the kstwobign asymptotic form; allow loose agree
        assert abs(ks_p[i] - ref_d.pvalue) < 0.12
        # the reference's U p-value uses its own variance form
        # (tot*(tot+1)/12 with tot = n1*n2; tombo/tombo_stats.py:4287-4291)
        # — check against that formula directly, not scipy
        sn, cn = s[i].shape[0], c[i].shape[0]
        allv = np.concatenate([np.sort(s[i]), np.sort(c[i])])
        ranks = np.empty(sn + cn, int)
        ranks[allv.argsort()] = np.arange(1, sn + cn + 1)
        u1 = ranks[:sn].sum() - sn * (sn + 1) / 2
        u = min(u1, sn * cn - u1)
        mu = sn * cn / 2
        z = (u - mu) / np.sqrt(sn * cn * (sn * cn + 1) / 12)
        assert abs(u_p[i] - sps.norm.cdf(z) * 2.0) < 1e-12


def test_cov_damp_counts_cli_flag(resquiggled, tmp_path):
    """--coverage-dampen-counts 0 0 disables the beta-prior damping:
    stored damp_frac equals the raw fraction (reference:
    tombo/tombo_stats.py:2537-2552)."""
    import os

    from tombo_tpu.cli.main import main
    from tombo_tpu.stats.files import ModelStats

    tmp, fasta, model, index = resquiggled
    fast5_dir = os.path.join(tmp, "fast5s")
    ref_fn = os.path.join(tmp, "reference.fasta")
    bn = str(tmp_path / "damp0")
    assert main(["detect_modifications", "de_novo", fast5_dir,
                 "--statistics-file-basename", bn,
                 "--reference", ref_fn,
                 "--coverage-dampen-counts", "0", "0", "-q"]) == 0
    stats = ModelStats(bn + ".tombo.stats")
    assert stats.cov_damp_counts == {"unmod": 0.0, "mod": 0.0}
    found = False
    for (chrm, strand), starts in stats.blocks_index.items():
        blk = stats.get_reg_stats(chrm, strand, 0, 10 ** 9)
        if blk is None:
            continue
        found = True
        import numpy as _np
        assert _np.allclose(blk["damp_frac"], blk["frac"])
    assert found
    stats.close()


def test_packed_level_lane_matches_host(resquiggled):
    """The packed multi-region device dispatch for the group level tests
    (round-5: one call per chunk instead of one per region) produces the
    same stats artifact as the host lane."""
    import h5py

    tmp, fasta, model, index = resquiggled
    lv_params = dt.TestParams(stat_type=KS_TEST_TXT, region_size=500,
                              min_test_reads=2, num_most_signif=500)

    def run(flag, fn):
        os.environ["TOMBO_TPU_STATS_DEVICE"] = flag
        try:
            dt.test_significance(index, lv_params, fn,
                                 ctrl_reads_index=index, num_processes=2)
        finally:
            os.environ.pop("TOMBO_TPU_STATS_DEVICE", None)

    host_fn = os.path.join(tmp, "lv_host.tombo.stats")
    dev_fn = os.path.join(tmp, "lv_dev.tombo.stats")
    run("0", host_fn)
    run("1", dev_fn)

    def load(fn):
        out = {}
        with h5py.File(fn, "r") as f:
            def walk(name, obj):
                if isinstance(obj, h5py.Dataset):
                    out[name] = obj[...]
            f.visititems(walk)
        return out

    a, b = load(host_fn), load(dev_fn)
    assert set(a) == set(b)
    for k in a:
        if a[k].dtype.names:
            for fld in a[k].dtype.names:
                av, bv = a[k][fld], b[k][fld]
                if av.dtype.kind == "f":
                    np.testing.assert_allclose(av, bv, rtol=1e-9,
                                               atol=1e-12)
                else:
                    np.testing.assert_array_equal(av, bv)
        else:
            np.testing.assert_array_equal(a[k], b[k])
