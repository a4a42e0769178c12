"""Modified-base detection: per-read + group statistical testing.

Behavioral port of the reference's testing engine
(reference: tombo/tombo_stats.py:3572-4634): four methods (de novo vs
canonical model, two-sample comparison, alternative-model likelihood
ratios, and group level tests), per-site fraction aggregation with
per-read thresholds, and genome-blocked orchestration.

Redesign notes (TPU-first host architecture): per-read inner loops are
replaced with whole-read vectorized math (stats/kernels.py); alt-model
motif hits are scored as one stacked (hits, kmer_width) window batch per
read instead of per-hit native calls; regions are processed by a thread
pool feeding the single-writer stats files (mirroring the reference's
single-writer process design, reference: tombo/tombo_stats.py:4448).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from .. import config
from ..errors import TomboTpuError
from ..io.model_io import AltModel, KmerModel
from ..seq import encode_seq, rev_comp, seq_to_kmer_codes
from ..types import GroupStats, RegionStats
from . import kernels
from .files import (ALT_MODEL_TXT, DE_NOVO_TXT, KS_STAT_TEST_TXT,
                    KS_TEST_TXT, LEVEL_STATS_TXTS, PER_READ_STATS,
                    SAMP_COMP_TXT, T_STAT_TEST_TXT, T_TEST_TXT,
                    U_STAT_TEST_TXT, U_TEST_TXT, LevelStats, ModelStats,
                    PerReadStats)
from .region import RegionData, ReadLevels


def use_device_stats() -> bool:
    """Route per-site testing through the batched JAX kernels
    (stats/device.py).  Default: on when a TPU backend is active; force
    with TOMBO_TPU_STATS_DEVICE=0/1.  The host lane always serves
    per-read statistics files and the ALT_MODEL motif path."""
    import os
    env = os.environ.get("TOMBO_TPU_STATS_DEVICE", "")
    if env in ("0", "1"):
        return env == "1"
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001 — backend probe must never fail hard
        return False


@dataclass
class TestParams:
    """Testing configuration (reference: argparse layer +
    tombo/_default_parameters.py:107-140)."""
    stat_type: str
    fm_offset: int = config.FM_OFFSET_DEFAULT
    min_test_reads: int = 1
    single_read_thresh: Optional[float] = None
    lower_thresh: Optional[float] = None
    region_size: int = config.DEFAULT_REGION_SIZE
    prior_weights: Tuple[float, float] = (config.MEAN_PRIOR_CONST,
                                          config.SD_PRIOR_CONST)
    use_standard_llhr: bool = False
    num_most_signif: int = 100000
    cov_damp_counts: Tuple[float, float] = config.COV_DAMP_COUNTS


# --------------------------------------------------------------------------
# Control-sample reference levels (reference: tombo/tombo_stats.py:3572-3674)
# --------------------------------------------------------------------------

def compute_posterior_samp_dists(ctrl_means, ctrl_sds, ctrl_cov,
                                 ctrl_reg_data, fasta, std_ref,
                                 prior_weights, fm_offset):
    """Sharpen control-sample level estimates with model priors
    (reference: tombo/tombo_stats.py:3572-3626)."""
    dnstrm = std_ref.kmer_width - std_ref.central_pos - 1
    begin_lag = (std_ref.central_pos if ctrl_reg_data.strand == "+"
                 else dnstrm)
    end_lag = dnstrm if ctrl_reg_data.strand == "+" else std_ref.central_pos
    seq_start = ctrl_reg_data.start - begin_lag - fm_offset
    seq_end = ctrl_reg_data.end + end_lag + fm_offset
    reg_seq = fasta.get_seq(ctrl_reg_data.chrm, max(seq_start, 0), seq_end,
                            error_end=False)
    # N-pad sequence clipped at the chromosome ends so expected-level
    # windows stay aligned (N windows produce NaN levels)
    if seq_start < 0:
        reg_seq = "N" * -seq_start + reg_seq
    if len(reg_seq) < seq_end - seq_start:
        reg_seq = reg_seq + "N" * (seq_end - seq_start - len(reg_seq))
    if ctrl_reg_data.strand == "-":
        reg_seq = rev_comp(reg_seq)
    reg_ref_means, reg_ref_sds = std_ref.get_exp_levels_from_seq_with_gaps(
        reg_seq, ctrl_reg_data.strand == "-")
    post_means = ((prior_weights[0] * reg_ref_means +
                   ctrl_cov * ctrl_means) /
                  (prior_weights[0] + ctrl_cov))
    post_sds = ((prior_weights[1] * reg_ref_sds + ctrl_cov * ctrl_sds) /
                (prior_weights[1] + ctrl_cov))
    return post_means, post_sds


def get_reads_ref(reg_data: RegionData, fasta, min_test_reads: int,
                  fm_offset: int, std_ref: Optional[KmerModel] = None,
                  prior_weights=None, est_mean: bool = False):
    """Per-site central level + SD of a control sample
    (reference: tombo/tombo_stats.py:3627-3674)."""
    central = np.mean if est_mean else np.median
    reg_size = reg_data.end - reg_data.start + fm_offset * 2
    level_means = np.full(reg_size, np.nan)
    level_sds = np.full(reg_size, np.nan)

    exp_reg = reg_data.copy_update(reg_data.start - fm_offset,
                                   reg_data.end + fm_offset)
    bases_levels = exp_reg.get_base_levels()
    valid = ~np.isnan(bases_levels)
    cov = valid.sum(axis=1)
    ok = cov >= min_test_reads
    if ok.any():
        idx = np.where(ok)[0]
        level_means[idx] = [central(bases_levels[i][valid[i]]) for i in idx]
        level_sds[idx] = [np.std(bases_levels[i][valid[i]]) for i in idx]

    if std_ref is not None:
        if prior_weights is None:
            prior_weights = (config.MEAN_PRIOR_CONST, config.SD_PRIOR_CONST)
        level_means, level_sds = compute_posterior_samp_dists(
            level_means, level_sds, cov, reg_data, fasta, std_ref,
            prior_weights, fm_offset)

    cov_d = dict(zip(range(reg_data.start - fm_offset,
                           reg_data.end + fm_offset), cov))
    zero_sd = level_sds == 0
    level_means[zero_sd] = np.nan
    level_sds[zero_sd] = np.nan
    return level_means, level_sds, cov_d


# --------------------------------------------------------------------------
# Per-read model tests (reference: tombo/tombo_stats.py:3675-4016)
# --------------------------------------------------------------------------

def compute_sample_compare_read_stats(rl: ReadLevels, ctrl_means, ctrl_sds,
                                      fm_offset, reg_data: RegionData):
    """(reference: tombo/tombo_stats.py:3675-3770)."""
    r_data = rl.r_data
    reg_start = reg_data.start
    reg_size = reg_data.end - reg_data.start
    r_means = rl.means
    read_start, read_end = r_data.start, r_data.end
    if read_start + fm_offset < reg_start:
        n_clip = reg_start - (read_start + fm_offset)
        read_start = reg_start - fm_offset
        r_means = (r_means[n_clip:] if r_data.strand == "+"
                   else r_means[:-n_clip])
    if read_end - fm_offset > reg_start + reg_size:
        n_clip = (read_end - fm_offset) - (reg_start + reg_size)
        read_end = reg_start + reg_size + fm_offset
        r_means = (r_means[:-n_clip] if r_data.strand == "+"
                   else r_means[n_clip:])
    if r_data.strand == "-":
        r_means = r_means[::-1]
    sl = slice(read_start - reg_start + fm_offset,
               read_end - reg_start + fm_offset)
    with np.errstate(invalid="ignore"):
        r_z = np.abs(r_means - ctrl_means[sl]) / ctrl_sds[sl]
    if np.sum(~np.isnan(r_z)) == 0:
        raise TomboTpuError("No valid z-scores in read.")
    r_pvals = kernels.pvals_from_z(r_z)
    if fm_offset > 0:
        r_pvals = kernels.calc_window_fishers_method(r_pvals, fm_offset)
    r_poss = np.where(~np.isnan(r_pvals))[0]
    r_pvals = r_pvals[r_poss]
    r_poss = r_poss + read_start
    return {SAMP_COMP_TXT: r_pvals}, {SAMP_COMP_TXT: r_poss}, rl.read_id


def compute_de_novo_read_stats(rl: ReadLevels, std_ref: KmerModel,
                               fm_offset, reg_data: RegionData):
    """(reference: tombo/tombo_stats.py:3771-3874)."""
    r_data = rl.r_data
    reg_start = reg_data.start
    reg_size = reg_data.end - reg_data.start
    dnstrm = std_ref.kmer_width - std_ref.central_pos - 1
    begin_lag = std_ref.central_pos if r_data.strand == "+" else dnstrm
    end_lag = dnstrm if r_data.strand == "+" else std_ref.central_pos

    r_means, r_seq = rl.means, rl.seq
    if r_means is None or r_seq is None:
        raise TomboTpuError("Read does not contain valid re-squiggled data.")
    read_start, read_end = r_data.start, r_data.end
    if read_start + begin_lag + fm_offset < reg_start:
        n_clip = reg_start - (read_start + begin_lag + fm_offset)
        read_start = reg_start - begin_lag - fm_offset
        if r_data.strand == "+":
            r_means, r_seq = r_means[n_clip:], r_seq[n_clip:]
        else:
            r_means, r_seq = r_means[:-n_clip], r_seq[:-n_clip]
    if read_end - end_lag - fm_offset > reg_start + reg_size:
        n_clip = (read_end - end_lag - fm_offset) - (reg_start + reg_size)
        read_end = reg_start + reg_size + end_lag + fm_offset
        if r_data.strand == "+":
            r_means, r_seq = r_means[:-n_clip], r_seq[:-n_clip]
        else:
            r_means, r_seq = r_means[n_clip:], r_seq[n_clip:]
    if len(r_seq) < std_ref.kmer_width:
        raise TomboTpuError("Read does not contain information in this "
                            "region.")
    r_ref_means, r_ref_sds = std_ref.get_exp_levels_from_seq(
        r_seq, r_data.strand == "-")
    if r_data.strand == "-":
        r_means = r_means[::-1]
    r_means = r_means[begin_lag:-end_lag]
    read_start += begin_lag
    read_end -= end_lag

    z = np.abs(r_means - r_ref_means) / r_ref_sds
    r_pvals = kernels.pvals_from_z(z)
    if fm_offset > 0:
        r_pvals = kernels.calc_window_fishers_method(r_pvals, fm_offset)
    with np.errstate(invalid="ignore"):
        r_pvals = np.maximum(r_pvals, kernels.SMALLEST_PVAL)
    r_poss = np.arange(read_start, read_end)
    return {DE_NOVO_TXT: r_pvals}, {DE_NOVO_TXT: r_poss}, rl.read_id


def _trim_seq_and_means(seq, means, r_start, reg_start, reg_end, strand,
                        kmer_width, central_pos, max_motif_bb, max_motif_ab):
    """(reference: tombo/tombo_stats.py:3889-3970 ``trim_seq_and_means``)."""
    r_end = r_start + means.shape[0]
    motif_search_seq = seq
    n_start_clip = n_end_clip = 0
    if r_start + kmer_width - 1 < reg_start:
        if strand == "+":
            n_start_clip = reg_start - (r_start + kmer_width - 1)
        else:
            n_end_clip = reg_start - (r_start + kmer_width - 1)
        r_start = reg_start - (kmer_width - 1)
    if r_end - kmer_width + 1 > reg_end:
        if strand == "+":
            n_end_clip = r_end - kmer_width + 1 - reg_end
        else:
            n_start_clip = r_end - kmer_width + 1 - reg_end

    seq = seq[n_start_clip:]
    if n_end_clip > 0:
        seq = seq[:-n_end_clip]
    means = means[n_start_clip + central_pos:]
    means = means[:-(n_end_clip + kmer_width - central_pos - 1)]
    if means.shape[0] < kmer_width:
        raise TomboTpuError("Read sequence too short in this region.")
    kmer_codes = seq_to_kmer_codes(encode_seq(seq), kmer_width)
    if kmer_codes.shape[0] != means.shape[0]:
        raise TomboTpuError("Mismatching k-mer and mean levels.")
    r_start += kmer_width - 1

    if n_start_clip + kmer_width - 1 - max_motif_bb >= 0:
        motif_search_seq = motif_search_seq[
            n_start_clip + kmer_width - 1 - max_motif_bb:]
    else:
        motif_search_seq = ("N" * -(n_start_clip + kmer_width - 1 -
                                    max_motif_bb)) + motif_search_seq
    if n_end_clip + kmer_width - 1 - max_motif_ab > 0:
        motif_search_seq = motif_search_seq[
            :-(n_end_clip + kmer_width - 1 - max_motif_ab)]
    elif n_end_clip + kmer_width - 1 - max_motif_ab < 0:
        motif_search_seq = motif_search_seq + "N" * -(
            n_end_clip + kmer_width - 1 - max_motif_ab)
    return kmer_codes, means, r_start, motif_search_seq


def alt_model_read_windows(rl: ReadLevels, std_ref: KmerModel,
                           alt_refs: Sequence[Tuple[str, AltModel]],
                           reg_data: RegionData):
    """Host prep half of the alt-model test: trim, motif search and
    stacked (hits, k) window gathers per alt model.  Returns
    {alt_name: (poss, means_w, ref_means_w, alt_means_w, alt_sds_w,
    const_var)}; the LLR math runs either in numpy
    (``compute_alt_model_read_stats``) or fused on device
    (``stats.device.alt_llhr``)."""
    r_data = rl.r_data
    reg_start, reg_end = reg_data.start, reg_data.end
    max_motif_bb = max(a.motif.mod_pos - 1 for _, a in alt_refs)
    max_motif_ab = max(a.motif.motif_len - a.motif.mod_pos
                       for _, a in alt_refs)
    if rl.means is None or rl.seq is None:
        raise TomboTpuError("Read does not contain valid re-squiggled data.")
    kmer_codes, r_means, r_start, motif_search_seq = _trim_seq_and_means(
        rl.seq, rl.means, r_data.start, reg_start, reg_end, r_data.strand,
        std_ref.kmer_width, std_ref.central_pos, max_motif_bb, max_motif_ab)
    k = std_ref.kmer_width
    testable_len = r_means.shape[0] - k + 1
    r_ref_means, _r_sds = std_ref.get_exp_levels_from_kmer_codes(kmer_codes)
    r_ref_vars = np.square(_r_sds)

    out = {}
    for alt_name, alt_ref in alt_refs:
        search_seq = motif_search_seq[
            max_motif_bb - (alt_ref.motif.mod_pos - 1):]
        ab_clip = max_motif_ab - (alt_ref.motif.motif_len -
                                  alt_ref.motif.mod_pos)
        if ab_clip > 0:
            search_seq = search_seq[:-ab_clip]
        hits = [m.start() for m in
                alt_ref.motif.motif_pat.finditer(search_seq)]
        if not hits:
            out[alt_name] = None
            continue
        hits = np.array(hits, np.int64)
        if r_data.strand == "+":
            poss = r_start + hits
        else:
            poss = r_start + testable_len - hits - 1
        win = hits[:, None] + np.arange(k)[None, :]
        means_w = r_means[win]
        ref_means_w = r_ref_means[win]
        alt_means_w, alt_sds_w = alt_ref.get_exp_levels_from_kmer_codes(
            kmer_codes[win])
        out[alt_name] = (poss, means_w, ref_means_w, alt_means_w,
                         alt_sds_w, r_ref_vars[hits])
    return out, rl.read_id


def compute_alt_model_read_stats(rl: ReadLevels, std_ref: KmerModel,
                                 alt_refs: Sequence[Tuple[str, AltModel]],
                                 use_standard_llhr, reg_data: RegionData):
    """(reference: tombo/tombo_stats.py:3972-4084).  Motif-hit windows are
    scored as one stacked batch per (read, alt model)."""
    r_data = rl.r_data
    reg_start, reg_end = reg_data.start, reg_data.end
    max_motif_bb = max(a.motif.mod_pos - 1 for _, a in alt_refs)
    max_motif_ab = max(a.motif.motif_len - a.motif.mod_pos
                       for _, a in alt_refs)
    if rl.means is None or rl.seq is None:
        raise TomboTpuError("Read does not contain valid re-squiggled data.")
    kmer_codes, r_means, r_start, motif_search_seq = _trim_seq_and_means(
        rl.seq, rl.means, r_data.start, reg_start, reg_end, r_data.strand,
        std_ref.kmer_width, std_ref.central_pos, max_motif_bb, max_motif_ab)
    k = std_ref.kmer_width
    testable_len = r_means.shape[0] - k + 1
    r_ref_means, _r_sds = std_ref.get_exp_levels_from_kmer_codes(kmer_codes)
    r_ref_vars = np.square(_r_sds)

    all_poss, all_llhrs = {}, {}
    for alt_name, alt_ref in alt_refs:
        search_seq = motif_search_seq[
            max_motif_bb - (alt_ref.motif.mod_pos - 1):]
        ab_clip = max_motif_ab - (alt_ref.motif.motif_len -
                                  alt_ref.motif.mod_pos)
        if ab_clip > 0:
            search_seq = search_seq[:-ab_clip]
        hits = [m.start() for m in
                alt_ref.motif.motif_pat.finditer(search_seq)]
        if not hits:
            all_llhrs[alt_name] = np.empty(0)
            all_poss[alt_name] = np.empty(0, np.int64)
            continue
        hits = np.array(hits, np.int64)
        if r_data.strand == "+":
            poss = r_start + hits
        else:
            poss = r_start + testable_len - hits - 1
        # stacked (hits, k) windows
        win = hits[:, None] + np.arange(k)[None, :]
        means_w = r_means[win]
        ref_means_w = r_ref_means[win]
        alt_means_w, alt_sds_w = alt_ref.get_exp_levels_from_kmer_codes(
            kmer_codes[win])
        if config.CONST_SD_MODEL:
            const_var = r_ref_vars[hits]
            if use_standard_llhr:
                llhrs = (np.square(means_w - alt_means_w).sum(-1) -
                         np.square(means_w - ref_means_w).sum(-1)
                         ) / const_var
            else:
                scale_var = const_var[:, None] * config.OCLLHR_SCALE
                coef = config.OCLLHR_HEIGHT * np.power(
                    const_var, config.OCLLHR_POWER)
                llhrs = ((np.exp(-np.square(means_w - ref_means_w) /
                                 scale_var) -
                          np.exp(-np.square(means_w - alt_means_w) /
                                 scale_var)).sum(-1)) * coef
        else:
            if not use_standard_llhr:
                raise TomboTpuError(
                    "Variable SD scaled likelihood ratio not implemented.")
            llhrs = kernels.calc_llh_ratio(
                means_w, ref_means_w, r_ref_vars[win],
                alt_means_w, np.square(alt_sds_w))
        all_llhrs[alt_name] = llhrs
        all_poss[alt_name] = poss
    return all_llhrs, all_poss, rl.read_id


# --------------------------------------------------------------------------
# Per-site aggregation (reference: tombo/tombo_stats.py:4084-4180)
# --------------------------------------------------------------------------

def apply_per_read_thresh(reg_base_stats, single_read_thresh, lower_thresh,
                          stat_type, stat_locs, ctrl_cov=None):
    reg_cov = np.array([bs.shape[0] for bs in reg_base_stats])
    if lower_thresh is not None:
        reg_base_stats = [
            bs[np.logical_or(bs <= lower_thresh, bs >= single_read_thresh)]
            for bs in reg_base_stats]
        valid_cov = np.array([bs.shape[0] for bs in reg_base_stats])
    elif stat_type == ALT_MODEL_TXT:
        reg_base_stats = [bs[np.abs(bs) >= single_read_thresh]
                          for bs in reg_base_stats]
        valid_cov = np.array([bs.shape[0] for bs in reg_base_stats])
    else:
        valid_cov = reg_cov
    if stat_type == SAMP_COMP_TXT:
        out_ctrl_cov = [
            ctrl_cov[pos] if ctrl_cov is not None and pos in ctrl_cov else 0
            for pos in stat_locs]
    else:
        out_ctrl_cov = [0] * stat_locs.shape[0]
    frac_std = np.array([
        np.greater_equal(bs, single_read_thresh).sum() / bs.shape[0]
        if bs.shape[0] > 0 else np.nan
        for bs in reg_base_stats])
    return frac_std, reg_cov, out_ctrl_cov, valid_cov


def collate_reg_stats(stats, stat_locs, read_ids, per_read_file,
                      reg_data: RegionData, single_read_thresh,
                      lower_thresh, stat_type, stat_name, ctrl_cov):
    """(reference: tombo/tombo_stats.py:4124-4180)."""
    stats = np.concatenate(stats)
    stat_locs = np.concatenate(stat_locs)
    valid = ~np.isnan(stats)
    stat_locs = stat_locs[valid]
    stats = stats[valid]
    if stat_locs.shape[0] == 0:
        raise TomboTpuError("No valid positions in this region.")

    per_read_payload = None
    if per_read_file is not None:
        rep_ids = [rid for rid, r_len in read_ids for _ in range(r_len)]
        valid_ids = [rid for rid, ok in zip(rep_ids, valid) if ok]
        lookup = {rid: i for i, rid in enumerate(set(valid_ids))}
        conv = np.array([lookup[r] for r in valid_ids])
        block = np.array(
            list(zip(stat_locs, stats, conv)),
            dtype=[("pos", "u4"), ("stat", "f8"), ("read_id", "u4")])
        per_read_payload = (stat_name, block, lookup, reg_data.chrm,
                            reg_data.strand, reg_data.start)

    order = np.argsort(stat_locs)
    stat_locs = stat_locs[order]
    us_stat_locs = np.unique(stat_locs)
    reg_base_stats = np.split(
        stats[order],
        np.where(np.concatenate([[0], np.diff(stat_locs)]) > 0)[0])
    frac_std, reg_cov, out_ctrl_cov, valid_cov = apply_per_read_thresh(
        reg_base_stats, single_read_thresh, lower_thresh, stat_type,
        stat_locs, ctrl_cov)
    return RegionStats(frac_std, us_stat_locs, reg_data.chrm,
                       reg_data.strand, reg_data.start, reg_cov,
                       np.asarray(out_ctrl_cov), valid_cov), per_read_payload


def _accum_span(reg_data: RegionData, params: TestParams):
    """Dense-accumulator span for a region: per-read statistic positions
    can extend up to ``fm_offset`` (plus k-mer lags for motif stats) past
    the region bounds, mirroring the windows in
    ``compute_*_read_stats``."""
    margin = params.fm_offset + 16
    lo = reg_data.start - margin
    return lo, (reg_data.end - reg_data.start) + 2 * margin


def site_accumulators(stats_list, locs_list, span_lo: int, span_n: int,
                      single_read_thresh, lower_thresh, stat_type):
    """Dense per-site (coverage, valid coverage, above-threshold count)
    accumulators from per-read statistics.

    These are exactly the quantities the per-site fraction aggregation
    (``apply_per_read_thresh``; reference: tombo/tombo_stats.py:4084-4123)
    reduces over reads — and, being sums, they reduce identically across
    read shards on different hosts (``parallel.distributed.psum_hosts``)."""
    cov = np.zeros(span_n, np.int64)
    valid = np.zeros(span_n, np.int64)
    above = np.zeros(span_n, np.int64)
    if stats_list:
        stats = np.concatenate(stats_list)
        locs = np.concatenate(locs_list)
        keep = ~np.isnan(stats)
        stats, locs = stats[keep], locs[keep]
        rel = locs - span_lo
        if rel.shape[0] and (rel.min() < 0 or rel.max() >= span_n):
            raise TomboTpuError(
                "Per-read statistic position outside accumulator span")
        np.add.at(cov, rel, 1)
        if lower_thresh is not None:
            is_valid = np.logical_or(stats <= lower_thresh,
                                     stats >= single_read_thresh)
        elif stat_type == ALT_MODEL_TXT:
            is_valid = np.abs(stats) >= single_read_thresh
        else:
            is_valid = np.ones(stats.shape[0], bool)
        np.add.at(valid, rel[is_valid], 1)
        np.add.at(above, rel[stats >= single_read_thresh], 1)
    return cov, valid, above


def region_stats_from_accumulators(reg_data: RegionData, span_lo: int,
                                   cov, valid, above, ctrl_cov_dense,
                                   stat_type):
    """Rebuild a ``RegionStats`` block from (possibly cross-host-summed)
    dense accumulators; numerically identical to ``collate_reg_stats``
    on the union of the contributing read shards."""
    poss = np.where(cov > 0)[0]
    if poss.shape[0] == 0:
        return None
    with np.errstate(invalid="ignore"):
        frac_std = np.where(valid[poss] > 0,
                            above[poss] / np.maximum(valid[poss], 1),
                            np.nan)
    if stat_type == SAMP_COMP_TXT and ctrl_cov_dense is not None:
        out_ctrl = ctrl_cov_dense[poss]
    else:
        out_ctrl = np.zeros(poss.shape[0], np.int64)
    return RegionStats(frac_std, poss + span_lo, reg_data.chrm,
                       reg_data.strand, reg_data.start, cov[poss],
                       np.asarray(out_ctrl), valid[poss])


def compute_reg_accumulators(reg_data: RegionData, params: TestParams,
                             ctrl_reg_data: Optional[RegionData], fasta,
                             std_ref: Optional[KmerModel],
                             alt_refs, emit_per_read: bool, stat_names):
    """Per-region dense accumulators over THIS host's read shard.

    Unlike ``compute_reg_stats`` this never raises on an empty shard —
    a host owning no reads in the region must still contribute zeros to
    the cross-host reduction."""
    stat_type = params.stat_type
    span_lo, span_n = _accum_span(reg_data, params)
    ctrl_cov = None
    ctrl_cov_dense = np.zeros(span_n, np.int64)
    if stat_type == SAMP_COMP_TXT:
        try:
            ctrl_means, ctrl_sds, ctrl_cov = get_reads_ref(
                ctrl_reg_data, fasta, params.min_test_reads,
                params.fm_offset, std_ref, params.prior_weights)
        except TomboTpuError:
            ctrl_means = ctrl_sds = None
        if ctrl_cov is not None:
            for pos, c in ctrl_cov.items():
                rel = pos - span_lo
                if 0 <= rel < span_n:
                    ctrl_cov_dense[rel] = c

    reg_read_stats = {n: [] for n in stat_names}
    stat_locs = {n: [] for n in stat_names}
    reg_ids = {n: [] for n in stat_names}
    need_seq = stat_type in (DE_NOVO_TXT, ALT_MODEL_TXT)
    if stat_type != SAMP_COMP_TXT or ctrl_cov is not None:
        for rl in reg_data.load_levels(with_seq=need_seq):
            try:
                if stat_type == SAMP_COMP_TXT:
                    r_stats, r_poss, read_id = \
                        compute_sample_compare_read_stats(
                            rl, ctrl_means, ctrl_sds, params.fm_offset,
                            reg_data)
                elif stat_type == DE_NOVO_TXT:
                    r_stats, r_poss, read_id = compute_de_novo_read_stats(
                        rl, std_ref, params.fm_offset, reg_data)
                else:
                    r_stats, r_poss, read_id = compute_alt_model_read_stats(
                        rl, std_ref, alt_refs, params.use_standard_llhr,
                        reg_data)
            except TomboTpuError:
                continue
            for name, s in r_stats.items():
                reg_read_stats[name].append(s)
                reg_ids[name].append((read_id, s.shape[0]))
                stat_locs[name].append(r_poss[name])

    out = {}
    for name in stat_names:
        cov, valid, above = site_accumulators(
            reg_read_stats[name], stat_locs[name], span_lo, span_n,
            params.single_read_thresh, params.lower_thresh, stat_type)
        pr_payload = None
        if emit_per_read and reg_read_stats[name]:
            try:
                _, pr_payload = collate_reg_stats(
                    reg_read_stats[name], stat_locs[name], reg_ids[name],
                    True, reg_data, params.single_read_thresh,
                    params.lower_thresh, stat_type, name, ctrl_cov)
            except TomboTpuError:
                pr_payload = None
        out[name] = (cov, valid, above, ctrl_cov_dense, pr_payload)
    return out


def group_stats_dense(reg_data: RegionData, params: TestParams,
                      results) -> tuple:
    """Pack group (level) statistics into dense region-span arrays so a
    non-owning host can contribute zeros to the cross-host sum."""
    span_lo, span_n = _accum_span(reg_data, params)
    stat = np.zeros(span_n, np.float64)
    mask = np.zeros(span_n, np.int64)
    cov = np.zeros(span_n, np.int64)
    ctrl = np.zeros(span_n, np.int64)
    for _, gs in results:
        rel = gs.reg_poss - span_lo
        stat[rel] = gs.reg_stats
        mask[rel] = 1
        cov[rel] = gs.reg_cov
        ctrl[rel] = gs.ctrl_cov
    return stat, mask, cov, ctrl


def group_stats_from_dense(reg_data: RegionData, params: TestParams,
                           stat, mask, cov, ctrl):
    span_lo, _ = _accum_span(reg_data, params)
    rel = np.where(mask > 0)[0]
    if rel.shape[0] == 0:
        return None
    return GroupStats(stat[rel], rel + span_lo, reg_data.chrm,
                      reg_data.strand, reg_data.start, cov[rel], ctrl[rel])


def _span_exp_codes(reg_data: RegionData, fasta, std_ref: KmerModel,
                    span_lo: int, span_n: int) -> np.ndarray:
    """Per-span-position k-mer codes (-1 = invalid window) with the same
    genome orientation as ``_span_exp_levels``; gathering the model
    table by these codes reproduces its (means, sds) exactly (NaN at
    invalid windows via the device table's sentinel row)."""
    dnstrm = std_ref.kmer_width - std_ref.central_pos - 1
    begin_lag = (std_ref.central_pos if reg_data.strand == "+" else dnstrm)
    end_lag = dnstrm if reg_data.strand == "+" else std_ref.central_pos
    seq_start = span_lo - begin_lag
    seq_end = span_lo + span_n + end_lag
    reg_seq = fasta.get_seq(reg_data.chrm, max(seq_start, 0), seq_end,
                            error_end=False)
    if seq_start < 0:
        reg_seq = "N" * -seq_start + reg_seq
    if len(reg_seq) < seq_end - seq_start:
        reg_seq = reg_seq + "N" * (seq_end - seq_start - len(reg_seq))
    if reg_data.strand == "-":
        reg_seq = rev_comp(reg_seq)
    codes = seq_to_kmer_codes(encode_seq(reg_seq), std_ref.kmer_width)
    if reg_data.strand == "-":
        codes = codes[::-1]
    return codes


def _span_exp_levels(reg_data: RegionData, fasta, std_ref: KmerModel,
                     span_lo: int, span_n: int):
    """Sequence-derived expected (mean, sd) per span position (the same
    genome-oriented convention as ``compute_posterior_samp_dists``;
    reference: tombo/tombo_stats.py:3596-3626).  NaN at positions whose
    k-mer window runs off the chromosome or contains N."""
    dnstrm = std_ref.kmer_width - std_ref.central_pos - 1
    begin_lag = (std_ref.central_pos if reg_data.strand == "+" else dnstrm)
    end_lag = dnstrm if reg_data.strand == "+" else std_ref.central_pos
    seq_start = span_lo - begin_lag
    seq_end = span_lo + span_n + end_lag
    reg_seq = fasta.get_seq(reg_data.chrm, max(seq_start, 0), seq_end,
                            error_end=False)
    if seq_start < 0:
        reg_seq = "N" * -seq_start + reg_seq
    if len(reg_seq) < seq_end - seq_start:
        reg_seq = reg_seq + "N" * (seq_end - seq_start - len(reg_seq))
    if reg_data.strand == "-":
        reg_seq = rev_comp(reg_seq)
    return std_ref.get_exp_levels_from_seq_with_gaps(
        reg_seq, reg_data.strand == "-")


def _device_region_job(reg_data: RegionData, params: TestParams,
                       ctrl_reg_data: Optional[RegionData], fasta,
                       std_ref: Optional[KmerModel]):
    """Prepare one region's packed-lane inputs (expected levels, read
    levels, clipping bounds); raises TomboTpuError exactly where the
    host lane would skip the region."""
    stat_type = params.stat_type
    span_lo, span_n = _accum_span(reg_data, params)
    fm = params.fm_offset
    ctrl_cov_dense = None
    if stat_type == SAMP_COMP_TXT:
        ctrl_means, ctrl_sds, ctrl_cov = get_reads_ref(
            ctrl_reg_data, fasta, params.min_test_reads, fm, std_ref,
            params.prior_weights)
        ctrl_cov_dense = np.zeros(span_n, np.int64)
        for pos, c in ctrl_cov.items():
            rel = pos - span_lo
            if 0 <= rel < span_n:
                ctrl_cov_dense[rel] = c
        # the host ctrl arrays cover [reg_start - fm, reg_end + fm);
        # re-align them to the span
        ref_means = np.full(span_n, np.nan)
        ref_sds = np.full(span_n, np.nan)
        off = (reg_data.start - fm) - span_lo
        ref_means[off:off + ctrl_means.shape[0]] = ctrl_means
        ref_sds[off:off + ctrl_sds.shape[0]] = ctrl_sds
        begin_lag = end_lag = 0
        place_lo = reg_data.start - fm
        place_hi = reg_data.end + fm
        clamp_after = False
    elif stat_type == DE_NOVO_TXT:
        dnstrm = std_ref.kmer_width - std_ref.central_pos - 1
        begin_lag = (std_ref.central_pos if reg_data.strand == "+"
                     else dnstrm)
        end_lag = (dnstrm if reg_data.strand == "+"
                   else std_ref.central_pos)
        # sequence-derived refs ship as int16 k-mer codes; the packed
        # kernel gathers (mean, sd) from the on-chip model table
        # (TOMBO_TPU_STATS_CODES_WIRE=0 restores f32 level rows)
        codes_wire = os.environ.get(
            "TOMBO_TPU_STATS_CODES_WIRE", "1") == "1"
        if codes_wire:
            ref_means = ref_sds = None
            ref_codes = _span_exp_codes(
                reg_data, fasta, std_ref, span_lo, span_n)
        else:
            ref_codes = None
            ref_means, ref_sds = _span_exp_levels(
                reg_data, fasta, std_ref, span_lo, span_n)
        place_lo = reg_data.start - begin_lag - fm
        place_hi = reg_data.end + end_lag + fm
        clamp_after = True
    else:
        raise TomboTpuError(
            "Device stats lane supports de_novo and sample_compare only")
    # fused resquiggle->detect: device-resident means skip the sidecar
    # read AND the per-site level upload (stats/device_levels.py)
    levels = reg_data.load_levels_packed()
    if not levels:
        raise TomboTpuError("Reads contain no statistics in this region.")
    return dict(reg=reg_data, span_lo=span_lo, span_n=span_n,
                ref_means=ref_means, ref_sds=ref_sds, levels=levels,
                ref_codes=(ref_codes if stat_type == DE_NOVO_TXT
                           else None),
                table=((std_ref.means, std_ref.sds)
                       if stat_type == DE_NOVO_TXT and
                       ref_codes is not None else None),
                place_lo=place_lo, place_hi=place_hi,
                begin_lag=begin_lag, end_lag=end_lag,
                clamp_after=clamp_after, ctrl_cov_dense=ctrl_cov_dense)


def compute_reg_stats_device_batch(jobs, params: TestParams,
                                   emit_per_read: bool = False):
    """Run MANY prepared region jobs through ONE packed device dispatch
    (stats/device.py ``PackedRegionBatch``); returns one result list per
    job, shaped like ``compute_reg_stats`` output.

    Per-read statistic streams come from the same dispatch (the p-value
    matrix rides back with the counts), so requesting
    ``--per-read-statistics-basename`` keeps the device lane active; the
    streamed values are computed in the device float width (f32 unless
    jax x64 is enabled)."""
    from . import device as dev
    stat_type = params.stat_type
    fm = params.fm_offset
    mode = "two_way" if params.lower_thresh is not None else "plain"
    table = next((j["table"] for j in jobs
                  if j is not None and j.get("table") is not None), None)
    packer = dev.PackedRegionBatch(fm, levels_table=table)
    for j, job in enumerate(jobs):
        if job is None:
            continue
        packer.add_region(j, job["span_lo"], job["span_n"],
                          job["ref_means"], job["ref_sds"], job["levels"],
                          job["place_lo"], job["place_hi"],
                          job["begin_lag"], job["end_lag"],
                          ref_codes=job.get("ref_codes"))
    clamp_after = next((j["clamp_after"] for j in jobs if j is not None),
                       True)
    counts, pvals = packer.dispatch(
        fm, clamp_after, float(params.single_read_thresh),
        float(params.lower_thresh
              if params.lower_thresh is not None else -1e30),
        mode, want_pvals=emit_per_read)
    out = []
    for j, job in enumerate(jobs):
        if job is None or counts is None:
            out.append([])
            continue
        cov, valid_cov, above = packer.unpack_region(
            j, job["span_lo"], job["span_n"], counts)
        reg_stats = region_stats_from_accumulators(
            job["reg"], job["span_lo"], cov, valid_cov, above,
            job["ctrl_cov_dense"], stat_type)
        if reg_stats is None:
            out.append([])
            continue
        pr_payload = None
        if emit_per_read and pvals is not None:
            streams = packer.read_streams(j, pvals)
            if streams:
                stats_l, locs_l, ids_l = [], [], []
                for ridx in sorted(streams):
                    poss, st = streams[ridx]
                    if st.shape[0] == 0:
                        continue
                    stats_l.append(st)
                    locs_l.append(poss)
                    ids_l.append((job["levels"][ridx].read_id,
                                  st.shape[0]))
                if stats_l:
                    try:
                        _, pr_payload = collate_reg_stats(
                            stats_l, locs_l, ids_l, True, job["reg"],
                            params.single_read_thresh,
                            params.lower_thresh, stat_type, stat_type,
                            None)
                    except TomboTpuError:
                        pr_payload = None
        out.append([(stat_type, reg_stats, pr_payload)])
    return out


def _alt_device_region_job(reg_data: RegionData, params: TestParams,
                           std_ref: KmerModel, alt_items):
    """Host prep for the ALT device lane: per-read motif-hit window
    stacks (positions, signal/expected/alt level windows, constant
    variances) for every alt model."""
    levels = reg_data.load_levels(with_seq=True)
    per_alt = {name: [] for name, _ in alt_items}
    for rl in levels:
        try:
            wins, read_id = alt_model_read_windows(rl, std_ref, alt_items,
                                                   reg_data)
        except TomboTpuError:
            continue
        for name, w in wins.items():
            if w is not None:
                per_alt[name].append((read_id, w))
    if all(len(v) == 0 for v in per_alt.values()):
        raise TomboTpuError("Reads contain no statistics in this region.")
    return dict(reg=reg_data, per_alt=per_alt)


def compute_alt_stats_device_batch(jobs, params: TestParams, alt_items,
                                   emit_per_read: bool = False):
    """ALT scaled-LLR testing for MANY prepared regions in one device
    dispatch per alt model (stats/device.py ``alt_llhr``): window stacks
    concatenate across (region, read), the fused kernel computes every
    hit's ratio, and per-site fraction accumulators build on host from
    the sparse (pos, llhr) streams.  Output shape matches
    ``compute_reg_stats``."""
    from . import device as dev
    import jax.numpy as jnp
    out_per_job = [[] for _ in jobs]
    for name, _alt in alt_items:
        chunks = []       # (job_idx, read_id, poss, slice into H axis)
        means_l, ref_l, alt_l, cv_l = [], [], [], []
        h0 = 0
        for j, job in enumerate(jobs):
            if job is None:
                continue
            for read_id, (poss, mw, rw, aw, _asd, cv) in \
                    job["per_alt"][name]:
                H = poss.shape[0]
                chunks.append((j, read_id, poss, slice(h0, h0 + H)))
                means_l.append(mw)
                ref_l.append(rw)
                alt_l.append(aw)
                cv_l.append(cv)
                h0 += H
        if h0 == 0:
            continue
        k = means_l[0].shape[1]
        Hp = dev._pow2_at_least(h0, 256)
        mw = np.zeros((Hp, k)); rw = np.zeros((Hp, k))
        aw = np.zeros((Hp, k)); cv = np.ones(Hp)
        mw[:h0] = np.concatenate(means_l)
        rw[:h0] = np.concatenate(ref_l)
        aw[:h0] = np.concatenate(alt_l)
        cv[:h0] = np.concatenate(cv_l)
        llhrs = np.asarray(dev.alt_llhr(
            jnp.asarray(mw), jnp.asarray(rw), jnp.asarray(aw),
            jnp.asarray(cv), bool(params.use_standard_llhr),
            float(config.OCLLHR_SCALE), float(config.OCLLHR_HEIGHT),
            float(config.OCLLHR_POWER)), np.float64)[:h0]
        # regroup per region and aggregate exactly as the host lane
        per_job: dict = {}
        for j, read_id, poss, sl in chunks:
            per_job.setdefault(j, []).append((read_id, poss, llhrs[sl]))
        for j, reads in per_job.items():
            reg = jobs[j]["reg"]
            span_lo, span_n = _accum_span(reg, params)
            stats_l = [st for _, _, st in reads]
            locs_l = [p for _, p, _ in reads]
            ids_l = [(rid, st.shape[0]) for rid, _, st in reads]
            cov, valid, above = site_accumulators(
                stats_l, locs_l, span_lo, span_n,
                params.single_read_thresh, params.lower_thresh,
                ALT_MODEL_TXT)
            reg_stats = region_stats_from_accumulators(
                reg, span_lo, cov, valid, above, None, ALT_MODEL_TXT)
            if reg_stats is None:
                continue
            pr_payload = None
            if emit_per_read:
                try:
                    _, pr_payload = collate_reg_stats(
                        stats_l, locs_l, ids_l, True, reg,
                        params.single_read_thresh, params.lower_thresh,
                        ALT_MODEL_TXT, name, None)
                except TomboTpuError:
                    pr_payload = None
            out_per_job[j].append((name, reg_stats, pr_payload))
    return out_per_job


def compute_reg_stats_device(reg_data: RegionData, params: TestParams,
                             ctrl_reg_data: Optional[RegionData], fasta,
                             std_ref: Optional[KmerModel]):
    """Device (TPU) lane for the de_novo / sample_compare per-read tests
    over ONE region (host equivalent: ``compute_reg_stats``); production
    runs batch many regions per dispatch via
    ``compute_reg_stats_device_batch``."""
    job = _device_region_job(reg_data, params, ctrl_reg_data, fasta,
                             std_ref)
    (res,) = compute_reg_stats_device_batch([job], params)
    if not res:
        raise TomboTpuError("No valid positions in this region.")
    return res


def compute_reg_stats(reg_data: RegionData, params: TestParams,
                      ctrl_reg_data: Optional[RegionData], fasta,
                      std_ref: Optional[KmerModel],
                      alt_refs: Optional[Sequence[Tuple[str, AltModel]]],
                      emit_per_read: bool):
    """(reference: tombo/tombo_stats.py:4180-4236)."""
    stat_type = params.stat_type
    if stat_type == SAMP_COMP_TXT:
        ctrl_means, ctrl_sds, ctrl_cov = get_reads_ref(
            ctrl_reg_data, fasta, params.min_test_reads, params.fm_offset,
            std_ref, params.prior_weights)
    else:
        ctrl_cov = None

    stat_names = ([stat_type] if stat_type != ALT_MODEL_TXT
                  else [name for name, _ in alt_refs])
    reg_read_stats = {n: [] for n in stat_names}
    stat_locs = {n: [] for n in stat_names}
    reg_ids = {n: [] for n in stat_names}
    need_seq = stat_type in (DE_NOVO_TXT, ALT_MODEL_TXT)
    for rl in reg_data.load_levels(with_seq=need_seq):
        try:
            if stat_type == SAMP_COMP_TXT:
                r_stats, r_poss, read_id = compute_sample_compare_read_stats(
                    rl, ctrl_means, ctrl_sds, params.fm_offset, reg_data)
            elif stat_type == DE_NOVO_TXT:
                r_stats, r_poss, read_id = compute_de_novo_read_stats(
                    rl, std_ref, params.fm_offset, reg_data)
            else:
                r_stats, r_poss, read_id = compute_alt_model_read_stats(
                    rl, std_ref, alt_refs, params.use_standard_llhr,
                    reg_data)
        except TomboTpuError:
            continue
        for name, s in r_stats.items():
            reg_read_stats[name].append(s)
            reg_ids[name].append((read_id, s.shape[0]))
            stat_locs[name].append(r_poss[name])

    if sum(len(v) for v in reg_read_stats.values()) == 0:
        raise TomboTpuError("Reads contain no statistics in this region.")

    # dense per-site accumulators replace the sort/split/per-site-list
    # aggregation: numerically identical (cross-checked against
    # collate_reg_stats by tests/test_distributed.py) and fully
    # vectorized — the per-site python comprehensions dominated the
    # detection profile (bench.py --stats)
    span_lo, span_n = _accum_span(reg_data, params)
    ctrl_cov_dense = None
    if stat_type == SAMP_COMP_TXT and ctrl_cov is not None:
        ctrl_cov_dense = np.zeros(span_n, np.int64)
        for pos, c in ctrl_cov.items():
            rel = pos - span_lo
            if 0 <= rel < span_n:
                ctrl_cov_dense[rel] = c

    out = []
    for name in stat_names:
        if not reg_read_stats[name]:
            continue
        cov, valid, above = site_accumulators(
            reg_read_stats[name], stat_locs[name], span_lo, span_n,
            params.single_read_thresh, params.lower_thresh, stat_type)
        reg_stats = region_stats_from_accumulators(
            reg_data, span_lo, cov, valid, above, ctrl_cov_dense, stat_type)
        if reg_stats is None:
            raise TomboTpuError("No valid positions in this region.")
        pr_payload = None
        if emit_per_read:
            _, pr_payload = collate_reg_stats(
                reg_read_stats[name], stat_locs[name], reg_ids[name],
                True, reg_data, params.single_read_thresh,
                params.lower_thresh, stat_type, name, ctrl_cov)
        out.append((name, reg_stats, pr_payload))
    return out


# --------------------------------------------------------------------------
# Group (level) testing (reference: tombo/tombo_stats.py:4335-4398)
# --------------------------------------------------------------------------

def _group_device_tests(samp_p, ctrl_p, stat_type) -> np.ndarray:
    """One batched device call of the requested level test over a
    (P, C) padded pair (P may concatenate MANY regions)."""
    from . import device as dev
    import jax.numpy as jnp
    sj, cj = jnp.asarray(samp_p), jnp.asarray(ctrl_p)
    if stat_type in (KS_TEST_TXT, KS_STAT_TEST_TXT):
        out = dev.ks_tests(sj, cj, stat_type == KS_STAT_TEST_TXT)
    elif stat_type in (U_TEST_TXT, U_STAT_TEST_TXT):
        out = dev.u_tests(sj, cj, stat_type == U_STAT_TEST_TXT)
    elif stat_type in (T_TEST_TXT, T_STAT_TEST_TXT):
        out = dev.t_tests(sj, cj, stat_type == T_STAT_TEST_TXT)
    else:
        raise TomboTpuError("Unrecognized test type.")
    return np.asarray(out, np.float64)


def _group_levels_pair(reg_data: RegionData, ctrl_reg_data: RegionData,
                       fm_offset: int):
    samp = reg_data.copy_update(
        reg_data.start - fm_offset,
        reg_data.end + fm_offset).get_base_levels()
    ctrl = ctrl_reg_data.copy_update(
        ctrl_reg_data.start - fm_offset,
        ctrl_reg_data.end + fm_offset).get_base_levels()
    return samp, ctrl


def compute_group_stats_device_batch(jobs, params: TestParams):
    """Packed level-test lane: ONE device dispatch for a whole chunk of
    regions (the per-site tests are position-independent, so regions
    concatenate along the position axis; one call per ~10 kb region
    previously paid a full link round trip each — reference per-site
    loops being replaced: tombo/tombo_stats.py:4236-4334).

    jobs: (reg_data, samp, ctrl) or None per region.  Returns one
    ``compute_group_reg_stats``-shaped result list per job."""
    from . import device as dev
    live = [(i, r, s, c) for i, (j) in enumerate(jobs) if j is not None
            for r, s, c in [j]]
    if not live:
        return [[] for _ in jobs]
    C = max(max(s.shape[1], c.shape[1]) for _, _, s, c in live)
    C8 = ((C + 7) // 8) * 8
    pads = [dev.pad_levels_pair(
        np.ascontiguousarray(s), np.ascontiguousarray(c), cov_mult=C8)
        for _, _, s, c in live]
    lens = [s.shape[0] for _, _, s, _ in live]
    P = sum(lens)
    Pp = 1 << max(P - 1, 1).bit_length()
    Cp = pads[0][0].shape[1]
    samp_all = np.full((Pp, Cp), np.nan)
    ctrl_all = np.full((Pp, Cp), np.nan)
    o = 0
    for (sp, cp), n in zip(pads, lens):
        samp_all[o:o + n] = sp
        ctrl_all[o:o + n] = cp
        o += n
    stats_all = _group_device_tests(samp_all, ctrl_all, params.stat_type)
    out = [[] for _ in jobs]
    o = 0
    for (i, reg, samp, ctrl), n in zip(live, lens):
        out[i] = _group_post(reg, params, samp, ctrl,
                             stats_all[o:o + n])
        o += n
    return out


def compute_group_reg_stats(reg_data: RegionData,
                            ctrl_reg_data: RegionData,
                            params: TestParams):
    fm_offset = params.fm_offset
    stat_type = params.stat_type
    samp, ctrl = _group_levels_pair(reg_data, ctrl_reg_data, fm_offset)
    # device lane: per-site level tests are position-independent, so one
    # batched call over the whole region computes every covered block's
    # statistics at once; the block-local Fisher/mean windows stay
    # on host, preserving the reference's block-edge semantics
    dev_stats = None
    if use_device_stats():
        from . import device as dev
        samp_p, ctrl_p = dev.pad_levels_pair(samp, ctrl)
        dev_stats = _group_device_tests(samp_p, ctrl_p, stat_type)
    return _group_post(reg_data, params, samp, ctrl, dev_stats)


def _group_post(reg_data: RegionData, params: TestParams, samp, ctrl,
                dev_stats):
    """Host half of the group level tests: covered-block discovery,
    Fisher/mean windows (block-edge semantics preserved), GroupStats
    assembly (reference: tombo/tombo_stats.py:4236-4334)."""
    fm_offset = params.fm_offset
    stat_type = params.stat_type
    samp_cov = (~np.isnan(samp)).sum(axis=1)
    ctrl_cov = (~np.isnan(ctrl)).sum(axis=1)
    cov_regs = np.where(np.diff(np.concatenate([
        [False], (samp_cov >= params.min_test_reads) &
        (ctrl_cov >= params.min_test_reads), [False]])))[0]
    if len(cov_regs) == 0:
        return []

    reg_stats, reg_poss, reg_cov, reg_ctrl_cov = [], [], [], []
    for cs, ce in zip(cov_regs[:-1:2], cov_regs[1::2]):
        if ce - cs < fm_offset * 2 + 1:
            continue
        if dev_stats is not None:
            cstats = dev_stats[cs:ce]
        elif stat_type in (KS_TEST_TXT, KS_STAT_TEST_TXT):
            cstats = kernels.compute_ks_tests(
                samp[cs:ce], ctrl[cs:ce], stat_type == KS_STAT_TEST_TXT)
        elif stat_type in (U_TEST_TXT, U_STAT_TEST_TXT):
            cstats = kernels.compute_u_tests(
                samp[cs:ce], ctrl[cs:ce], stat_type == U_STAT_TEST_TXT)
        elif stat_type in (T_TEST_TXT, T_STAT_TEST_TXT):
            cstats = kernels.compute_t_tests(
                samp[cs:ce], ctrl[cs:ce], stat_type == T_STAT_TEST_TXT)
        else:
            raise TomboTpuError("Unrecognized test type.")
        if fm_offset > 0:
            if stat_type in (KS_TEST_TXT, U_TEST_TXT, T_TEST_TXT):
                cstats = kernels.calc_window_fishers_method(cstats,
                                                            fm_offset)
            else:
                cstats = kernels.calc_window_means(cstats, fm_offset)
        reg_stats.append(cstats)
        reg_poss.append(np.arange(reg_data.start - fm_offset + cs,
                                  reg_data.start - fm_offset + ce))
        reg_cov.append(samp_cov[cs:ce])
        reg_ctrl_cov.append(ctrl_cov[cs:ce])
    if not reg_stats:
        return []
    return [(stat_type, GroupStats(
        np.concatenate(reg_stats), np.concatenate(reg_poss),
        reg_data.chrm, reg_data.strand, reg_data.start,
        np.concatenate(reg_cov), np.concatenate(reg_ctrl_cov)))]


# --------------------------------------------------------------------------
# Orchestration (reference: tombo/tombo_stats.py:4400-4634)
# --------------------------------------------------------------------------

# process-pool worker state, installed once per worker by _proc_init
# (the reference's region workers are real processes,
# tombo/tombo_stats.py:4400-4446; a thread pool is GIL-bound on the
# per-read python loops)
_PROC_STATE: dict = {}


def _proc_init(reads_index, ctrl_reads_index, fasta, std_ref, alt_items,
               params, emit_per_read, is_level):
    import os
    # workers are pure numpy/scipy compute: never let them grab the
    # device or mutate the shared levels sidecar
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["TOMBO_TPU_STATS_DEVICE"] = "0"
    # read the sidecar, never mutate it from a worker
    os.environ["TOMBO_TPU_LEVELS_SIDECAR_WRITE"] = "0"
    _PROC_STATE.update(
        reads_index=reads_index, ctrl_reads_index=ctrl_reads_index,
        fasta=fasta, std_ref=std_ref, alt_items=alt_items, params=params,
        emit_per_read=emit_per_read, is_level=is_level)


def _proc_run_region(reg_desc):
    s = _PROC_STATE
    chrm, strand, start, end = reg_desc
    reg = RegionData(chrm, strand, start, end).add_reads(s["reads_index"])
    ctrl_reg = None
    if s["ctrl_reads_index"] is not None:
        ctrl_reg = RegionData(chrm, strand, start, end).add_reads(
            s["ctrl_reads_index"])
    try:
        if s["is_level"]:
            return [(n, gs, None) for n, gs in compute_group_reg_stats(
                reg, ctrl_reg, s["params"])]
        return compute_reg_stats(
            reg, s["params"], ctrl_reg, s["fasta"], s["std_ref"],
            s["alt_items"], emit_per_read=s["emit_per_read"])
    except TomboTpuError:
        return []

def test_significance(reads_index, params: TestParams, stats_fn: str,
                      fasta=None, std_ref: Optional[KmerModel] = None,
                      alt_refs: Optional[Dict[str, AltModel]] = None,
                      ctrl_reads_index=None,
                      per_read_bn: Optional[str] = None,
                      num_processes: int = 4,
                      verbose: bool = False,
                      dist=None):
    """Run per-site testing over all covered regions and write stats files
    (reference: tombo/tombo_stats.py:4574-4634 ``test_significance``).

    Regions are computed by a thread pool; stats files are written by this
    (single) thread in deterministic region order, so results are
    independent of worker count (reference guarantee:
    docs/modified_base_detection.rst:151-153).

    Multi-host: pass a ``parallel.distributed.DistContext``.  Per-read
    model statistics shard READS across hosts by stable hash and merge
    dense per-site accumulators with a cross-host sum; group (level)
    statistics shard REGIONS (their per-site tests need every read at a
    site).  Either way all hosts hold identical totals, the main host
    writes the files, and results are independent of the host count —
    extending the reference's process-count invariance across hosts.
    Per-read statistic files are written per host
    (``<name>.host<i>``, disjoint read shards)."""
    from ..parallel.distributed import DistContext, psum_hosts, read_key
    stat_type = params.stat_type
    is_level = stat_type in LEVEL_STATS_TXTS
    alt_items = sorted(alt_refs.items()) if alt_refs else None
    if dist is None:
        dist = DistContext()
    multi = dist.n_hosts > 1

    regions = [
        RegionData(chrm, strand, start, start + params.region_size)
        for chrm, strand, start in reads_index.iter_cov_regs(
            1, params.region_size, ctrl_reads_index)]

    if is_level:
        stat_names = [stat_type]
    elif stat_type == ALT_MODEL_TXT:
        stat_names = [name for name, _ in alt_items]
    else:
        stat_names = [stat_type]

    # output files: in a multi-host run only the main host writes the
    # merged stats files; per-read blocks are host-local shards
    stats_files = {}
    if not multi or dist.is_main:
        for name in stat_names:
            fn = (stats_fn if len(stat_names) == 1 else
                  _alt_stats_fn(stats_fn, name))
            if is_level:
                stats_files[name] = LevelStats(
                    fn, stat_type, params.region_size,
                    params.min_test_reads, params.num_most_signif)
            else:
                stats_files[name] = ModelStats(
                    fn, stat_type, params.region_size,
                    params.cov_damp_counts, params.min_test_reads,
                    params.num_most_signif)
    pr_files = {}
    if per_read_bn is not None and not is_level:
        for name in stat_names:
            fn = (per_read_bn if len(stat_names) == 1 else
                  _alt_stats_fn(per_read_bn, name))
            if multi:
                fn = "%s.host%d" % (fn, dist.host_id)
            pr_files[name] = PerReadStats(fn, stat_type, params.region_size)

    # output provenance: record the fully-resolved test parameters in every
    # stats artifact (SURVEY §5.6 TPU-equivalent reproducibility note)
    resolved_json = config.resolved_params_json(test_params=params)
    for sf in stats_files.values():
        sf.set_resolved_params(resolved_json)
    for pf in pr_files.values():
        pf.set_resolved_params(resolved_json)

    # the device lane serves the per-site reductions AND the per-read
    # statistic streams (the p-value matrix rides back with the counts);
    # ALT runs its scaled-LLR windows through the fused device kernel
    device_ok = (use_device_stats() and
                 stat_type in (DE_NOVO_TXT, SAMP_COMP_TXT, ALT_MODEL_TXT))

    def run_region_single(reg: RegionData):
        reg.add_reads(reads_index)
        ctrl_reg = None
        if ctrl_reads_index is not None:
            ctrl_reg = RegionData(reg.chrm, reg.strand, reg.start,
                                  reg.end).add_reads(ctrl_reads_index)
        try:
            if is_level:
                return [(n, gs, None) for n, gs in compute_group_reg_stats(
                    reg, ctrl_reg, params)]
            if device_ok:
                return compute_reg_stats_device(
                    reg, params, ctrl_reg, fasta, std_ref)
            return compute_reg_stats(
                reg, params, ctrl_reg, fasta, std_ref, alt_items,
                emit_per_read=bool(pr_files))
        except TomboTpuError:
            return []

    def run_region_multi(args):
        reg_idx, reg = args
        if is_level:
            # region-sharded: the owning host computes with ALL reads,
            # other hosts contribute zero-filled dense arrays
            if dist.owns_region(reg_idx):
                reg.add_reads(reads_index)
                ctrl_reg = RegionData(
                    reg.chrm, reg.strand, reg.start,
                    reg.end).add_reads(ctrl_reads_index)
                try:
                    results = compute_group_reg_stats(reg, ctrl_reg, params)
                except TomboTpuError:
                    results = []
            else:
                results = []
            return {stat_type: group_stats_dense(reg, params, results)}
        # read-sharded: this host's hash shard only
        reg.add_reads(reads_index)
        reg.reads = [r for r in reg.reads if dist.owns_read(read_key(r))]
        ctrl_reg = None
        if ctrl_reads_index is not None:
            # the control posterior reference is a per-site median over
            # ALL control reads (not decomposable) — every host loads it
            ctrl_reg = RegionData(reg.chrm, reg.strand, reg.start,
                                  reg.end).add_reads(ctrl_reads_index)
        return compute_reg_accumulators(
            reg, params, ctrl_reg, fasta, std_ref, alt_items,
            bool(pr_files), stat_names)

    from concurrent.futures import ThreadPoolExecutor
    from . import levels_cache
    # single-host runs append any FAST5-loaded levels to the
    # per-directory sidecar so subsequent detection runs skip HDF5
    # entirely (multi-host runs only read it: the cache lives beside
    # possibly-shared data)
    with levels_cache.building(not multi), \
            ThreadPoolExecutor(max_workers=num_processes) as pool:
        if multi:
            # collectives must run in deterministic region order on every
            # host: the thread pool computes host-local accumulators and
            # the cross-host sums happen here — BATCHED over region
            # chunks (regions share one dense span size), so a genome
            # costs O(regions / chunk) collective round trips instead of
            # one per region.  Double-buffered: while this (main) thread
            # reduces + writes chunk c, the pool already computes chunk
            # c+1 — the reduction never serializes against region
            # compute (round-4 task 5: eff_det_4hosts 0.38 -> >=0.75)
            chunk = int(os.environ.get("TOMBO_TPU_PSUM_CHUNK", "128"))
            spans = [(c0, regions[c0:c0 + chunk])
                     for c0 in range(0, len(regions), chunk)]

            def submit_chunk(ci):
                c0, c_regs = spans[ci]
                return [pool.submit(run_region_multi, (c0 + i, reg))
                        for i, reg in enumerate(c_regs)]

            # stats-file writes are the leader's serial Amdahl term (gzip
            # HDF5 blocks); a single writer thread drains them in order
            # while the main thread reduces the next chunk, so write time
            # overlaps collectives + compute instead of adding to them
            import queue as _queue
            import threading as _threading
            wq: "_queue.Queue" = _queue.Queue(maxsize=64)
            werr = []

            def _writer():
                while True:
                    item = wq.get()
                    if item is None:
                        return
                    kind, name, payload = item
                    try:
                        if kind == 0:
                            stats_files[name]._write_stat_block(payload)
                        else:
                            block, lookup, chrm, strand, start = payload
                            pr_files[name]._write_per_read_block(
                                block, lookup, chrm, strand, start)
                    except Exception as e:  # noqa: BLE001
                        werr.append(e)

            wthread = _threading.Thread(target=_writer, daemon=True)
            wthread.start()

            futs = submit_chunk(0) if spans else []
            for ci in range(len(spans)):
                _c0, c_regs = spans[ci]
                c_accs = [f.result() for f in futs]
                futs = submit_chunk(ci + 1) if ci + 1 < len(spans) else []
                for name in stat_names:
                    if is_level:
                        stacked = [
                            np.stack([acc[name][k] for acc in c_accs])
                            for k in range(4)]
                        merged = psum_hosts(dist, *stacked)
                        per_reg = [
                            (group_stats_from_dense(
                                reg, params, *(m[i] for m in merged)),
                             None)
                            for i, reg in enumerate(c_regs)]
                    else:
                        stacked = [
                            np.stack([acc[name][k] for acc in c_accs])
                            for k in range(3)]
                        cov_m, valid_m, above_m = psum_hosts(
                            dist, *stacked)
                        per_reg = []
                        for i, reg in enumerate(c_regs):
                            ctrl_dense, pr_payload = (c_accs[i][name][3],
                                                      c_accs[i][name][4])
                            span_lo, _ = _accum_span(reg, params)
                            per_reg.append((
                                region_stats_from_accumulators(
                                    reg, span_lo, cov_m[i], valid_m[i],
                                    above_m[i], ctrl_dense, stat_type),
                                pr_payload))
                    for reg_stats, pr_payload in per_reg:
                        if reg_stats is not None and name in stats_files:
                            wq.put((0, name, reg_stats))
                        if pr_payload is not None and name in pr_files:
                            (_, block, lookup, chrm, strand,
                             start) = pr_payload
                            wq.put((1, name, (block, lookup, chrm,
                                              strand, start)))
            wq.put(None)
            wthread.join()
            if werr:
                raise werr[0]
        else:
            # real process workers (reference: tombo/tombo_stats.py:4400
            # region worker processes): the per-read/site python loops
            # are GIL-bound, so a thread pool caps at ~1 core.  Spawned
            # processes (never fork — the parent may hold a live device
            # client) receive the shared state once via the initializer;
            # the device lane and small runs keep threads (the device
            # does the heavy math / spawn startup would dominate).
            # Writers stay HERE, in region order — results are identical
            # regardless of worker count or kind (reference guarantee:
            # docs/modified_base_detection.rst:151-153).
            if device_ok and not is_level:
                # packed multi-region device lane: one dispatch per
                # ~10^6 site-observations (region prep — index lookups +
                # level loads — runs on the thread pool; writes stay
                # here in region order)
                budget = int(os.environ.get(
                    "TOMBO_TPU_STATS_CHUNK_OBS", "1500000"))

                is_alt = stat_type == ALT_MODEL_TXT

                def prep_one(reg):
                    reg.add_reads(reads_index)
                    try:
                        if is_alt:
                            return _alt_device_region_job(
                                reg, params, std_ref, alt_items)
                        ctrl_reg = None
                        if ctrl_reads_index is not None:
                            ctrl_reg = RegionData(
                                reg.chrm, reg.strand, reg.start,
                                reg.end).add_reads(ctrl_reads_index)
                        return _device_region_job(reg, params, ctrl_reg,
                                                  fasta, std_ref)
                    except TomboTpuError:
                        return None

                i = 0
                while i < len(regions):
                    c_regs = []
                    obs = 0
                    while i < len(regions) and (not c_regs or
                                                (obs < budget and
                                                 len(c_regs) < 64)):
                        reg = regions[i]
                        i += 1
                        reg.add_reads(reads_index)
                        obs += sum(min(r.end, reg.end) -
                                   max(r.start, reg.start)
                                   for r in reg.reads)
                        c_regs.append(reg)
                    jobs = list(pool.map(prep_one, c_regs))
                    if is_alt:
                        results_per_reg = compute_alt_stats_device_batch(
                            jobs, params, alt_items,
                            emit_per_read=bool(pr_files))
                    else:
                        results_per_reg = compute_reg_stats_device_batch(
                            jobs, params, emit_per_read=bool(pr_files))
                    for reg, results in zip(c_regs, results_per_reg):
                        for name, reg_stats, pr_payload in results:
                            stats_files[name]._write_stat_block(reg_stats)
                            if pr_payload is not None and name in pr_files:
                                (_, block, lookup, chrm, strand,
                                 start) = pr_payload
                                pr_files[name]._write_per_read_block(
                                    block, lookup, chrm, strand, start)
                        if verbose:
                            print("  processed %s:%s:%d" % (
                                reg.chrm, reg.strand, reg.start))
                for sf in stats_files.values():
                    if sf.is_empty:
                        raise TomboTpuError(
                            "No genomic positions contain "
                            "--minimum-test-reads.")
                    sf.close()
                for prf in pr_files.values():
                    prf.close()
                return stats_fn
            if device_ok and is_level and ctrl_reads_index is not None:
                # packed level-test lane: regions concatenate along the
                # position axis into ONE device dispatch per chunk (one
                # call per region paid a full tunnel round trip each;
                # reference per-site loops: tombo/tombo_stats.py:4236-4334)
                def prep_level(reg):
                    reg.add_reads(reads_index)
                    ctrl_reg = RegionData(
                        reg.chrm, reg.strand, reg.start,
                        reg.end).add_reads(ctrl_reads_index)
                    try:
                        samp, ctrl = _group_levels_pair(
                            reg, ctrl_reg, params.fm_offset)
                        return (reg, samp, ctrl)
                    except TomboTpuError:
                        return None

                chunk_regs = int(os.environ.get(
                    "TOMBO_TPU_LEVEL_CHUNK_REGS", "16"))
                i = 0
                while i < len(regions):
                    c_regs = regions[i:i + chunk_regs]
                    i += chunk_regs
                    jobs = list(pool.map(prep_level, c_regs))
                    res_per_reg = compute_group_stats_device_batch(
                        jobs, params)
                    for reg, results in zip(c_regs, res_per_reg):
                        for name, reg_stats in results:
                            stats_files[name]._write_stat_block(reg_stats)
                        if verbose:
                            print("  processed %s:%s:%d" % (
                                reg.chrm, reg.strand, reg.start))
                for sf in stats_files.values():
                    if sf.is_empty:
                        raise TomboTpuError(
                            "No genomic positions contain "
                            "--minimum-test-reads.")
                    sf.close()
                for prf in pr_files.values():
                    prf.close()
                return stats_fn
            procs_env = os.environ.get("TOMBO_TPU_DETECT_PROCS", "auto")
            if procs_env == "auto":
                # spawn startup (fresh interpreter + imports per worker)
                # costs seconds; only amortize it on runs with real
                # compute.  ~20 Mb of mapped bases ≈ tens of seconds of
                # host-lane testing.
                total_bases = sum(
                    r.end - r.start
                    for cs_reads in reads_index.reads_index.values()
                    for r in cs_reads)
                procs_worth = total_bases >= 20_000_000
            else:
                procs_worth = procs_env == "1"
            use_procs = (not device_ok and num_processes > 1 and
                         len(regions) >= 2 * num_processes and procs_worth)
            if use_procs:
                import multiprocessing as mp
                from concurrent.futures import ProcessPoolExecutor
                ppool = ProcessPoolExecutor(
                    max_workers=num_processes,
                    mp_context=mp.get_context("spawn"),
                    initializer=_proc_init,
                    initargs=(reads_index, ctrl_reads_index, fasta,
                              std_ref, alt_items, params, bool(pr_files),
                              is_level))
                result_iter = ppool.map(
                    _proc_run_region,
                    [(r.chrm, r.strand, r.start, r.end) for r in regions],
                    chunksize=4)
            else:
                ppool = None
                result_iter = pool.map(run_region_single, regions)
            try:
                for reg, results in zip(regions, result_iter):
                    for name, reg_stats, pr_payload in results:
                        stats_files[name]._write_stat_block(reg_stats)
                        if pr_payload is not None and name in pr_files:
                            (_, block, lookup, chrm, strand,
                             start) = pr_payload
                            pr_files[name]._write_per_read_block(
                                block, lookup, chrm, strand, start)
                    if verbose:
                        print("  processed %s:%s:%d" % (
                            reg.chrm, reg.strand, reg.start))
            finally:
                if ppool is not None:
                    ppool.shutdown()

    for sf in stats_files.values():
        if sf.is_empty:
            raise TomboTpuError(
                "No genomic positions contain --minimum-test-reads.")
        sf.close()
    for prf in pr_files.values():
        prf.close()
    return stats_fn


def _alt_stats_fn(base_fn: str, alt_name: str) -> str:
    """Reference naming: `basename.alt_name.tombo.stats` style
    (reference: tombo/tombo_stats.py:4655-4662)."""
    if base_fn.endswith(".tombo.stats"):
        return base_fn[:-len(".tombo.stats")] + "." + alt_name + \
            ".tombo.stats"
    if base_fn.endswith(".tombo.per_read_stats"):
        return base_fn[:-len(".tombo.per_read_stats")] + "." + alt_name + \
            ".tombo.per_read_stats"
    return base_fn + "." + alt_name
