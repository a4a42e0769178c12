"""Ground-truth accuracy statistics + ROC/precision-recall plotting.

Behavioral port of the reference's accuracy machinery
(reference: tombo/tombo_stats.py:2377-2533 and
tombo/_plot_commands.py:60-450) rendered with matplotlib.
"""
from __future__ import annotations

import io
import sys
from collections import defaultdict
from typing import Dict, Optional, Tuple

import numpy as np

from .. import config
from ..errors import TomboTpuError
from ..seq import rev_comp

ROC_PLOT_POINTS = config.ROC_PLOT_POINTS


def parse_locs_file(locs_fn: str) -> Dict[Tuple[str, str], np.ndarray]:
    """Parse a BED file of per-site locations into (chrm, strand) -> sorted
    position arrays (reference: tombo/tombo_helper.py:729-753)."""
    raw_locs = defaultdict(list)
    with io.open(locs_fn) as fp:
        for line in fp:
            fields = line.rstrip().split("\t")
            if len(fields) < 6:
                raise TomboTpuError(
                    "Loci BED records must contain 6 fields: " + locs_fn)
            chrm, pos, strand = fields[0], int(fields[1]), fields[5]
            raw_locs[(chrm, strand)].append(pos)
    return dict((cs, np.array(sorted(poss)))
                for cs, poss in raw_locs.items())


def compute_accuracy_rates(stat_has_mod,
                           num_plot_points=ROC_PLOT_POINTS):
    """(reference: tombo/tombo_stats.py:2384-2404)."""
    stat_has_mod = np.asarray(stat_has_mod, np.float64)
    tp_cumsum = np.cumsum(stat_has_mod)
    tp_rate = tp_cumsum / tp_cumsum[-1]
    fp_cumsum = np.cumsum(np.logical_not(stat_has_mod))
    fp_rate = fp_cumsum / fp_cumsum[-1]
    precision = tp_cumsum / np.arange(1, len(stat_has_mod) + 1,
                                      dtype=float)
    tp_rate = tp_rate[np.linspace(
        0, tp_rate.shape[0] - 1, num_plot_points).astype(np.int64)]
    fp_rate = fp_rate[np.linspace(
        0, fp_rate.shape[0] - 1, num_plot_points).astype(np.int64)]
    precision = precision[np.linspace(
        0, precision.shape[0] - 1,
        num_plot_points + 1).astype(np.int64)][1:]
    return tp_rate, fp_rate, precision


def compute_auc(tp_rate, fp_rate):
    """(reference: tombo/tombo_stats.py:2377-2378)."""
    return np.sum(tp_rate[:-1] * (fp_rate[1:] - fp_rate[:-1]))


def compute_mean_avg_precision(tp_rate, precision):
    """(reference: tombo/tombo_stats.py:2380-2382)."""
    return np.sum(np.diff(np.concatenate([[0], tp_rate, [1]])) *
                  np.concatenate([[0], precision, [1]])[:-1])


def compute_motif_stats(stats, motif_descs, fasta, stats_per_block=None,
                        total_stats_limit=None,
                        rng: Optional[np.random.Generator] = None):
    """Per-site (stat, is-motif-match) pairs
    (reference: tombo/tombo_stats.py:2406-2456)."""
    all_motif_stats = {mod_name: [] for _, mod_name in motif_descs}
    before_bases = max(m.mod_pos for m, _ in motif_descs) - 1
    after_bases = max(m.motif_len - m.mod_pos for m, _ in motif_descs)
    total = 0
    if rng is None:
        rng = np.random.default_rng(0)
    for chrm, strand, start, end, block_stats in stats:
        if strand == "+":
            seq_start = max(start - before_bases, 0)
            seq_end = end + after_bases
        else:
            seq_start = max(start - after_bases, 0)
            seq_end = end + before_bases
        reg_seq = fasta.get_seq(chrm, seq_start, seq_end, error_end=False)
        if stats_per_block is not None and \
                block_stats.shape[0] > stats_per_block:
            block_stats = block_stats[rng.choice(
                block_stats.shape[0], stats_per_block, replace=False)]
        total += block_stats.shape[0]
        for r_pos_stat in block_stats:
            pos = int(r_pos_stat["pos"])
            if strand == "+":
                r_pos_seq = reg_seq[pos - seq_start - before_bases:
                                    pos - seq_start + after_bases + 1]
            else:
                r_pos_seq = rev_comp(
                    reg_seq[pos - seq_start - after_bases:
                            pos - seq_start + before_bases + 1])
            if len(r_pos_seq) < before_bases + after_bases + 1:
                continue
            for motif, mod_name in motif_descs:
                if r_pos_seq[before_bases] != motif.mod_base:
                    continue
                all_motif_stats[mod_name].append((
                    r_pos_stat[stats.stat_slot
                               if hasattr(stats, "stat_slot")
                               else "stat"],
                    bool(motif.motif_pat.match(
                        r_pos_seq[before_bases - motif.mod_pos + 1:]))))
        if total_stats_limit is not None and total >= total_stats_limit:
            break
    return all_motif_stats


def compute_ctrl_motif_stats(stats, ctrl_stats, motif_descs, fasta,
                             stats_per_block=None, total_stats_limit=None):
    """(stat, is-native) pairs at motif sites: native-sample statistics
    labeled True against control-sample statistics at the same motif
    positions labeled False
    (reference: tombo/tombo_stats.py:2485-2533
    ``_compute_ctrl_motif_stats``)."""
    all_motif_stats = {mod_name: [] for _, mod_name in motif_descs}
    before_bases = max(m.mod_pos for m, _ in motif_descs) - 1
    after_bases = max(m.motif_len - m.mod_pos for m, _ in motif_descs)
    total = 0
    for chrm, strand, start, end, block_stats in stats:
        if strand == "+":
            seq_start = max(start - before_bases, 0)
            seq_end = end + after_bases
        else:
            seq_start = max(start - after_bases, 0)
            seq_end = end + before_bases
        reg_seq = fasta.get_seq(chrm, seq_start, seq_end, error_end=False)
        ctrl_block_stats = ctrl_stats.get_reg_stats(chrm, strand, start,
                                                    end)
        slot = stats.stat_slot if hasattr(stats, "stat_slot") else "stat"
        ctrl_slot = (ctrl_stats.stat_slot
                     if hasattr(ctrl_stats, "stat_slot") else slot)
        for motif, mod_name in motif_descs:
            if strand == "+":
                mod_poss = np.array(
                    [m.start() + motif.mod_pos - 1
                     for m in motif.motif_pat.finditer(reg_seq)],
                    dtype=np.int64) + seq_start
            else:
                mod_poss = np.array(
                    [m.start() + motif.motif_len - motif.mod_pos
                     for m in motif.rev_comp_pat.finditer(reg_seq)],
                    dtype=np.int64) + seq_start
            for r_pos_stat in block_stats[
                    np.isin(block_stats["pos"], mod_poss)]:
                all_motif_stats[mod_name].append(
                    (r_pos_stat[slot], True))
                total += 1
            if ctrl_block_stats is not None:
                for r_pos_stat in ctrl_block_stats[
                        np.isin(ctrl_block_stats["pos"], mod_poss)]:
                    all_motif_stats[mod_name].append(
                        (r_pos_stat[ctrl_slot], False))
                    total += 1
        if total_stats_limit is not None and total >= total_stats_limit:
            break
    return all_motif_stats


def compute_ground_truth_stats(stats, ground_truth_locs):
    """(reference: tombo/tombo_stats.py:2458-2483)."""
    mod_locs, unmod_locs, mod_name = ground_truth_locs
    all_stats = []
    for chrm, strand, start, end, block_stats in stats:
        cs_mod = mod_locs.get((chrm, strand), np.array([]))
        cs_unmod = unmod_locs.get((chrm, strand), np.array([]))
        b_mod = cs_mod[(cs_mod >= start) & (cs_mod < end)]
        b_unmod = cs_unmod[(cs_unmod >= start) & (cs_unmod < end)]
        valid = block_stats[np.isin(
            block_stats["pos"], np.concatenate([b_mod, b_unmod]))]
        slot = stats.stat_slot if hasattr(stats, "stat_slot") else "stat"
        all_stats.extend(zip(valid[slot],
                             np.isin(valid["pos"], b_mod)))
    return {mod_name: all_stats}


def _iter_per_read_blocks_as_stats(pr_stats):
    for chrm, strand, start, end_unused, block_stats, _lookup in (
            (c, s, st, st + pr_stats.region_size, bs, lk)
            for c, s, st, bs, lk in pr_stats.iter_per_read_blocks()):
        yield chrm, strand, start, start + pr_stats.region_size, block_stats


class _PerReadStatsIterAdapter:
    """Adapter so per-read stats files feed the same motif machinery."""

    stat_slot = "stat"

    def __init__(self, pr_stats, transform_pvals: bool):
        self.pr = pr_stats
        self.transform = transform_pvals

    def __iter__(self):
        for chrm, strand, start, bs, _ in self.pr.iter_per_read_blocks():
            if self.transform:
                bs = bs.copy()
                with np.errstate(divide="ignore"):
                    bs["stat"] = -np.log10(np.maximum(bs["stat"], 1e-50))
            yield (chrm, strand, start, start + self.pr.region_size, bs)

    def get_reg_stats(self, chrm, strand, start, end):
        """Interval records with the same (pos, stat) fields as a stats
        block, so the control-ROC machinery works per-read too."""
        bs = self.pr.get_region_per_read_stats(chrm, strand, start, end)
        if bs is None or not self.transform:
            return bs
        bs = bs.copy()
        with np.errstate(divide="ignore"):
            bs["stat"] = -np.log10(np.maximum(
                bs["stat"].astype(np.float64), 1e-50))
        return bs


def prep_accuracy_rates(all_motif_stats, verbose=True):
    """(reference: tombo/_plot_commands.py:60-82)."""
    curves = {}
    for mod_name, mod_stats in all_motif_stats.items():
        if not mod_stats:
            continue
        ordered_tf = list(zip(*sorted(mod_stats)))[1]
        tp, fp, prec = compute_accuracy_rates(ordered_tf)
        auc = compute_auc(tp, fp)
        mean_ap = compute_mean_avg_precision(tp, prec)
        if verbose:
            sys.stderr.write("      %-30s AUC %.4f  mean AP %.4f\n" %
                             (mod_name, auc, mean_ap))
        curves[mod_name] = (tp, fp, prec, auc)
    if not curves:
        raise TomboTpuError(
            "No provided statistics contain any valid sites overlapping "
            "ground truth data.")
    return curves


def plot_roc_curves(curves, pdf_fn):
    """Render ROC + precision-recall panels to a PDF
    (replaces reference R_scripts/plotROC.R)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax_roc, ax_pr) = plt.subplots(1, 2, figsize=(10, 4))
    for mod_name, (tp, fp, prec, auc) in curves.items():
        ax_roc.plot(fp, tp, label="%s (AUC %.3f)" % (mod_name, auc))
        ax_pr.plot(tp, prec, label=mod_name)
    ax_roc.plot([0, 1], [0, 1], "k--", lw=0.5)
    ax_roc.set_xlabel("False positive rate")
    ax_roc.set_ylabel("True positive rate")
    ax_roc.set_title("ROC")
    ax_roc.legend(fontsize=7)
    ax_pr.set_xlabel("Recall")
    ax_pr.set_ylabel("Precision")
    ax_pr.set_title("Precision-Recall")
    fig.tight_layout()
    fig.savefig(pdf_fn)
    plt.close(fig)
