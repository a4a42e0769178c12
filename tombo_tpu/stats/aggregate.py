"""Re-aggregate per-read statistics into a per-site ModelStats file.

Behavioral equivalent of the reference's aggregation command
(reference: tombo/tombo_stats.py:4664-4777 ``aggregate_per_read_stats``):
each per-read block is sorted by position, split per site, thresholded
and written as a fraction block — enabling new thresholds without
re-testing.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .. import config
from ..errors import TomboTpuError
from .detect import apply_per_read_thresh
from .files import ModelStats, PerReadStats
from ..types import RegionStats


def aggregate_per_read_stats(
        per_read_stats_fn: str, stats_fn: str,
        single_read_thresh: float, lower_thresh: Optional[float],
        cov_damp_counts: Tuple[float, float] = config.COV_DAMP_COUNTS,
        min_test_reads: int = 1, num_most_signif: int = 100000) -> str:
    pr_stats = PerReadStats(per_read_stats_fn)
    out = ModelStats(
        stats_fn, stat_type=pr_stats.stat_type,
        region_size=pr_stats.region_size, cov_damp_counts=cov_damp_counts,
        cov_thresh=min_test_reads, num_most_signif=num_most_signif)
    for chrm, strand, start, block_stats, _lookup in \
            pr_stats.iter_per_read_blocks():
        block_stats = np.sort(block_stats, order="pos")
        reg_poss = block_stats["pos"]
        us_reg_poss = np.unique(reg_poss)
        reg_base_stats = np.split(
            block_stats["stat"],
            np.where(np.concatenate([[0], np.diff(reg_poss)]) > 0)[0])
        frac_std, reg_cov, ctrl_cov, valid_cov = apply_per_read_thresh(
            reg_base_stats, single_read_thresh, lower_thresh,
            pr_stats.stat_type, reg_poss)
        out._write_stat_block(RegionStats(
            frac_std, us_reg_poss, chrm, strand, start,
            reg_cov, np.asarray(ctrl_cov), valid_cov))
    out.close()
    pr_stats.close()
    if out.is_empty:
        raise TomboTpuError(
            "No genomic positions contain --minimum-test-reads.")
    return stats_fn
