"""Modified-base detection statistics engine.

TPU-first reimplementation of the reference's per-site statistical testing
(reference: tombo/tombo_stats.py:2252-4777): per-read model tests (de novo,
sample-compare, alternative-model scaled LLR), group level tests (KS/U/T),
per-site fraction aggregation, and the ModelStats / LevelStats /
PerReadStats HDF5 file formats (bit-compatible with the reference so its
plotting/output tooling can read them).
"""
from .files import ModelStats, LevelStats, PerReadStats  # noqa: F401
from .detect import (  # noqa: F401
    TestParams, test_significance, compute_reg_stats,
    compute_group_reg_stats)
from .aggregate import aggregate_per_read_stats  # noqa: F401
