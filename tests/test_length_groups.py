"""In-batch length grouping: one far-tail read must not pad every
read's device shapes to its bucket (pipeline/batch.py _length_groups)."""
import numpy as np

from tombo_tpu.pipeline import batch as pb


class _FakeState:
    def __init__(self, n, raw_dev=None):
        self.raw = np.zeros(n, np.float64)
        self.raw_dev = raw_dev


def test_partition_and_ratio_bound():
    rng = np.random.default_rng(3)
    lens = np.exp(rng.normal(7.9, 0.85, 256)).astype(int) + 600
    states = [_FakeState(n) for n in lens]
    groups = pb._length_groups(states)
    # exact partition
    seen = [s for g in groups for s in g]
    assert len(seen) == len(states)
    assert {id(s) for s in seen} == {id(s) for s in states}
    # all groups except possibly the last respect the ratio bound; every
    # cut group carries at least _MIN_GROUP reads
    for g in groups[:-1]:
        assert len(g) >= pb._MIN_GROUP
    for g in groups:
        lo = min(s.raw.shape[0] for s in g)
        hi = max(s.raw.shape[0] for s in g)
        # a group can exceed the ratio only while it is still below the
        # minimum size (the cut is deferred, bounding per-call overhead)
        assert hi <= lo * pb._GROUP_RATIO or len(g) <= 2 * pb._MIN_GROUP


def test_small_batches_stay_whole():
    states = [_FakeState(n) for n in (1000, 30000, 2000)]
    groups = pb._length_groups(states)
    assert len(groups) == 1 and len(groups[0]) == 3
    assert pb._length_groups([]) == []


def test_rescale_source_clustering():
    """Rescale passes cluster by the device-resident raw source so the
    in-place row-gather reuse keeps one shared matrix per group."""
    src_a, src_b = object(), object()
    states = ([_FakeState(1000, raw_dev=(src_a, i)) for i in range(40)] +
              [_FakeState(1000, raw_dev=(src_b, i)) for i in range(40)])
    groups = pb._length_groups(states)
    for g in groups:
        srcs = {id(s.raw_dev[0]) for s in g}
        assert len(srcs) == 1, "mixed raw sources within a group"
