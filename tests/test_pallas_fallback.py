"""Pallas-failure resilience: a kernel that cannot lower or execute on
the active backend must not kill the batch — the adaptive-DP stage falls
back to the XLA scan engine (permanently for the process) and produces
the same results.  Protects production runs and bench.py from Mosaic
rejections of new kernel layouts."""
import numpy as np
import jax.numpy as jnp
import pytest

from tombo_tpu import config
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline import batch as pb
from tombo_tpu.pipeline import resquiggle as rsq
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.batch import BatchedResquiggler
from tombo_tpu.testing import random_reference, simulate_read
from tombo_tpu.types import SeqSampleType, SequenceData


def _reads(n, seed=3):
    rng = np.random.default_rng(seed)
    model = KmerModel.load_default("DNA")
    fasta = random_reference(np.random.default_rng(seed + 1), 30000)
    aligner = ExactAligner(fasta)
    sst = SeqSampleType("DNA", False)
    params = config.load_resquiggle_parameters("DNA")
    mrs = []
    for i in range(n):
        # long enough that reads take the adaptive-DP lane, not the
        # short-read static fallback
        read = simulate_read(rng, fasta, model, read_id="fb_%02d" % i,
                             read_len=1600)
        mr = rsq.map_read(SequenceData(read.seq, read.read_id, 12.0),
                          aligner, model, sst)
        mrs.append(rsq.adjust_map_res(
            mr.replace(raw_signal=read.raw_signal), sst, params))
    return model, params, sst, mrs


def test_pallas_failure_falls_back_to_scan(monkeypatch):
    model, params, sst, mrs = _reads(6)

    # clean scan-engine reference results
    br0 = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                             dtype=jnp.float32)
    ref_out = br0.resquiggle_batch(mrs)

    # force the adaptive-DP stage onto the Pallas lane and make the
    # kernel dispatch blow up the way a Mosaic rejection would
    from tombo_tpu.ops import pallas_dp as pdp
    monkeypatch.setattr(pb, "_PALLAS_BROKEN", [False])
    monkeypatch.setattr(pb, "_use_pallas", lambda: True)
    monkeypatch.setattr(BatchedResquiggler, "_pallas_in_jit",
                        lambda self: False)

    def boom(*a, **kw):
        raise RuntimeError("synthetic Mosaic lowering failure")

    monkeypatch.setattr(pdp, "plan_dp_layout", boom)

    br = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                            dtype=jnp.float32)
    out = br.resquiggle_batch(mrs)
    assert pb._PALLAS_BROKEN[0], "fallback flag not set"
    for (res, err), (res0, err0) in zip(out, ref_out):
        assert (res is None) == (res0 is None)
        if res is not None:
            np.testing.assert_array_equal(res.segs, res0.segs)

    # the flag is sticky: a second batch goes straight to the scan engine
    out2 = br.resquiggle_batch(mrs[:2])
    assert sum(1 for r, e in out2 if r is not None) >= 1


def test_tombo_errors_are_not_swallowed(monkeypatch):
    """Per-read TomboTpuError taxonomy must pass through the fallback
    wrapper untouched (only infrastructure failures trigger it)."""
    model, params, sst, mrs = _reads(2, seed=9)
    monkeypatch.setattr(pb, "_PALLAS_BROKEN", [False])
    br = BatchedResquiggler(model, params, sst, config.OUTLIER_THRESH,
                            dtype=jnp.float32)

    from tombo_tpu.errors import TomboTpuError

    def raise_tombo(*a, **kw):
        raise TomboTpuError("real per-read failure")

    monkeypatch.setattr(BatchedResquiggler, "_dp_and_finalize", raise_tombo)
    with pytest.raises(TomboTpuError):
        br.resquiggle_batch(mrs)
    assert not pb._PALLAS_BROKEN[0]
