"""tombo_tpu: TPU-native nanopore raw-signal analysis engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
reference Tombo suite (resquiggle, modified-base detection, model estimation,
text output, plotting) designed TPU-first: batched banded dynamic programming
on device, data-parallel read sharding over a ``jax.sharding.Mesh``, and
host-side HDF5/FAST5 I/O mirroring the reference's on-disk formats.

Python API examples (mirroring reference: tombo/__init__.py:1-83):

Extract per-read base levels over a region::

    from tombo_tpu.io.index import ReadsIndex
    from tombo_tpu.stats.region import RegionData

    reads_index = ReadsIndex(['path/to/fast5s'])
    reg = RegionData('chr20', '+', 10000, 10100).add_reads(reads_index)
    reg_base_levels = reg.get_base_levels()

Extract per-read testing results::

    from tombo_tpu.stats import PerReadStats

    prs = PerReadStats('sample.tombo.per_read_stats')
    reg_stats = prs.get_region_per_read_stats('chr20', '+', 10000, 10100)

Run the re-squiggle algorithm on one read::

    from tombo_tpu import config
    from tombo_tpu.io.fasta import Fasta
    from tombo_tpu.io.model_io import KmerModel
    from tombo_tpu.pipeline import resquiggle
    from tombo_tpu.pipeline.aligner import open_aligner
    from tombo_tpu.types import SeqSampleType, SequenceData

    aligner = open_aligner('genome.fasta')
    std_ref = KmerModel.load_default(config.DNA_SAMP_TYPE)
    params = config.load_resquiggle_parameters(config.DNA_SAMP_TYPE)
    sst = SeqSampleType(config.DNA_SAMP_TYPE, False)
    map_res = resquiggle.map_read(
        SequenceData(seq, read_id, mean_q_score), aligner, std_ref, sst)
    map_res = map_res.replace(raw_signal=all_raw_signal)
    map_res = resquiggle.adjust_map_res(map_res, sst, params)
    rsqgl_res = resquiggle.resquiggle_read(
        map_res, std_ref, params, outlier_thresh=config.OUTLIER_THRESH,
        seq_samp_type=sst)

For whole directories prefer the batched TPU lane::

    from tombo_tpu.pipeline.runner import RunConfig, resquiggle_all_reads
    summary, index = resquiggle_all_reads(
        'path/to/fast5s', aligner, std_ref, sst, params,
        RunConfig(overwrite=True))
"""
import os as _os

from ._version import TOMBO_TPU_VERSION as __version__
from .errors import TomboTpuError


def _setup_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache.

    The banded-DP kernels are compiled per (batch, length-bucket) shape;
    first-compile on TPU backends is tens of seconds per shape, while a
    cache hit is <0.5s, so an on-disk cache shared across processes is
    load-bearing for CLI-style usage (each ``tombo-tpu`` invocation is a
    fresh process).  Opt out with TOMBO_TPU_JAX_CACHE=0; override the
    location with TOMBO_TPU_JAX_CACHE=<dir>.
    """
    loc = _os.environ.get("TOMBO_TPU_JAX_CACHE", "")
    if loc == "0":
        return
    if not loc:
        loc = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            ".jax_cache")
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", loc)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.5)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - never block import on cache setup
        pass


_setup_compilation_cache()
