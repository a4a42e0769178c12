"""tombo_tpu: TPU-native nanopore raw-signal analysis engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
reference Tombo suite (resquiggle, modified-base detection, model estimation,
text output, plotting) designed TPU-first: batched banded dynamic programming
on device, data-parallel read sharding over a ``jax.sharding.Mesh``, and
host-side HDF5/FAST5 I/O mirroring the reference's on-disk formats.
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
