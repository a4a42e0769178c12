"""tombo_tpu: TPU-native nanopore raw-signal analysis engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
reference Tombo suite (resquiggle, modified-base detection, model estimation,
text output, plotting) designed TPU-first: batched banded dynamic programming
on device, data-parallel read sharding over a ``jax.sharding.Mesh``, and
host-side HDF5/FAST5 I/O mirroring the reference's on-disk formats.
"""
from ._version import TOMBO_TPU_VERSION as __version__
from .errors import TomboTpuError
