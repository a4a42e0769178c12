"""Test harness configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding is validated on
a host-device mesh, per the project testing strategy) and float64 enabled so
device kernels can be compared against the float64 numpy oracles.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
