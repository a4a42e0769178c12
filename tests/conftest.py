"""Test harness configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding is validated on
a host-device mesh, per the project testing strategy) and float64 enabled so
device kernels can be compared against the float64 numpy oracles.

Note: jax may already be imported by pytest plugins before this conftest
runs, so the platform must be forced via ``jax.config`` (env vars would be
ignored) — otherwise tests silently run on the tunneled TPU chip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: JAX CPU compiles are slow in this
# environment; caching makes repeated test runs fast.  Shares the package
# default repo-local dir (survives /tmp cleanup).
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", (
    "tests must run on CPU, got " + jax.default_backend())
