"""Multi-device sharding of the production stages (8 virtual CPU devs)."""
import jax
import numpy as np

from tombo_tpu.parallel import mesh as pmesh


def test_dryrun_8_devices():
    assert len(jax.devices()) >= 8
    pmesh.dryrun(8)


def test_sharded_production_step_places_batches():
    mesh = pmesh.make_mesh(jax.devices()[:8])
    pmesh.sharded_production_step(mesh, n_reads_per_device=2)
