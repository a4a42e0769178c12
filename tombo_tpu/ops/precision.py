"""Bitwise-reproducible accumulation primitives.

XLA lowers ``cumsum`` to a parallel (tree-shaped) association whose
float rounding differs from numpy's strict left-to-right accumulation by
~1 ulp.  Those ulps are invisible behaviorally but flip greedy-selection
ranks and DP path ties, breaking the float64 batched-vs-single bit-for-bit
parity contract (tests/test_parity_exact.py; SURVEY.md §7 "bit-for-bit
parity of the adaptive band walk").

float64 is the oracle-parity mode (CPU tests), where throughput is
irrelevant, so every device cumsum that feeds selection or DP runs through
:func:`seq_cumsum`: sequential in float64 (identical op order to
``np.cumsum``), the fast parallel XLA cumsum otherwise.  The float32 TPU
production lane keeps the documented co-optimal-tie policy
(tests/test_batch_parity.py asserts frac_eq > 0.99).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def seq_cumsum(x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Cumulative sum along ``axis``; bitwise-equal to ``np.cumsum`` for
    float64 inputs (sequential left-to-right adds), XLA-parallel otherwise.
    """
    if x.dtype != jnp.float64:
        return jnp.cumsum(x, axis=axis)
    x_m = jnp.moveaxis(x, axis, 0)

    def step(c, v):
        c = c + v
        return c, c

    _, out = lax.scan(step, jnp.zeros(x_m.shape[1:], x.dtype), x_m)
    return jnp.moveaxis(out, 0, axis)
