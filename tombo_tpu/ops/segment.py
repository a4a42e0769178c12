"""Batched changepoint scoring on device.

The reference's event detection is score-then-greedy-select
(reference: tombo/_c_helper.pyx:89-202).  Scores are embarrassingly parallel
and computed here on device over padded batches; the inherently sequential
greedy spacing selection runs in the native host library
(csrc/tombo_native.cpp, see tombo_tpu/native) which consumes these scores.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .precision import seq_cumsum


@functools.partial(jax.jit, static_argnames=("running_stat_width",))
def cpt_scores_diff_batch(signal: jnp.ndarray, sig_lens: jnp.ndarray,
                          running_stat_width: int) -> jnp.ndarray:
    """DNA changepoint score |sum(left w) - sum(right w)| at every interior
    position (score part of reference: tombo/_c_helper.pyx:89-98).

    signal: (B, S) padded; returns (B, S - 2w) with positions at or past each
    read's valid candidate count set to -1 (so they sort last).
    """
    w = running_stat_width
    B, S = signal.shape
    cs = jnp.concatenate(
        [jnp.zeros((B, 1), signal.dtype), seq_cumsum(signal, axis=1)],
        axis=1)
    scores = jnp.abs(2.0 * cs[:, w:S - w + 1] - cs[:, :S - 2 * w + 1] -
                     cs[:, 2 * w:])
    # candidate boundaries run i = 0..len-2w inclusive (len-2w+1 of them),
    # matching the host scorer (ops/ref_impl.py cpt_scores_diff)
    n_cands = sig_lens - 2 * w + 1
    idx = jnp.arange(scores.shape[1])[None, :]
    return jnp.where(idx < n_cands[:, None], scores, -1.0)


@functools.partial(jax.jit, static_argnames=("running_stat_width",))
def cpt_scores_t_test_batch(signal: jnp.ndarray, sig_lens: jnp.ndarray,
                            running_stat_width: int) -> jnp.ndarray:
    """RNA t-statistic-like changepoint score (score part of reference:
    tombo/_c_helper.pyx:144-179), batched."""
    w = running_stat_width
    B, S = signal.shape
    cs = jnp.concatenate(
        [jnp.zeros((B, 1), signal.dtype), seq_cumsum(signal, axis=1)],
        axis=1)
    cs2 = jnp.concatenate(
        [jnp.zeros((B, 1), signal.dtype),
         seq_cumsum(signal * signal, axis=1)], axis=1)
    n_out = S - 2 * w

    def win(off):
        s = cs[:, off + w:off + w + n_out] - cs[:, off:off + n_out]
        s2 = cs2[:, off + w:off + w + n_out] - cs2[:, off:off + n_out]
        m = s / w
        ss = s2 - s * s / w
        return m, ss

    m1, ss1 = win(0)
    m2, ss2 = win(w)
    denom = ss1 + ss2
    t = jnp.where(denom > 0,
                  jnp.abs(m1 - m2) / jnp.sqrt(jnp.where(denom > 0, denom, 1.0)),
                  0.0)
    n_cands = sig_lens - 2 * w
    idx = jnp.arange(n_out)[None, :]
    return jnp.where(idx < n_cands[:, None], t, -1.0)
