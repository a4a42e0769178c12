"""Device-side greedy changepoint selection.

The reference picks changepoints greedily in descending score order with a
min-spacing blacklist (reference: tombo/_c_helper.pyx:89-121
``c_valid_cpts_w_cap``; host port: csrc/tombo_native.cpp ``greedy_cpts``).
That loop is sequential, but its *result* is exactly the greedy maximal
independent set of the candidate conflict graph (two candidates conflict
iff |pos_a - pos_b| < min_base_obs), which a parallel "local winner"
iteration computes in a handful of rounds:

  round: every undecided candidate whose rank (dense order by score desc,
  index desc — matching the C++ stable sort) beats all undecided
  candidates within min_base_obs-1 positions is accepted; everything
  within min_base_obs-1 of an accepted candidate is knocked out.

Every candidate accepted this way is accepted by the sequential greedy
(no better-ranked conflicting candidate can exist once its neighborhood
is clear), and each round accepts at least the best-ranked undecided
candidate, so the loop terminates with the identical set.  The capped
variant is then the ``num_cpts`` best-ranked members of that set —
capping only truncates the (descending-rank) acceptance sequence.

Scores stay on device: selection consumes the score matrix produced by
ops/segment.py directly, so the (B, signal_len) scores never cross the
host link — only the (B, max_cpts) positions do.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_BIG_I = jnp.int32(2 ** 30)


def _dense_rank_desc(scores: jnp.ndarray) -> jnp.ndarray:
    """Rank candidates by (score desc, index desc); 0 = best.

    Matches the C++ comparator (csrc/tombo_native.cpp greedy_cpts):
    stable sort by score descending with higher index first on ties."""
    B, S = scores.shape
    neg_idx = jnp.broadcast_to(-jnp.arange(S, dtype=jnp.int32)[None, :],
                               (B, S))
    # lexsort: last key is primary -> ascending (-score, -idx)
    order = jnp.lexsort((neg_idx, -scores), axis=1)
    # rank = inverse permutation of order
    return jnp.argsort(order, axis=1).astype(jnp.int32)


def _window_min(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Min over [c-radius, c+radius] per position (edges clipped)."""
    out = x
    for d in range(1, radius + 1):
        left = jnp.pad(x[:, d:], ((0, 0), (0, d)), constant_values=_BIG_I)
        right = jnp.pad(x[:, :-d], ((0, 0), (d, 0)), constant_values=_BIG_I)
        out = jnp.minimum(out, jnp.minimum(left, right))
    return out


def _dilate(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Binary dilation by ``radius`` along the candidate axis."""
    out = mask
    for d in range(1, radius + 1):
        left = jnp.pad(mask[:, d:], ((0, 0), (0, d)))
        right = jnp.pad(mask[:, :-d], ((0, 0), (d, 0)))
        out = out | left | right
    return out


@functools.partial(jax.jit, static_argnames=("min_base_obs", "shift",
                                             "max_cpts"))
def greedy_cpts_device(scores: jnp.ndarray,      # (B, S) f32, padding < min
                       n_cands: jnp.ndarray,     # (B,)
                       num_cpts: jnp.ndarray,    # (B,)
                       min_base_obs: int, shift: int, max_cpts: int,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched capped greedy selection on device.

    Returns (cpts (B, max_cpts) int32, status (B,) int32): per read the
    selected candidate positions + ``shift``, sorted ascending (matching
    csrc greedy_cpts_batch), zero-padded past ``num_cpts``; status 1 if
    fewer than ``num_cpts`` spaced candidates exist."""
    B, S = scores.shape
    radius = min_base_obs - 1
    idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (B, S))
    valid = idx < n_cands[:, None].astype(jnp.int32)

    ranks = _dense_rank_desc(jnp.where(valid, scores, -jnp.inf))

    def cond(state):
        _, undecided = state
        return jnp.any(undecided)

    def body(state):
        accepted, undecided = state
        r = jnp.where(undecided, ranks, _BIG_I)
        wmin = _window_min(r, radius)
        winner = undecided & (r == wmin) & (r < _BIG_I)
        accepted = accepted | winner
        knocked = _dilate(accepted, radius)
        undecided = undecided & ~knocked
        return accepted, undecided

    accepted, _ = lax.while_loop(
        cond, body, (jnp.zeros((B, S), jnp.bool_), valid))

    n_sel = jnp.sum(accepted, axis=1).astype(jnp.int32)
    k = jnp.minimum(num_cpts.astype(jnp.int32), jnp.int32(max_cpts))
    status = (n_sel < k).astype(jnp.int32)

    # keep the num_cpts best-ranked accepted candidates
    sel_rank = jnp.where(accepted, ranks, _BIG_I)
    rank_sorted = jnp.sort(sel_rank, axis=1)
    kth = jnp.take_along_axis(
        rank_sorted, jnp.maximum(k - 1, 0)[:, None], axis=1)
    final = accepted & (sel_rank <= kth) & (k > 0)[:, None]

    # emit positions ascending: sort (pos if selected else BIG)
    pos_key = jnp.where(final, idx, _BIG_I)
    pos_sorted = jnp.sort(pos_key, axis=1)[:, :max_cpts]
    in_k = jnp.arange(max_cpts, dtype=jnp.int32)[None, :] < k[:, None]
    cpts = jnp.where(in_k, pos_sorted + shift, 0)
    return cpts, status
