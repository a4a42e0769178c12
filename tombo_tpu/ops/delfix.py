"""Device-side raw-signal deletion fix (skipped-base resolution).

The reference resolves zero-length segments ("genomic deletions") by
running a raw-signal DP in small windows around each deletion
(reference: tombo/resquiggle.py:402-545 ``resolve_skipped_bases_with_raw``
with the compiled core in tombo/_c_dynamic_programming.pyx:34-184).  On
real nanopore dwell distributions nearly every read has at least one such
window, which previously forced every read through the host finalize lane
and made the fused device rescale fit dead code.

This module batches every window of every read in a batch into ONE
padded (NW, T) device program, so the device fit can consume
deletion-fixed segment tables and the host lane shrinks to scalar
bookkeeping.

Equivalence to the reference formulation
----------------------------------------
The reference calls ``c_reg_z_scores`` with ``max_base_shift = n_events``
(tombo/resquiggle.py:516), which makes every base's initial signal window
the whole region; the min-obs clipping scans then reduce base ``b``'s
window to exactly

    [b * min_obs,  T - (NB - 1 - b) * min_obs)

so the per-base windows are a closed-form function of (b, T, NB) and no
ragged bookkeeping is needed on device.

The forward pass keeps the reference's exact transition structure
(tombo/_c_dynamic_programming.pyx:99 ``c_base_forward_pass``):

  fwd[b][t] = z[b][t] + max(fwd[b][t-1],  diag[b][t])
  diag[b][t] = fwd[b-1][t-lag*] + sum(z[b-1][t-lag*+1 .. t-1])

where ``lag*`` is the minimal lag in 1..min_obs with
``last_diag[b-1][t-lag*] + lag* > min_obs`` (the reference's forced-stay
repair of a too-short previous base; ``lag* <= min_obs`` always, so the
search unrolls statically), the first in-window position takes the diag
unconditionally (matching the reference's unchecked first-column entry),
and positions past the previous base's window end are pure stays.  The
row recurrence ``g[t] = z[t] + max(diag[t], g[t-1])`` is solved in
closed form as ``g = Cz + cummax(diag - shift(Cz))`` with ``Cz`` the
masked prefix sum of ``z`` — one vectorized row per base instead of a
per-sample loop.  Values may differ from the sequential host oracle only
in floating-point association order.

The traceback replicates ``c_base_traceback``
(tombo/_c_dynamic_programming.pyx:165): the boundary between bases
``k-1`` and ``k`` is the LARGEST position ``t <= sig_start + 1 -
min_obs`` with ``t <= k*min_obs`` or ``fwd[k-1][t-1] > fwd[k][t-1]``;
masking fwd rows to -BIG outside their windows reproduces the
reference's ``next_end`` guard exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_NEG_F32 = -1.0e30
_NEG_F64 = -1.0e300


def _neg(dtype):
    return jnp.asarray(_NEG_F64 if dtype == jnp.float64 else _NEG_F32,
                       dtype)


def _shift_right(x: jnp.ndarray, k: int, fill) -> jnp.ndarray:
    """x[t-k] along the last axis (first k entries = fill)."""
    if k == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (k,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("min_obs", "nb_pad", "winsorize"))
def raw_windows_dp(sig, mu, sd, t_len, nb_len, max_half_z,
                   min_obs: int, nb_pad: int, winsorize: bool):
    """Batched raw-signal window DP + traceback.

    Args:
      sig:   (NW, T_pad) normalized signal windows (junk past ``t_len``).
      mu/sd: (NW, NB_pad) expected level mean/sd per base (pad sd=1).
      t_len: (NW,) int32 real sample count per window.
      nb_len:(NW,) int32 real base count per window (>= 2).
      max_half_z: winsorize limit (scalar; ignored if not winsorize).
      min_obs: static min observations per base (DNA 1, RNA 2).
      nb_pad: static NB_pad == mu.shape[1].
      winsorize: static, apply the z-score floor.

    Returns:
      bounds: (NW, NB_pad-1) int32 — boundary j between bases j and j+1
              (window-local sample index); junk past ``nb_len - 1``.
      fail:   (NW,) bool — traceback found no legal boundary (reference
              raises per window; callers fail the read).
    """
    dt = sig.dtype
    NW, T = sig.shape
    neg = _neg(dt)
    iota = jnp.arange(T, dtype=jnp.int32)[None, :]          # (1, T)
    t_len = t_len.astype(jnp.int32)[:, None]                # (NW, 1)
    nb_len = nb_len.astype(jnp.int32)[:, None]

    def z_row_dyn(b):
        mu_b = lax.dynamic_slice_in_dim(mu, b, 1, axis=1)
        sd_b = lax.dynamic_slice_in_dim(sd, b, 1, axis=1)
        z = -jnp.abs((sig - mu_b) / sd_b)
        if winsorize:
            z = jnp.maximum(z, -jnp.asarray(max_half_z, dt))
        ws = b * min_obs
        we = jnp.minimum(t_len - (nb_len - 1 - b) * min_obs, t_len)
        in_win = (iota >= ws) & (iota < we)
        zm = jnp.where(in_win, z, jnp.zeros((), dt))
        return zm, jnp.cumsum(zm, axis=1), in_win, we

    # base 0: pure stay cumsum; last_diag = min_obs everywhere
    _, cz0, in0, we0 = z_row_dyn(0)
    g0 = jnp.where(in0, cz0, neg)
    ld0 = jnp.full((NW, T), min_obs, jnp.int32)

    def fwd_step(carry, b):
        prev_g, prev_ld, prev_cz, prev_we = carry
        zb, czb, in_win, we = z_row_dyn(b)
        ws = b * min_obs
        # minimal legal lag in 1..min_obs (lag == min_obs always legal):
        # static select chain, smallest legal lag wins
        diag_g = _shift_right(prev_g, min_obs, neg)
        diag_cz = _shift_right(prev_cz, min_obs, jnp.zeros((), dt))
        for lag in range(min_obs - 1, 0, -1):
            legal = _shift_right(prev_ld, lag, jnp.int32(1 << 20)) \
                + lag > min_obs
            diag_g = jnp.where(legal, _shift_right(prev_g, lag, neg),
                               diag_g)
            diag_cz = jnp.where(
                legal, _shift_right(prev_cz, lag, jnp.zeros((), dt)),
                diag_cz)
        cz1 = _shift_right(prev_cz, 1, jnp.zeros((), dt))
        diag = diag_g + (cz1 - diag_cz)
        # first in-window position: unconditional lag-1 diag (reference
        # enters the row with prev fwd at b_start-1, no legality check)
        first = iota == ws
        diag = jnp.where(first, _shift_right(prev_g, 1, neg), diag)
        # diag legal only for ws <= t <= prev window end
        diag = jnp.where((iota >= ws) & (iota <= prev_we), diag, neg)

        # g[t] = z[t] + max(diag[t], g[t-1])  ==  Cz + cummax(diag - Cz<<1)
        czs = _shift_right(czb, 1, jnp.zeros((), dt))
        D = jnp.where(in_win, diag - czs, neg)
        cm = lax.cummax(D, axis=1)
        g = jnp.where(in_win, czb + cm, neg)
        choice = D > _shift_right(cm, 1, neg)
        last_pos = lax.cummax(
            jnp.where(choice, iota, jnp.int32(-(1 << 20))), axis=1)
        ld = iota - last_pos + 1
        return (g, ld, czb, we), g

    (_, _, _, _), g_rows = lax.scan(
        fwd_step, (g0, ld0, cz0, we0),
        jnp.arange(1, nb_pad, dtype=jnp.int32))
    G = jnp.concatenate([g0[None], g_rows], axis=0)        # (NB_pad, NW, T)

    # traceback: boundary between bases k-1 and k, for k = NB-1 .. 1
    def tb_step(carry, k):
        cur_bound, fail = carry
        curr_g = lax.dynamic_index_in_dim(G, k, axis=0, keepdims=False)
        next_g = lax.dynamic_index_in_dim(G, k - 1, axis=0,
                                          keepdims=False)
        nb1 = nb_len[:, 0]
        active = k <= nb1 - 1
        is_top = k == nb1 - 1
        sig_start = jnp.where(is_top, t_len[:, 0] - 1, cur_bound - 1)
        cg1 = _shift_right(curr_g, 1, neg)
        ng1 = _shift_right(next_g, 1, neg)
        ok = (iota <= k * min_obs) | (ng1 > cg1)
        valid = ok & (iota <= (sig_start + 1 - min_obs)[:, None])
        bound = jnp.max(jnp.where(valid, iota, jnp.int32(-1)), axis=1)
        new_fail = fail | (active & (bound < 0))
        new_bound = jnp.where(active & (bound >= 0), bound, cur_bound)
        return (new_bound, new_fail), bound

    ks = jnp.arange(nb_pad - 1, 0, -1, dtype=jnp.int32)
    (_, fail), bounds_rev = lax.scan(
        tb_step, (jnp.zeros((NW,), jnp.int32),
                  jnp.zeros((NW,), jnp.bool_)), ks)
    bounds = jnp.flip(bounds_rev, axis=0).T               # (NW, NB_pad-1)
    return bounds.astype(jnp.int32), fail
