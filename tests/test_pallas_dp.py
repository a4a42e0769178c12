"""Pallas fused DP+traceback vs the scan engine (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from tombo_tpu.ops import dp as dpo
from tombo_tpu.ops import pallas_dp as pdp


def _mk_case(seed, B=8, L_max=128, P_max=64, bw=32, E_max=512):
    rng = np.random.default_rng(seed)
    p = dpo.DpParams(z_shift=2.0, skip_pen=4.2, stay_pen=4.2,
                     mask_fill_z_score=-15.0, max_half_z_score=20.0,
                     bandwidth=bw)
    em = rng.normal(0, 1, (B, E_max)).astype(np.float32)
    n_events = rng.integers(300, E_max, B)
    seq_lens = rng.integers(60, L_max, B)
    rm = rng.normal(0, 1, (B, L_max)).astype(np.float32)
    rs = np.abs(rng.normal(1, 0.1, (B, L_max))).astype(np.float32)
    P_rows = rng.integers(8, P_max, B)
    pstarts = np.zeros((B, P_max), np.int64)
    pend = np.full((B, P_max), 2 ** 31 - 1, np.int64)
    pvalid = rng.integers(0, 4, B)
    for i in range(B):
        st = np.cumsum(rng.integers(0, 3, P_rows[i])) - 4
        pstarts[i, :P_rows[i]] = st
        pstarts[i, P_rows[i]:] = st[-1]
        pend[i, :P_rows[i]] = st + bw + rng.integers(-3, 3, P_rows[i])
    args = (jnp.asarray(em), jnp.asarray(n_events), jnp.asarray(rm),
            jnp.asarray(rs), jnp.asarray(seq_lens), jnp.asarray(pstarts),
            jnp.asarray(pvalid), jnp.asarray(np.clip(pend, 0, 2 ** 31 - 1)),
            jnp.asarray(P_rows))
    return p, args, seq_lens


import pytest


@pytest.mark.parametrize("variant", ["loop", "gather", "shift"])
def test_pallas_matches_scan_engine(variant):
    """All three window-gather variants (sequential per-read slices,
    lane-wise dynamic gather, vectorized barrel shifter) are bit-identical
    to the scan engine — they differ only in how data moves."""
    p, args, seq_lens = _mk_case(3)
    B, L_max, P_max, bw = 8, 128, 64, 32

    tb, band_starts, final_fwd, band_err = dpo.adaptive_banded_dp(
        *args, p, L_max, P_max)
    top = jnp.argmax(final_fwd, axis=1).astype(jnp.int32)
    segs_s, bound_err_s = dpo.banded_traceback(
        tb, band_starts, args[4], top, 10, bw, L_max)

    segs_p, band_err_p, bound_err_p, ffwd = pdp.adaptive_banded_dp_tb(
        *args, p, L_max, P_max, 10, block_reads=4, interpret=True,
        variant=variant)

    np.testing.assert_array_equal(np.asarray(band_err),
                                  np.asarray(band_err_p))
    np.testing.assert_array_equal(np.asarray(bound_err_s),
                                  np.asarray(bound_err_p))
    segs_s, segs_p = np.asarray(segs_s), np.asarray(segs_p)
    for i in range(B):
        n = seq_lens[i] + 1
        np.testing.assert_array_equal(segs_s[i, :n], segs_p[i, :n], str(i))
    np.testing.assert_allclose(np.asarray(final_fwd),
                               np.asarray(ffwd)[:, :bw], atol=1e-4)


def test_pallas_chunked_matches_scan_engine():
    """Seq-axis-chunked kernels (long-read path: carried band state across
    grid steps, int8 move codes in HBM) match the scan engine."""
    p, args, seq_lens = _mk_case(5)
    B, L_max, P_max, bw = 8, 128, 64, 32

    tb, band_starts, final_fwd, band_err = dpo.adaptive_banded_dp(
        *args, p, L_max, P_max)
    top = jnp.argmax(final_fwd, axis=1).astype(jnp.int32)
    segs_s, bound_err_s = dpo.banded_traceback(
        tb, band_starts, args[4], top, 10, bw, L_max)

    for (R, Lc), variant in (((4, 32), "loop"), ((8, 64), "loop"),
                             ((8, 64), "gather"), ((8, 64), "shift")):
        segs_p, band_err_p, bound_err_p, ffwd = \
            pdp.adaptive_banded_dp_tb_chunked(
                *args, p, L_max, P_max, 10, block_reads=R, chunk_rows=Lc,
                interpret=True, variant=variant)
        np.testing.assert_array_equal(np.asarray(band_err),
                                      np.asarray(band_err_p))
        np.testing.assert_array_equal(np.asarray(bound_err_s),
                                      np.asarray(bound_err_p))
        segs_s_np, segs_p_np = np.asarray(segs_s), np.asarray(segs_p)
        for i in range(B):
            n = seq_lens[i] + 1
            np.testing.assert_array_equal(
                segs_s_np[i, :n], segs_p_np[i, :n], "%d/%d/%d" % (R, Lc, i))
        np.testing.assert_allclose(np.asarray(final_fwd),
                                   np.asarray(ffwd)[:, :bw],
                                   rtol=1e-5, atol=1e-3)


def test_shift_rows_random_offsets():
    """The two-level barrel shifter extracts exact per-row windows for
    random offsets at production widths (bwp=512-lane windows from a
    2048-lane array), including offsets crossing 128-lane boundaries."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tombo_tpu.ops.pallas_dp import _shift_rows

    R, W, out_w = 8, 2048, 512
    rng = np.random.default_rng(11)
    full = rng.normal(0, 1, (R, W)).astype(np.float32)
    # includes 0, sub-128, exact multiples of 128, and the max legal shift
    shifts = np.array([0, 1, 127, 128, 129, 777, 1000,
                       W - out_w - 128], np.int32).reshape(R, 1)

    def kernel(full_ref, shift_ref, out_ref):
        out_ref[:, :] = _shift_rows(full_ref[:, :], shift_ref[:, :],
                                    out_w)[:, :out_w]

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, out_w), jnp.float32),
        interpret=True,
    )(jnp.asarray(full), jnp.asarray(shifts))
    out = np.asarray(out)
    for i in range(R):
        np.testing.assert_array_equal(
            out[i], full[i, shifts[i, 0]:shifts[i, 0] + out_w], str(i))


def test_plan_dp_layout_never_over_budget():
    """No (L, bandwidth) combination yields a fused layout whose move
    scratch exceeds the VMEM budget (the round-1 failure mode: r_blk
    bottomed at 1 and called anyway); long-read/save-bandwidth shapes
    route to the chunked kernels."""
    budget = 12 * 2 ** 20
    for bw in (300, 500, 1500):
        bwp = ((bw + 127) // 128) * 128
        for L in (256, 1024, 4096, 32768, 131072):
            E = L * 8
            layout = pdp.plan_dp_layout(8, L, E, bw, budget)
            if layout[0] == "fused":
                r = layout[1]
                # move codes are 2-bit packed (16 rows per int32 word)
                assert r * ((L + 15) // 16) * bwp * 4 <= budget, (
                    bw, L, layout)
            else:
                _, R, Lc = layout
                assert L % Lc == 0 and Lc >= 128, (bw, L, layout)
                # chunked VMEM is independent of L
                assert R * Lc * bwp * 5 <= budget, (bw, L, layout)
    # the ADVICE scenario: 30 kb read at save bandwidth 1500
    layout = pdp.plan_dp_layout(8, 32768, 32768 * 8, 1500, budget)
    assert layout[0] == "chunked"


def test_pallas_small_block_subbatch():
    """R < 8 blocks (long-read VMEM fallback) run one whole-array call
    per sub-batch and still match the scan engine."""
    p, args, seq_lens = _mk_case(9)
    B, L_max, P_max, bw = 8, 128, 64, 32
    tb, band_starts, final_fwd, band_err = dpo.adaptive_banded_dp(
        *args, p, L_max, P_max)
    top = jnp.argmax(final_fwd, axis=1).astype(jnp.int32)
    segs_s, _ = dpo.banded_traceback(
        tb, band_starts, args[4], top, 10, bw, L_max)
    segs_p, band_err_p, _, _ = pdp.adaptive_banded_dp_tb(
        *args, p, L_max, P_max, 10, block_reads=2, interpret=True)
    segs_s, segs_p = np.asarray(segs_s), np.asarray(segs_p)
    for i in range(B):
        n = seq_lens[i] + 1
        np.testing.assert_array_equal(segs_s[i, :n], segs_p[i, :n], str(i))


@pytest.mark.parametrize("variant", ["loop", "shift"])
def test_pallas_untiled_rows(variant):
    """L not a multiple of 128 routes the fused kernel through the
    untiled column-access paths (the tiled staging requires L % 128 == 0);
    results must stay bit-identical to the scan engine."""
    p, args, seq_lens = _mk_case(11, L_max=96, E_max=384)
    B, L_max, P_max, bw = 8, 96, 64, 32
    tb, band_starts, final_fwd, band_err = dpo.adaptive_banded_dp(
        *args, p, L_max, P_max)
    top = jnp.argmax(final_fwd, axis=1).astype(jnp.int32)
    segs_s, _ = dpo.banded_traceback(
        tb, band_starts, args[4], top, 10, bw, L_max)
    segs_p, band_err_p, _, _ = pdp.adaptive_banded_dp_tb(
        *args, p, L_max, P_max, 10, block_reads=4, interpret=True,
        variant=variant)
    np.testing.assert_array_equal(np.asarray(band_err),
                                  np.asarray(band_err_p))
    segs_s, segs_p = np.asarray(segs_s), np.asarray(segs_p)
    for i in range(B):
        n = seq_lens[i] + 1
        np.testing.assert_array_equal(segs_s[i, :n], segs_p[i, :n], str(i))
