"""Device DP kernels vs the float64 numpy oracle (ops/ref_impl.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tombo_tpu.ops import ref_impl as ri
from tombo_tpu.ops import dp as dpo


def _random_problem(rng, n_bases=40, bandwidth=32, n_events=80):
    """A static-band problem with arange-style event starts."""
    event_means = rng.normal(0, 1, n_events + n_bases)
    ref_means = rng.normal(0, 1, n_bases)
    ref_sds = np.full(n_bases, 0.35)
    z = np.empty((n_bases, bandwidth))
    for i in range(n_bases):
        z[i] = 5.0 - np.minimum(
            np.abs(event_means[i:i + bandwidth] - ref_means[i]) / ref_sds[i],
            20.0)
    starts = np.arange(n_bases, dtype=np.int64)
    return event_means, ref_means, ref_sds, z, starts


def test_process_band_row_matches_sequential():
    """The max-plus prefix-scan row update equals the sequential recurrence."""
    rng = np.random.default_rng(0)
    bw = 64
    for diff in (0, 1, 3, 17):
        prev_fwd = rng.normal(0, 5, bw)
        z = rng.normal(0, 3, bw)
        stay_pen, skip_pen = 4.2, 4.2
        if diff == 0:
            first_val, first_move = prev_fwd[0] - skip_pen, 1
        else:
            first_val, first_move = prev_fwd[diff - 1] + z[0], 2

        fwd, moves = ri.process_band_row(
            prev_fwd, z, first_val, first_move, stay_pen, skip_pen, diff)

        # sequential re-computation (direct transcription of the recurrence)
        seq_fwd = np.empty(bw)
        seq_moves = np.empty(bw, np.int8)
        seq_fwd[0], seq_moves[0] = first_val, first_move
        for p in range(1, bw):
            prev_b_pos = p + diff
            best = seq_fwd[p - 1] - stay_pen + z[p]
            mv = 0
            if prev_b_pos - 1 < bw:
                diag = prev_fwd[prev_b_pos - 1] + z[p]
                if diag > best:
                    best, mv = diag, 2
                if prev_b_pos < bw:
                    skip = prev_fwd[prev_b_pos] - skip_pen
                    if skip > best:
                        best, mv = skip, 1
            seq_fwd[p], seq_moves[p] = best, mv

        np.testing.assert_allclose(fwd, seq_fwd, rtol=1e-12, atol=1e-12)
        np.testing.assert_array_equal(moves, seq_moves)


def test_banded_forward_pass_and_traceback_roundtrip():
    rng = np.random.default_rng(1)
    em, rm, rs, z, starts = _random_problem(rng)
    fwd, tb = ri.banded_forward_pass(z, starts, skip_pen=4.2, stay_pen=4.2)
    top = int(np.argmax(fwd[-1]))
    segs = ri.banded_traceback(tb, starts, top)
    assert segs.shape[0] == z.shape[0] + 1
    assert np.all(np.diff(segs) >= 0)
    assert segs[-1] == top + starts[-1] + 1


def test_start_band_dp_matches_oracle():
    """Device start-discovery DP == numpy static-band DP + traceback."""
    rng = np.random.default_rng(2)
    B, nb, ne = 3, 30, 64
    z_shift, skip_pen, stay_pen, max_half_z = 5.0, 4.2, 4.2, 20.0
    ems, rms, rss, all_segs = [], [], [], []
    for b in range(B):
        em = rng.normal(0, 1, nb + ne)
        rm = rng.normal(0, 1, nb)
        rs = np.full(nb, 0.35)
        z = np.empty((nb, ne))
        for i in range(nb):
            z[i] = z_shift - np.minimum(
                np.abs(em[i:i + ne] - rm[i]) / rs[i], max_half_z)
        starts = np.arange(nb, dtype=np.int64)
        fwd, tb = ri.banded_forward_pass(z, starts, skip_pen, stay_pen)
        top = int(np.argmax(fwd[-1]))
        segs = ri.banded_traceback(tb, starts, top)
        ems.append(em)
        rms.append(rm)
        rss.append(rs)
        all_segs.append(segs)

    params = dpo.StartDpParams(
        z_shift=z_shift, skip_pen=skip_pen, stay_pen=stay_pen,
        max_half_z_score=max_half_z, num_bases=nb, num_events=ne)
    d_segs, d_top, d_max = dpo.start_band_dp(
        jnp.asarray(np.stack(ems)), jnp.asarray(np.stack(rms)),
        jnp.asarray(np.stack(rss)), params)
    d_segs = np.asarray(d_segs)
    d_max = np.asarray(d_max)
    for b in range(B):
        # DP scores agree to fp association noise; segmentations may differ
        # only at exactly co-optimal tie positions.
        oracle_max = ri.banded_forward_pass(
            np.array([z_shift - np.minimum(np.abs(
                ems[b][i:i + ne] - rms[b][i]) / rss[b][i], max_half_z)
                for i in range(nb)]),
            np.arange(nb, dtype=np.int64), skip_pen, stay_pen)[0][-1].max()
        assert abs(d_max[b] - oracle_max) < 1e-9 * max(1, abs(oracle_max))
        frac_eq = np.mean(d_segs[b] == all_segs[b])
        assert frac_eq >= 0.95, (b, frac_eq)


def test_adaptive_dp_matches_oracle():
    """Batched device adaptive DP == numpy oracle, including traceback."""
    rng = np.random.default_rng(3)
    B = 4
    bw = 32
    L = 60            # bases
    z_shift, skip_pen, stay_pen = 5.0, 4.2, 4.2
    mask_fill, max_half_z = -15.0, 20.0
    P = 8             # prefix rows

    batch_em, batch_rm, batch_rs = [], [], []
    batch_pref_starts, batch_pref_end = [], []
    oracle_segs = []
    seq_lens, n_events_arr = [], []

    for b in range(B):
        n_bases = L - 2 * b                      # ragged lengths
        # synthesize events roughly tracking the reference levels
        rm = rng.normal(0, 1, n_bases)
        rs = np.full(n_bases, 0.35)
        events_per_base = 2
        n_events = n_bases * events_per_base + bw
        em = np.repeat(rm, events_per_base) + rng.normal(0, 0.2,
                                                         n_bases * 2)
        em = np.concatenate([em, rng.normal(0, 1, n_events - em.shape[0])])

        # prefix plan: simple static ramp, no masking
        pref_starts = np.linspace(0, P * events_per_base, P).astype(np.int64)
        pref_end = np.full(P, 10 ** 9, dtype=np.int64)

        # oracle: static prefix pass + adaptive remainder
        z = np.empty((P, bw))
        for i in range(P):
            s = pref_starts[i]
            z[i] = z_shift - np.minimum(
                np.abs(em[s:s + bw] - rm[i]) / rs[i], max_half_z)
        fwd = np.empty((n_bases + 1, bw))
        tb = np.zeros((n_bases + 1, bw), np.int8)
        pf, ptb = ri.banded_forward_pass(z, pref_starts, skip_pen, stay_pen)
        fwd[:P + 1] = pf
        tb[:P + 1] = ptb
        starts = np.empty(n_bases, dtype=np.int64)
        starts[:P] = pref_starts
        ri.adaptive_banded_forward_pass(
            fwd, tb, starts, em, rm, rs, z_shift, skip_pen, stay_pen,
            P, mask_fill, True, max_half_z)
        top = int(np.argmax(fwd[-1]))
        segs = ri.banded_traceback(tb, starts, top)
        oracle_segs.append(segs)

        batch_em.append(em)
        batch_rm.append(rm)
        batch_rs.append(rs)
        batch_pref_starts.append(pref_starts)
        batch_pref_end.append(pref_end)
        seq_lens.append(n_bases)
        n_events_arr.append(n_events)

    E_max = max(e.shape[0] for e in batch_em) + 8
    em_pad = np.zeros((B, E_max))
    rm_pad = np.ones((B, L))
    rs_pad = np.ones((B, L))
    for b in range(B):
        em_pad[b, :batch_em[b].shape[0]] = batch_em[b]
        rm_pad[b, :seq_lens[b]] = batch_rm[b]
        rs_pad[b, :seq_lens[b]] = batch_rs[b]

    params = dpo.DpParams(z_shift=z_shift, skip_pen=skip_pen,
                          stay_pen=stay_pen, mask_fill_z_score=mask_fill,
                          max_half_z_score=max_half_z, bandwidth=bw)
    tb_d, bs_d, final_fwd, band_err = dpo.adaptive_banded_dp(
        jnp.asarray(em_pad), jnp.asarray(np.array(n_events_arr)),
        jnp.asarray(rm_pad), jnp.asarray(rs_pad),
        jnp.asarray(np.array(seq_lens)),
        jnp.asarray(np.stack(batch_pref_starts)),
        jnp.zeros(B, jnp.int32),
        jnp.asarray(np.stack(batch_pref_end)),
        jnp.full((B,), P, jnp.int32),
        params, L, P)
    assert not np.any(np.asarray(band_err))
    top_d = np.argmax(np.asarray(final_fwd), axis=1)
    segs_d, bound_err = dpo.banded_traceback(
        tb_d, bs_d, jnp.asarray(np.array(seq_lens)),
        jnp.asarray(top_d.astype(np.int32)), -1, bw, L)
    segs_d = np.asarray(segs_d)
    for b in range(B):
        np.testing.assert_array_equal(
            segs_d[b, :seq_lens[b] + 1], oracle_segs[b])


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))
