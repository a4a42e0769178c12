"""Ad-hoc TPU check: chunked Pallas DP lowers + matches the scan engine
on a save-bandwidth long-read shape (run on the axon TPU)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import tombo_tpu  # noqa: F401  (sets up the compilation cache)
from tombo_tpu.ops import dp as dpo
from tombo_tpu.ops import pallas_dp as pdp


def mk_case(seed, B, L_max, P_max, bw, E_max):
    rng = np.random.default_rng(seed)
    p = dpo.DpParams(z_shift=2.0, skip_pen=4.2, stay_pen=4.2,
                     mask_fill_z_score=-15.0, max_half_z_score=20.0,
                     bandwidth=bw)
    em = rng.normal(0, 1, (B, E_max)).astype(np.float32)
    n_events = rng.integers(E_max // 2, E_max, B)
    seq_lens = rng.integers(L_max // 2, L_max, B)
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
    args = (jnp.asarray(em), jnp.asarray(n_events), jnp.asarray(rm),
            jnp.asarray(rs), jnp.asarray(seq_lens), jnp.asarray(pstarts),
            jnp.asarray(pvalid), jnp.asarray(np.clip(pend, 0, 2 ** 31 - 1)),
            jnp.asarray(P_rows))
    return p, args, seq_lens


def main():
    print("backend:", jax.default_backend())
    B, L_max, P_max, bw = 8, int(sys.argv[1]) if len(sys.argv) > 1 else 1024, 64, 1500
    E_max = L_max * 8
    p, args, seq_lens = mk_case(11, B, L_max, P_max, bw, E_max)
    layout = pdp.plan_dp_layout(B, L_max, E_max, bw)
    print("layout:", layout)
    assert layout[0] == "chunked"
    t0 = time.time()
    segs_p, band_err, bound_err, _ = pdp.adaptive_banded_dp_tb_chunked(
        *args, p, L_max, P_max, 10, block_reads=layout[1],
        chunk_rows=layout[2])
    segs_p = np.asarray(jax.block_until_ready(segs_p))
    print("chunked compile+run: %.1fs" % (time.time() - t0))
    t0 = time.time()
    segs_p2 = np.asarray(pdp.adaptive_banded_dp_tb_chunked(
        *args, p, L_max, P_max, 10, block_reads=layout[1],
        chunk_rows=layout[2])[0])
    print("chunked warm run: %.3fs" % (time.time() - t0))

    # scan-engine cross-check on CPU (f32)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cargs = tuple(jnp.asarray(np.asarray(a)) for a in args)
        tb, band_starts, final_fwd, band_err_s = dpo.adaptive_banded_dp(
            *cargs, p, L_max, P_max)
        top = jnp.argmax(final_fwd, axis=1).astype(jnp.int32)
        segs_s, _ = dpo.banded_traceback(
            tb, band_starts, cargs[4], top, 10, bw, L_max)
        segs_s = np.asarray(segs_s)
    n_eq = n_tot = 0
    for i in range(B):
        n = seq_lens[i] + 1
        n_eq += int((segs_s[i, :n] == segs_p[i, :n]).sum())
        n_tot += int(n)
    print("seg agreement: %d/%d (%.5f)" % (n_eq, n_tot, n_eq / n_tot))
    assert n_eq / n_tot > 0.99
    print("OK")


if __name__ == "__main__":
    main()
