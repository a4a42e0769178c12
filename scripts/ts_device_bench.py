"""Microbench device Theil-Sen variants at bench shape (B=512, N=1024)."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from tombo_tpu.ops import rescale

B, N = (int(x) for x in (sys.argv[1:3] or (512, 1024)))
rng = np.random.default_rng(0)
ev = rng.normal(0, 1, (B, N)).astype(np.float32)
mod = (ev * 1.05 + 0.1 + rng.normal(0, 0.3, (B, N))).astype(np.float32)
npts = np.full(B, min(N, 1000), np.int32)
evj, modj, npj = jnp.asarray(ev), jnp.asarray(mod), jnp.asarray(npts)

import functools
variants = {
    "recompute": jax.jit(functools.partial(rescale.theil_sen_device, block=0)),
    "blocked64": jax.jit(functools.partial(rescale.theil_sen_device, block=64)),
    "blocked32": jax.jit(functools.partial(rescale.theil_sen_device, block=32)),
}
ref = None
for name, fn in variants.items():
    try:
        out = jax.block_until_ready(fn(evj, modj, npj))
    except Exception as e:
        print(name, "FAILED", type(e).__name__, str(e)[:120]); continue
    t0 = time.perf_counter(); n = 3
    for _ in range(n):
        out = jax.block_until_ready(fn(evj, modj, npj))
    dt = (time.perf_counter() - t0) / n
    s = np.asarray(out[0])
    if ref is None: ref = s
    print("%-10s %7.1f ms  (%.3f ms/read)  max|ds|=%.3g" % (
        name, dt*1e3, dt*1e3/B, float(np.abs(s-ref).max())))
