"""Measure MXU f32 matmul speed + error at DEFAULT/HIGH/HIGHEST precision.

The windowed/band kernels' dense dots were HIGHEST (6-pass); if HIGH
(3-pass bf16, ~f32-mul accuracy) passes the res_check tolerance the dense
part gets ~3-10x faster.  Shapes mimic one windowed panel step.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")

rng = np.random.default_rng(0)
TM, JW, K = 256, 4096, 128
P = 64  # batched panels per dispatch

# A sparse-ish like a windowed block (density ~2%), B uniform [-1,1]
A = np.zeros((P, TM, JW), np.float32)
nz = rng.random((P, TM, JW)) < 0.02
A[nz] = (2 * rng.random(nz.sum()) - 1).astype(np.float32)
B = (2 * rng.random((JW, K)) - 1).astype(np.float32)
gold = np.einsum("ptw,wk->ptk", A.astype(np.float64), B.astype(np.float64))
row_nnz = nz.sum(axis=2)  # [P, TM]

Ad, Bd = jnp.asarray(A), jnp.asarray(B)


def sync(x):
    np.asarray(x.ravel()[:1])


for prec in ("default", "high", "highest"):
    f = jax.jit(lambda a, b, p=prec: jnp.einsum(
        "ptw,wk->ptk", a, b, precision=p,
        preferred_element_type=jnp.float32))
    out = f(Ad, Bd)
    sync(out)
    t0 = time.perf_counter()
    N = 50
    for _ in range(N):
        out = f(Ad, Bd)
    sync(out)
    dt = (time.perf_counter() - t0) / N
    o = np.asarray(out)
    err = np.abs(o - gold)
    tol = np.finfo(np.float32).eps * np.maximum(row_nnz, 1)[:, :, None] * 4 \
        * np.maximum(np.abs(gold), 1.0)
    frac_bad = float((err > tol).mean())
    flops = 2 * P * TM * JW * K
    print(f"{prec:>8s}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s  "
          f"max_rel={float((err/np.maximum(np.abs(gold),1e-30)).max()):.2e} "
          f"frac_beyond_tol={frac_bad:.2e}", flush=True)
