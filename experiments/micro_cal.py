"""Recalibrated primitives (iters high enough to amortize the ~34 ms sync)."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def p(s):
    print(s, flush=True)


def loop_time(fn, *args, iters=25):
    out = fn(*args)
    np.asarray(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    p(f"device: {jax.devices()}")
    m, k = 232_965, 128

    x = jnp.ones((128 * 1024 * 1024 // 4,), jnp.float32)  # 512MB
    g = jax.jit(lambda v: v * 1.0000001)
    dt = loop_time(g, x, iters=30)
    p(f"stream 512MB r+w: {dt*1e3:.3f} ms = {2*x.nbytes/dt/1e9:.0f} GB/s")

    a = jax.random.uniform(jax.random.PRNGKey(0), (4096, 4096), jnp.float32)
    f = jax.jit(lambda v: v @ v)
    dt = loop_time(f, a, iters=30)
    p(f"matmul f32 4096: {dt*1e3:.3f} ms = {2*4096**3/dt/1e12:.1f} TFLOP/s")
    ab = a.astype(jnp.bfloat16)
    dt = loop_time(f, ab, iters=30)
    p(f"matmul bf16 4096: {dt*1e3:.3f} ms = {2*4096**3/dt/1e12:.1f} TFLOP/s")

    B = jax.random.uniform(jax.random.PRNGKey(1), (m, k), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(2), (7_700_000,), 0, m, jnp.int32)
    t = jax.jit(lambda c, b: jnp.take(b, c, axis=0))
    dt = loop_time(t, idx, B, iters=10)
    gb = 7.7e6 * k * 4 / 1e9
    p(f"take 7.7M rows: {dt*1e3:.1f} ms = {gb/dt:.0f} GB/s-out")

    # fused vs materialized gather+reduce (w=64)
    N, w = 300_000, 64
    cols = jax.random.randint(jax.random.PRNGKey(3), (N, w), 0, m, jnp.int32)
    vals = jax.random.uniform(jax.random.PRNGKey(4), (N, w), jnp.float32)

    @jax.jit
    def ell_part(c, v, b):
        Bg = jnp.take(b, c.reshape(-1), axis=0).reshape(N, w, k)
        return (v[:, :, None] * Bg).sum(axis=1)

    dt = loop_time(ell_part, cols, vals, B, iters=10)
    gbytes = N * w * k * 4 / 1e9
    p(f"ELL part N={N} w={w} ({gbytes:.1f} GB gathered): {dt*1e3:.1f} ms = "
      f"{gbytes/dt:.0f} GB/s-gather-out, {2*N*w*k/dt/1e9:.0f} GF/s")

    # scatter-add of m rows (the .at[].add combine)
    rows = jnp.sort(jax.random.randint(jax.random.PRNGKey(5), (400_000,), 0, m, jnp.int32))
    part = jnp.ones((400_000, k), jnp.float32)
    sc = jax.jit(lambda r, pp: jnp.zeros((m, k), jnp.float32).at[r].add(pp))
    dt = loop_time(sc, rows, part, iters=10)
    p(f"scatter-add 400K rows -> m: {dt*1e3:.1f} ms")
