"""ELL stage decomposition v2 — bounded liveness."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from flex_tpu.bench.harness import _time_device


def p(s):
    print(s, flush=True)


if __name__ == "__main__":
    p(f"device: {jax.devices()}")
    m, k, w = 232_965, 128, 128
    B = jax.random.uniform(jax.random.PRNGKey(9), (m, k), jnp.float32)

    # reduce-only at N=60K (3.9GB materialized input), scaled to 30M nnz
    N = 60_000
    Bg = jnp.ones((N, w, k), jnp.float32)
    v = jnp.ones((N, w), jnp.float32)

    @jax.jit
    def reduce_only(v, Bg):
        return (v[:, :, None] * Bg).sum(axis=1)

    dt = _time_device(reduce_only, v, Bg, iters=10)
    scale = 30e6 / (N * w)
    p(f"reduce-only {N*w/1e6:.1f}M nnz: {dt*1e3:.1f} ms "
      f"(scaled to 30M: {dt*1e3*scale:.1f} ms)")

    # take-only 7.7M rows (reference point, should be ~47ms)
    idx = jax.random.randint(jax.random.PRNGKey(2), (7_700_000,), 0, m, jnp.int32)
    t = jax.jit(lambda c, b: jnp.take(b, c, axis=0))
    dt = _time_device(t, idx, B, iters=10)
    p(f"take 7.7M rows: {dt*1e3:.1f} ms (scaled to 30M: {dt*1e3*30/7.7:.1f} ms)")

    # take+reduce, uniform w=128, 30M nnz, sub-batch 8192 chunks (=1M rows)
    NN = 235_000
    cols_u = jax.random.randint(jax.random.PRNGKey(0), (NN, w), 0, m, jnp.int32)
    vv = jnp.ones((NN, w), jnp.float32)

    def make_tr(step):
        @jax.jit
        def take_reduce(c, v, Bx):
            out = []
            for s in range(0, NN, step):
                e = min(s + step, NN)
                Bg = jnp.take(Bx, c[s:e].reshape(-1), axis=0).reshape(e - s, w, k)
                out.append((v[s:e, :, None] * Bg).sum(axis=1))
            return jnp.concatenate(out, 0)
        return take_reduce

    for step in (4096, 16384, 65536):
        try:
            f = make_tr(step)
            dt = _time_device(f, cols_u, vv, B, iters=10)
            p(f"take+reduce 30M nnz, step={step}: {dt*1e3:.1f} ms "
              f"= {2*30e6*k/dt/1e9:.1f} GF/s-padded")
        except Exception as e:
            p(f"step={step} FAILED: {type(e).__name__} {str(e)[:120]}")

    # bf16 gather source: B in bf16, cast after gather (accuracy aside)
    Bb = B.astype(jnp.bfloat16)

    @jax.jit
    def take_reduce_bf16(c, v, Bx):
        out = []
        step = 16384
        for s in range(0, NN, step):
            e = min(s + step, NN)
            Bg = jnp.take(Bx, c[s:e].reshape(-1), axis=0).reshape(e - s, w, k)
            out.append((v[s:e, :, None] * Bg.astype(jnp.float32)).sum(axis=1))
        return jnp.concatenate(out, 0)

    dt = _time_device(take_reduce_bf16, cols_u, vv, Bb, iters=10)
    p(f"take+reduce bf16-B 30M nnz: {dt*1e3:.1f} ms")
