"""Gather dtype/layout variants for the split-precision ELL design."""
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
    NN = 235_000                      # 30M padded nnz
    key = jax.random.PRNGKey(0)
    B = jax.random.uniform(key, (m, k), jnp.float32)
    Bb = B.astype(jnp.bfloat16)
    B3 = jnp.concatenate([Bb, Bb, Bb], axis=1)           # [m, 3k] packed planes
    cols = jax.random.randint(key, (NN, w), 0, m, jnp.int32)
    v = jnp.ones((NN, w), jnp.float32)
    idx = cols[:60_000].reshape(-1)   # 7.68M rows

    t32 = jax.jit(lambda c, b: jnp.take(b, c, axis=0))
    dt = _time_device(t32, idx, B, iters=10)
    p(f"take-only f32 7.7M: {dt*1e3:.1f} ms ({7.68e6*512/dt/1e9:.0f} GB/s)")
    dt = _time_device(t32, idx, Bb, iters=10)
    p(f"take-only bf16 7.7M: {dt*1e3:.1f} ms ({7.68e6*256/dt/1e9:.0f} GB/s)")
    dt = _time_device(t32, idx, B3, iters=10)
    p(f"take-only bf16x3-packed 7.7M: {dt*1e3:.1f} ms ({7.68e6*768/dt/1e9:.0f} GB/s)")

    def tr(Bx, planes):
        @jax.jit
        def f(c, v, Bx):
            out = []
            step = 16384
            kk = Bx.shape[1]
            for s in range(0, NN, step):
                e = min(s + step, NN)
                Bg = jnp.take(Bx, c[s:e].reshape(-1), axis=0).reshape(e - s, w, kk)
                if planes == 1:
                    acc = (v[s:e, :, None] * Bg.astype(jnp.float32)).sum(axis=1)
                else:
                    g32 = Bg.astype(jnp.float32)
                    acc = (v[s:e, :, None] *
                           (g32[..., :k] + g32[..., k:2*k] + g32[..., 2*k:])
                           ).sum(axis=1)
                out.append(acc)
            return jnp.concatenate(out, 0)
        return f

    dt = _time_device(tr(Bb, 1), cols, v, Bb, iters=10)
    p(f"take+reduce bf16x1 30M: {dt*1e3:.1f} ms")
    dt = _time_device(tr(B3, 3), cols, v, B3, iters=10)
    p(f"take+reduce bf16x3-packed 30M: {dt*1e3:.1f} ms")

    # 3 separate bf16 takes + summed reduce
    @jax.jit
    def tr3(c, v, b1, b2, b3):
        out = []
        step = 16384
        for s in range(0, NN, step):
            e = min(s + step, NN)
            ids = c[s:e].reshape(-1)
            g = (jnp.take(b1, ids, axis=0).astype(jnp.float32)
                 + jnp.take(b2, ids, axis=0).astype(jnp.float32)
                 + jnp.take(b3, ids, axis=0).astype(jnp.float32)
                 ).reshape(e - s, w, k)
            out.append((v[s:e, :, None] * g).sum(axis=1))
        return jnp.concatenate(out, 0)

    dt = _time_device(tr3, cols, v, Bb, Bb, Bb, iters=10)
    p(f"take+reduce 3-separate-bf16 30M: {dt*1e3:.1f} ms")

    # f32 take + reduce reference
    dt = _time_device(tr(B, 1), cols, v, B, iters=10)
    p(f"take+reduce f32 30M: {dt*1e3:.1f} ms")
