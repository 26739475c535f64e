"""f32 ELL reduce variants: can better overlap/fusion recover the gap
between take-only (~190 ms @30M) and take+reduce (~365 ms)?"""
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
    NN = 235_000
    key = jax.random.PRNGKey(0)
    B = jax.random.uniform(key, (m, k), jnp.float32)
    cols = jax.random.randint(key, (NN, w), 0, m, jnp.int32)
    v = jnp.ones((NN, w), jnp.float32)

    def run(tag, f):
        try:
            dt = _time_device(f, cols, v, B, iters=10)
            p(f"{tag}: {dt*1e3:.1f} ms")
        except Exception as e:
            p(f"{tag} FAILED: {type(e).__name__} {str(e)[:150]}")

    # A: VPU mul-sum (reference point)
    @jax.jit
    def f_vpu(c, v, Bx):
        out = []
        step = 16384
        for s in range(0, NN, step):
            e = min(s + step, NN)
            Bg = jnp.take(Bx, c[s:e].reshape(-1), axis=0).reshape(e - s, w, k)
            out.append((v[s:e, :, None] * Bg).sum(axis=1))
        return jnp.concatenate(out, 0)

    run("A vpu mul-sum", f_vpu)

    # B: batched-dot reduce on MXU (HIGHEST)
    @jax.jit
    def f_dot(c, v, Bx):
        out = []
        step = 16384
        for s in range(0, NN, step):
            e = min(s + step, NN)
            Bg = jnp.take(Bx, c[s:e].reshape(-1), axis=0).reshape(e - s, w, k)
            r = jax.lax.dot_general(
                v[s:e][:, None, :], Bg, (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            out.append(r[:, 0])
        return jnp.concatenate(out, 0)

    run("B mxu batched-dot HIGHEST", f_dot)

    # C: w-sliced accumulation (smaller live gathers, more overlap chances)
    @jax.jit
    def f_wslice(c, v, Bx):
        out = []
        step = 65536
        for s in range(0, NN, step):
            e = min(s + step, NN)
            acc = jnp.zeros((e - s, k), jnp.float32)
            for ws in range(0, w, 32):
                ids = c[s:e, ws:ws+32].reshape(-1)
                Bg = jnp.take(Bx, ids, axis=0).reshape(e - s, 32, k)
                acc = acc + (v[s:e, ws:ws+32, None] * Bg).sum(axis=1)
            out.append(acc)
        return jnp.concatenate(out, 0)

    run("C w-sliced acc", f_wslice)

    # D: flat premultiply then strided reshape-sum (single big take)
    @jax.jit
    def f_flat(c, v, Bx):
        out = []
        step = 16384
        for s in range(0, NN, step):
            e = min(s + step, NN)
            Z = jnp.take(Bx, c[s:e].reshape(-1), axis=0) * v[s:e].reshape(-1)[:, None]
            out.append(Z.reshape(e - s, w, k).sum(axis=1))
        return jnp.concatenate(out, 0)

    run("D flat premultiply", f_flat)
