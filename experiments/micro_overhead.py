"""Calibrate per-dispatch overhead and sync cost of the axon relay."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def p(s):
    print(s, flush=True)


def loop_time(fn, x, iters):
    out = fn(x)
    np.asarray(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    p(f"device: {jax.devices()}")
    tiny = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    for iters in (1, 10, 100):
        dt = loop_time(f, tiny, iters)
        p(f"tiny op, iters={iters:4d}: {dt*1e3:8.3f} ms/iter")

    # chained tiny ops inside ONE dispatch
    @jax.jit
    def chain100(v):
        for _ in range(100):
            v = v + 1.0
        return v

    dt = loop_time(chain100, tiny, 10)
    p(f"chain-100 in one jit: {dt*1e3:8.3f} ms/dispatch")

    # medium stream op at different iter counts (does time/iter shrink?)
    x = jnp.ones((64 * 1024 * 1024 // 4,), jnp.float32)  # 256MB
    g = jax.jit(lambda v: v * 1.0000001)
    for iters in (3, 20):
        dt = loop_time(g, x, iters)
        p(f"stream 256MB r+w, iters={iters:3d}: {dt*1e3:8.3f} ms/iter = "
          f"{2*x.nbytes/dt/1e9:.0f} GB/s")
