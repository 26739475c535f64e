"""Host<->device transfer-rate probe for the axon relay (sizes + chunking)."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def p(s):
    print(s, flush=True)


if __name__ == "__main__":
    p(f"device: {jax.devices()}")
    rng = np.random.default_rng(0)
    for mb in (1, 4, 16, 64):
        x = rng.random((mb * 1024 * 1024 // 4,), np.float32)
        t0 = time.perf_counter()
        d = jnp.asarray(x)
        np.asarray(d[-1:])
        t1 = time.perf_counter()
        p(f"H2D {mb:4d}MB 1-shot: {t1-t0:7.2f}s = {x.nbytes/(t1-t0)/1e6:7.1f} MB/s")

    x = rng.random((64 * 1024 * 1024 // 4,), np.float32)
    chunks = [x[i * 1024 * 1024:(i + 1) * 1024 * 1024] for i in range(64)]
    t0 = time.perf_counter()
    ds = [jnp.asarray(c) for c in chunks]
    np.asarray(ds[-1][-1:])
    t1 = time.perf_counter()
    p(f"H2D 64MB in 4MB chunks: {t1-t0:7.2f}s = {x.nbytes/(t1-t0)/1e6:7.1f} MB/s")

    for mb in (16, 128):
        d = jnp.zeros((mb * 1024 * 1024 // 4,), jnp.float32)
        np.asarray(d[-1:])
        t0 = time.perf_counter()
        h = np.asarray(d)
        t1 = time.perf_counter()
        p(f"D2H {mb:4d}MB: {t1-t0:7.2f}s = {d.nbytes/(t1-t0)/1e6:7.1f} MB/s")
