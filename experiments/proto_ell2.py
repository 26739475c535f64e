"""ELL SpMM timing prototype v2 — arrays as jit args, device-generated data.

Shapes mirror reddit_like/deg with fine-grained width buckets (~1.25x pad).
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from flex_tpu.bench.harness import _time_device


def p(s):
    print(s, flush=True)


@partial(jax.jit, static_argnames=("m", "mode", "max_rows"))
def spmm_ell(buckets, B, *, m, mode="vpu", max_rows=2_000_000):
    outs = []
    rows = []
    for cols, vals, crow in buckets:
        N, w = cols.shape
        step = max(1, max_rows // w)
        for s in range(0, N, step):
            c = cols[s:s + step]
            v = vals[s:s + step]
            Bg = jnp.take(B, c.reshape(-1), axis=0).reshape(*c.shape, B.shape[1])
            if mode == "vpu":
                part = (v[:, :, None] * Bg).sum(axis=1)
            else:
                part = jnp.einsum("nw,nwk->nk", v, Bg,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
            outs.append(part)
            rows.append(crow[s:s + step])
    allp = jnp.concatenate(outs, axis=0)
    allr = jnp.concatenate(rows, axis=0)
    return jnp.zeros((m, B.shape[1]), jnp.float32).at[allr].add(allp)


if __name__ == "__main__":
    p(f"device: {jax.devices()}")
    m, k = 232_965, 128
    # bucket shapes ~ reddit_like/deg with fine widths (measured on host)
    shapes = [(16, 60_000), (32, 60_000), (64, 70_000), (128, 40_000),
              (256, 20_000), (512, 10_000), (1024, 5_000), (2048, 2_500)]
    nnz = sum(w * n for w, n in shapes)
    p(f"synthetic padded nnz = {nnz/1e6:.1f}M")

    key = jax.random.PRNGKey(0)
    buckets = []
    for w, n in shapes:
        key, k1, k2 = jax.random.split(key, 3)
        cols = jax.random.randint(k1, (n, w), 0, m, dtype=jnp.int32)
        vals = jax.random.uniform(k2, (n, w), jnp.float32)
        crow = jax.random.randint(k1, (n,), 0, m, dtype=jnp.int32)
        buckets.append((cols, vals, crow))
    buckets = tuple(buckets)
    B = jax.random.uniform(jax.random.PRNGKey(9), (m, k), jnp.float32)
    np.asarray(B[-1:, -1])

    for mode in ("vpu", "mxu"):
        try:
            f = lambda bk, b: spmm_ell(bk, b, m=m, mode=mode)
            dt = _time_device(f, buckets, B, iters=3)
            p(f"ELL {mode}: {dt*1e3:.1f} ms = {2*nnz*k/dt/1e9:.1f} GF/s padded "
              f"({2*23_446_803*k/dt/1e9:.1f} GF/s eff@23.4M nnz)")
        except Exception as e:
            p(f"ELL {mode} FAILED: {type(e).__name__}: {str(e)[:200]}")
