"""Round-3 stage-2 probe: element-scatter rates by payload shape/dtype.

Decides whether the windowed build's residue can skip the compaction
scatter + pack gather + ELL slice assembly by scattering (col, val)
DIRECTLY into the padded ELL layout:

- if an int64 element scatter (col and f32-val bits packed on the int
  side — never bitcast small ints to f32, docs/measurements.md) runs at
  ~the int32 update rate, one scatter replaces the whole residue
  assembly chain;
- if it decomposes into 2x int32 scatters (TPU int64 is emulated), the
  two-pass design stays.

Serial-chain timing only (bench._probe pattern): repeated independent
dispatches are NOT serialized by the relay.

  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/scatter_modes.py [nnz_millions]
"""
from __future__ import annotations

import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_enable_x64", True)  # the i64 case is the question
import jax.numpy as jnp
import numpy as np

from flex_tpu.bench.harness import _sync


def chain_time(make_body, y0, idx, upd, lo=2, hi=8):
    """idx/upd enter as jit ARGUMENTS (the body closes only over their
    tracers) — closing a jitted function over concrete device arrays
    bakes them into the executable as constants (CLAUDE.md), which is
    not what the real build path dispatches."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(y, idx, upd, *, n):
        return jax.lax.fori_loop(0, n, make_body(idx, upd), y)

    ts = {}
    for n in (lo, hi):
        out = chain(y0, idx, upd, n=n)
        _sync(out)
        t0 = time.perf_counter()
        _sync(chain(y0, idx, upd, n=n))
        ts[n] = time.perf_counter() - t0
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    nnz = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 23_400_000
    size = nnz + 1
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, size, nnz, dtype=np.int32))
    v32 = jnp.asarray(rng.integers(0, 2**30, nnz, dtype=np.int32))
    vf = jnp.asarray(rng.random(nnz, dtype=np.float32))
    v64 = (v32.astype(jnp.int64) << 32) | v32.astype(jnp.uint32).astype(
        jnp.int64)
    v2 = jnp.stack([v32, v32], axis=1)  # [nnz, 2] int32

    def mk(dst_dtype, mode="set", wide=False):
        def make_body(idx_t, upd_t):
            def body(i, y):
                off = jnp.minimum(y.reshape(-1)[0].astype(jnp.int32), 0)
                tgt = jnp.zeros((size, 2) if wide else (size,), dst_dtype)
                at = tgt.at[idx_t + off]
                return at.set(upd_t, mode="drop") if mode == "set" \
                    else at.add(upd_t, mode="drop")
            return body
        return make_body

    cases = [
        ("i32 set", mk(jnp.int32), v32, jnp.zeros((size,), jnp.int32)),
        ("f32 set", mk(jnp.float32), vf, jnp.zeros((size,), jnp.float32)),
        ("f32 add", mk(jnp.float32, mode="add"), vf,
         jnp.zeros((size,), jnp.float32)),
        ("i64 set (packed col|valbits)", mk(jnp.int64), v64,
         jnp.zeros((size,), jnp.int64)),
        ("i32x2 row set [nnz,2]", mk(jnp.int32, wide=True), v2,
         jnp.zeros((size, 2), jnp.int32)),
    ]
    for name, make_body, upd, y0 in cases:
        try:
            t = chain_time(make_body, y0, idx, upd)
            print(f"{name:32s} {t*1e3:8.1f} ms  "
                  f"{nnz/t/1e6:7.1f} M updates/s", flush=True)
        except Exception as e:
            print(f"{name:32s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
