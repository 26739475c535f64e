"""Stage-by-stage decomposition of the ELL SpMM time on reddit-scale data."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from flex_tpu.bench.harness import _time_device
from flex_tpu.io import make_features
from flex_tpu.io.synth import rmat_graph
from flex_tpu.ops.ell_spmm import prepare_ell
from flex_tpu.reorder import reorder


def p(s):
    print(s, flush=True)


if __name__ == "__main__":
    p(f"device: {jax.devices()}")
    g = reorder(rmat_graph(232_965, 23_446_803, seed=1, name="reddit_like"),
                "deg", check=False)
    B = jnp.asarray(make_features(g, 128))
    plan = prepare_ell(g)
    st = plan.stats
    p(f"stats: padded={st['padded_nnz']/1e6:.1f}M pad={st['pad_ratio']:.2f} "
      f"chunks={st['n_chunks']} views={st['views']}")

    dt = _time_device(plan, B, iters=10)
    p(f"full ELL: {dt*1e3:.1f} ms")

    # stage 1: all takes only (sum to keep output small)
    @jax.jit
    def takes_only(buckets, Bx):
        acc = jnp.zeros((8, 128), jnp.float32)
        for cols, _vals in buckets:
            N, w = cols.shape
            step = max(1, plan.max_gather_rows // w)
            for s in range(0, N, step):
                Bg = jnp.take(Bx, cols[s:s + step].reshape(-1), axis=0)
                acc = acc + Bg[:8]
        return acc

    dt = _time_device(takes_only, plan.buckets, B, iters=10)
    p(f"takes only: {dt*1e3:.1f} ms")

    # stage 2: reduce only, on pre-materialized uniform blocks (~same bytes)
    N, w = 235_000, 128  # ~30M padded nnz
    Bg = jnp.ones((N, w, 128), jnp.float32)
    v = jnp.ones((N, w), jnp.float32)

    @jax.jit
    def reduce_only(v, Bg):
        return (v[:, :, None] * Bg).sum(axis=1)

    dt = _time_device(reduce_only, v, Bg, iters=10)
    p(f"reduce only (30M nnz equiv, materialized): {dt*1e3:.1f} ms")

    # stage 2b: reduce via dot_general contraction on MXU (f32 HIGHEST)
    @jax.jit
    def reduce_dot(v, Bg):
        return jax.lax.dot_general(
            v[:, None, :], Bg, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )[:, 0]

    dt = _time_device(reduce_dot, v, Bg, iters=10)
    p(f"reduce via batched dot HIGHEST: {dt*1e3:.1f} ms")

    # stage 3: scatter-add combine
    @jax.jit
    def scatter_only(chunk_row, part):
        return jnp.zeros((g.m, 128), jnp.float32).at[chunk_row].add(part)

    part = jnp.ones((int(plan.chunk_row.shape[0]), 128), jnp.float32)
    dt = _time_device(scatter_only, plan.chunk_row, part, iters=10)
    p(f"scatter-add only: {dt*1e3:.1f} ms")

    # fused take+reduce in one jit, single uniform bucket (is XLA fusing?)
    cols_u = jax.random.randint(jax.random.PRNGKey(0), (N, w), 0, g.m, jnp.int32)

    @jax.jit
    def take_reduce(c, v, Bx):
        out = []
        step = 16384
        for s in range(0, N, step):
            Bg = jnp.take(Bx, c[s:s+step].reshape(-1), axis=0).reshape(step, w, 128)
            out.append((v[s:s+step, :, None] * Bg).sum(axis=1))
        return jnp.concatenate(out, 0)

    dt = _time_device(take_reduce, cols_u, v, B, iters=10)
    p(f"take+reduce uniform (30M nnz): {dt*1e3:.1f} ms")
