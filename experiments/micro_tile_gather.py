"""Does XLA's row-gather coalesce same-tile rows?

An f32 (8,128) tile is 4KB; if gathering a row costs its whole tile, then
indices arranged as consecutive 8-blocks should gather up to 8x faster than
random singles — which would make tile-aligned column packing the next ELL
format optimisation.
"""
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
    m, k, R = 232_965, 128, 7_680_000
    B = jax.random.uniform(jax.random.PRNGKey(0), (m, k), jnp.float32)
    t = jax.jit(lambda c, b: jnp.take(b, c, axis=0))

    rng = np.random.default_rng(0)
    idx_rand = jnp.asarray(rng.integers(0, m, R).astype(np.int32))
    # blocks of 8 consecutive rows at random tile-aligned bases
    bases = rng.integers(0, (m - 8) // 8, R // 8).astype(np.int32) * 8
    idx_blk8 = jnp.asarray((bases[:, None] + np.arange(8)[None, :])
                           .reshape(-1).astype(np.int32))
    # blocks of 4
    bases4 = rng.integers(0, (m - 4) // 4, R // 4).astype(np.int32) * 4
    idx_blk4 = jnp.asarray((bases4[:, None] + np.arange(4)[None, :])
                           .reshape(-1).astype(np.int32))
    # fully sequential
    idx_seq = jnp.asarray((np.arange(R) % m).astype(np.int32))

    for tag, idx in [("random", idx_rand), ("blk4", idx_blk4),
                     ("blk8", idx_blk8), ("sequential", idx_seq)]:
        dt = _time_device(t, idx, B, iters=10)
        p(f"take 7.68M rows {tag:10s}: {dt*1e3:7.1f} ms = "
          f"{R/dt/1e6:6.0f} M rows/s")
