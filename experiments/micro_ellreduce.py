"""Can a Pallas streaming kernel beat XLA's multiply-reduce pass over the
gather output?  Chain: Bg = B[cols] ([N, w, k] materialised) -> partial =
(v[:,:,None]*Bg).sum(1).  XLA re-reads Bg at ~180 GB/s; Pallas blockspec
DMA measured 424 GB/s — prototype the reduce at real residue shapes."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flex_tpu.bench.harness import _time_device

N, w, k = 208_000, 32, 128  # ~6.7M padded residue nnz
CB = 64

key = jax.random.PRNGKey(0)
Bg = jax.jit(lambda: jax.random.uniform(key, (N, w, k), jnp.float32))()
v = jax.jit(lambda: jax.random.uniform(key, (N, w), jnp.float32))()


@jax.jit
def xla_reduce(v, Bg):
    return (v[:, :, None] * Bg).sum(axis=1)


def kernel(v_ref, b_ref, o_ref):
    o_ref[:] = (b_ref[:] * v_ref[:][:, :, None]).sum(axis=1)


@jax.jit
def pallas_reduce(v, Bg):
    grid = (N // CB,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CB, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, w, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CB, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, k), jnp.float32),
    )(v, Bg)


def mxu_kernel(v_ref, b_ref, o_ref):
    # contraction formulation: out[c,:] = v[c,:] @ Bg[c]  (batched dot)
    o_ref[:] = jax.lax.dot_general(
        v_ref[:], b_ref[:], (((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


@jax.jit
def pallas_reduce_mxu(v, Bg):
    grid = (N // CB,)
    return pl.pallas_call(
        mxu_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CB, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, w, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CB, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, k), jnp.float32),
    )(v, Bg)


by = N * w * k * 4 + N * w * 4 + N * k * 4
for name, f in (("xla", xla_reduce), ("pallas_vpu", pallas_reduce),
                ("pallas_mxu", pallas_reduce_mxu)):
    try:
        out = f(v, Bg)
        np.asarray(out.ravel()[:1])
        ref = np.asarray(xla_reduce(v[:256], Bg[:256]))
        got = np.asarray(f(v, Bg)[:256]) if name == "xla" else np.asarray(out[:256])
        dt = _time_device(f, v, Bg, iters=10)
        err = np.abs(got - ref).max()
        print(f"{name:>10s}: {dt*1e3:6.2f} ms  {by/dt/1e9:5.0f} GB/s  "
              f"maxerr={err:.2e}", flush=True)
    except Exception as e:
        print(f"{name:>10s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
