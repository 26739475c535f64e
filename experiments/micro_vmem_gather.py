"""M7: dynamic row-gather from VMEM inside a Pallas kernel.

The candidate 'panel' SpMM kernel keeps a packed B-slab (U×k) in VMEM and
needs C[r] += val · Bp[slot[r]] — a per-row dynamic gather on the sublane
dimension.  Measures three strategies: jnp.take lowering, serial
dynamic-slice loop, one-hot matmul on the MXU.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / iters


U, K = 4096, 128
RB = 1024          # index block columns
R = 8 * RB         # gathered rows per grid step
STEPS = 16


def make(idx, slab, kernel):
    call = pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((8, RB), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((U, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
    )
    return jax.jit(lambda i, s: call(i, s))


def run(tag, kernel):
    rng = np.random.default_rng(0)
    slab = jnp.asarray(rng.random((U, K), np.float32))
    idx = jnp.asarray(rng.integers(0, U, (STEPS * 8, RB)).astype(np.int32))
    f = make(idx, slab, kernel)
    dt = timed(f, idx, slab)
    rows = STEPS * R
    print(f"{tag}: {dt*1e3:.3f} ms for {rows} rows = {rows/dt/1e6:.1f} M rows/s "
          f"({rows*K*4/dt/1e9:.0f} GB/s)", flush=True)


def k_take(idx_ref, slab_ref, out_ref):
    out_ref[:] = jnp.take(slab_ref[:], idx_ref[:].reshape(-1), axis=0)


def k_dynslice(idx_ref, slab_ref, out_ref):
    def body(i, _):
        r = idx_ref[i // RB, i % RB]
        out_ref[pl.ds(i, 1), :] = slab_ref[pl.ds(r, 1), :]
        return 0

    jax.lax.fori_loop(0, R, body, 0)


def k_onehot(idx_ref, slab_ref, out_ref):
    flat = idx_ref[:].reshape(R, 1)
    ids = jax.lax.broadcasted_iota(jnp.int32, (R, U), 1)
    oh = (ids == flat).astype(jnp.bfloat16)
    out_ref[:] = jax.lax.dot(
        oh, slab_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )


if __name__ == "__main__":
    print("device:", jax.devices(), flush=True)
    for tag, k in [("M7a take", k_take), ("M7b dynslice", k_dynslice),
                   ("M7c onehot", k_onehot)]:
        try:
            run(tag, k)
        except Exception as e:
            print(f"{tag} FAILED: {type(e).__name__}: {str(e)[:250]}", flush=True)
