"""Microbenchmarks that size the SpMM kernel design space on the real chip.

Run:  python experiments/micro_tpu.py          (one TPU process at a time!)

NOTE on timing: under the axon relay, block_until_ready does not sync;
all timings here sandwich N dispatches between two small device-to-host
copies (the device executes launches in order).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters


def p(s):
    print(s, flush=True)


def m5_peaks():
    rng = np.random.default_rng(0)
    n = 4096
    a32 = jnp.asarray(rng.random((n, n), np.float32))
    f = jax.jit(lambda x: x @ x)
    dt = timed(f, a32)
    p(f"M5 f32 {n}² matmul: {dt*1e3:.2f} ms = {2*n**3/dt/1e12:.1f} TFLOP/s")
    ah = jnp.asarray(rng.random((n, n), np.float32))
    fh = jax.jit(lambda x: jax.lax.dot(x, x, precision=jax.lax.Precision.HIGHEST))
    dt = timed(fh, ah)
    p(f"M5 f32/HIGHEST: {dt*1e3:.2f} ms = {2*n**3/dt/1e12:.1f} TFLOP/s")
    ab = jnp.asarray(rng.random((n, n), np.float32)).astype(jnp.bfloat16)
    dt = timed(f, ab)
    p(f"M5 bf16: {dt*1e3:.2f} ms = {2*n**3/dt/1e12:.1f} TFLOP/s")

    x = jnp.asarray(rng.random((128 * 1024 * 1024,), np.float32))  # 512MB
    fs = jax.jit(lambda v: v * 1.0000001)
    dt = timed(fs, x)
    p(f"M0 stream r+w 1GB: {dt*1e3:.2f} ms = {2*x.nbytes/dt/1e9:.0f} GB/s")


def m1_xla_spmm(m=232_965, nnz=23_446_803, k=128):
    rng = np.random.default_rng(0)
    rows = jnp.asarray(np.sort(rng.integers(0, m, nnz)).astype(np.int32))
    cols = jnp.asarray(rng.integers(0, m, nnz).astype(np.int32))
    vals = jnp.asarray(rng.random(nnz, np.float32))
    B = jnp.asarray(rng.random((m, k), np.float32))

    @jax.jit
    def spmm(r, c, v, b):
        return jax.ops.segment_sum(jnp.take(b, c, axis=0) * v[:, None], r,
                                   num_segments=m, indices_are_sorted=True)

    dt = timed(spmm, rows, cols, vals, B, iters=3)
    p(f"M1 take+segsum m={m} nnz={nnz} k={k}: {dt*1e3:.1f} ms = "
      f"{2*nnz*k/dt/1e9:.0f} GFLOP/s eff")


def m2_gather_bw(m=232_965, k=128, nrows=7_700_000):
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.random((m, k), np.float32))
    idx = jnp.asarray(rng.integers(0, m, nrows).astype(np.int32))
    f = jax.jit(lambda c, b: jnp.take(b, c, axis=0))
    dt = timed(f, idx, B, iters=3)
    gb = nrows * k * 4 / 1e9
    p(f"M2 take {nrows/1e6:.1f}M rows ({gb:.1f} GB out): {dt*1e3:.1f} ms "
      f"= {gb/dt:.0f} GB/s-out ({nrows/dt/1e6:.0f} M rows/s)")
    # sorted indices (post-reordering locality)
    idx_s = jnp.sort(idx)
    dt = timed(f, idx_s, B, iters=3)
    p(f"M2s take sorted: {dt*1e3:.1f} ms = {gb/dt:.0f} GB/s-out")


def m4_segsum(m=232_965, nnz=23_446_803, k=128):
    rng = np.random.default_rng(0)
    rows = jnp.asarray(np.sort(rng.integers(0, m, nnz)).astype(np.int32))
    z = jnp.asarray(rng.random((nnz, k), np.float32))
    f = jax.jit(lambda r, zz: jax.ops.segment_sum(
        zz, r, num_segments=m, indices_are_sorted=True))
    dt = timed(f, rows, z, iters=3)
    p(f"M4 sorted segsum ({z.nbytes/1e9:.1f} GB in): {dt*1e3:.1f} ms = "
      f"{z.nbytes/dt/1e9:.0f} GB/s")


def m_ell_fused(m=232_965, k=128, w=101):
    """ELL einsum: does XLA fuse the gather into the reduction?"""
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, m, (m, w)).astype(np.int32))
    vals = jnp.asarray(rng.random((m, w), np.float32))
    B = jnp.asarray(rng.random((m, k), np.float32))

    @jax.jit
    def ell(c, v, b):
        return jnp.einsum("rw,rwk->rk", v, b[c])

    try:
        dt = timed(ell, cols, vals, B, iters=3)
        nnz = m * w
        p(f"M8 ELL einsum w={w}: {dt*1e3:.1f} ms = {2*nnz*k/dt/1e9:.0f} GFLOP/s eff")
    except Exception as e:
        p(f"M8 ELL einsum failed: {type(e).__name__} {str(e)[:200]}")


def m6_vmem_probe():
    ok = 0
    for mb in (2, 4, 8, 12, 16, 24, 32, 48, 64, 96):
        nrows = mb * 1024 * 1024 // 4 // 128

        def kernel(x_ref, o_ref, scratch):
            scratch[0:8, :] = x_ref[:]
            o_ref[:] = scratch[0:8, :]

        try:
            f = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((nrows, 128), jnp.float32)],
            )
            np.asarray(f(jnp.ones((8, 128), jnp.float32)))
            ok = mb
        except Exception:
            p(f"M6 VMEM scratch: {ok} MB OK, {mb} MB FAIL")
            return
    p(f"M6 VMEM scratch: >= {ok} MB OK")


def m3_row_dma(rows_per_step=1024, n_steps=32):
    """Per-row (512B) async-DMA gather HBM->VMEM, 8-deep pipeline."""
    m, k = 262144, 128
    rng = np.random.default_rng(1)
    B = jnp.asarray(rng.random((m, k), np.float32))
    idx = jnp.asarray(rng.integers(0, m, (n_steps, rows_per_step)).astype(np.int32))
    DEPTH = 8

    def kernel(idx_ref, b_hbm, out_ref, buf, sems):
        def issue(i, slot):
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(idx_ref[i], 1), :], buf.at[slot], sems.at[slot]
            ).start()

        for s in range(DEPTH):
            issue(s, s)

        def body(i, acc):
            slot = i % DEPTH
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(0, 1), :], buf.at[slot], sems.at[slot]
            ).wait()
            acc = acc + buf[slot, 0, :]

            @pl.when(i + DEPTH < rows_per_step)
            def _():
                issue(i + DEPTH, (i + DEPTH) % DEPTH)

            return acc

        acc = jax.lax.fori_loop(0, rows_per_step, body,
                                jnp.zeros((k,), jnp.float32))
        out_ref[0, :] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, rows_per_step), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((8, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, 1, k), jnp.float32),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
    )

    def kernel2(idx_ref, b_hbm, out_ref, buf, sems):
        def issue(i, slot):
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(idx_ref[0, i], 1), :], buf.at[slot], sems.at[slot]
            ).start()

        for s in range(DEPTH):
            issue(s, s)

        def body(i, acc):
            slot = i % DEPTH
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(0, 1), :], buf.at[slot], sems.at[slot]
            ).wait()
            acc = acc + buf[slot, 0, :]

            @pl.when(i + DEPTH < rows_per_step)
            def _():
                issue(i + DEPTH, (i + DEPTH) % DEPTH)

            return acc

        acc = jax.lax.fori_loop(0, rows_per_step, body,
                                jnp.zeros((k,), jnp.float32))
        out_ref[0, :] = acc

    try:
        call = pl.pallas_call(
            kernel2,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, k), jnp.float32),
        )
        f = jax.jit(lambda i, b: call(i, b))
        dt = timed(f, idx, B, iters=3)
        total = rows_per_step * n_steps
        p(f"M3 per-row DMA gather: {total/dt/1e6:.2f} M rows/s "
          f"({total*512/dt/1e9:.1f} GB/s)")
    except Exception as e:
        p(f"M3 failed: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    p(f"device: {jax.devices()}")
    m5_peaks()
    m6_vmem_probe()
    m3_row_dma()
    m2_gather_bw()
    m4_segsum()
    m1_xla_spmm()
    m_ell_fused()
