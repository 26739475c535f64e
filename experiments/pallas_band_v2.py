"""Pallas band kernel, take 2: one grid step per panel, two aligned B blocks.

v1 (grid (P, J), 128-col chunks, output revisited across J) ran ~70 µs/step.
Here each panel does exactly two MXU dots against two W-aligned B blocks
(any 128-aligned window [s, s+W) lies inside [W·i, W·i + 2W) for
i = s // W), with the band split into left/right halves at format time —
no revisiting, no dynamic slicing inside the kernel.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from flex_tpu.bench.harness import _time_device
from flex_tpu.io import make_features
from flex_tpu.io.synth import banded_graph
from flex_tpu.ops.pallas_band import _band_spmm_xla, prepare_band
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.sparse.device import DeviceCSR
from flex_tpu.utils.check import res_check


def p(s):
    print(s, flush=True)


@functools.partial(jax.jit, static_argnames=("layout",))
def build_split_band(dev_row_ptr, dev_col, dev_vals, iW_rows, *, layout):
    """A_left/A_right [P, TM, W]: nnz at col c of panel p goes left if
    c < W·(i_p+1) at offset c − W·i_p, else right at c − W·(i_p+1)."""
    nnz, P, TM, W = layout
    e = jnp.arange(nnz, dtype=jnp.int32)
    rows = jnp.searchsorted(dev_row_ptr, e, side="right").astype(jnp.int32) - 1
    base = iW_rows[rows] * W
    c_loc = dev_col - base
    is_left = c_loc < W
    flat_panel = (rows // TM) * (TM * W) + (rows % TM) * W
    pos_l = flat_panel + jnp.where(is_left, c_loc, 0)
    pos_r = flat_panel + jnp.where(is_left, 0, c_loc - W)
    left = jnp.zeros((P * TM * W,), jnp.float32).at[pos_l].add(
        jnp.where(is_left, dev_vals, 0.0))
    right = jnp.zeros((P * TM * W,), jnp.float32).at[pos_r].add(
        jnp.where(is_left, 0.0, dev_vals))
    return left.reshape(P, TM, W), right.reshape(P, TM, W)


def make_pallas_v2(P, TM, W, k, m, n, precision):
    def kernel(iW_ref, al_ref, ar_ref, b1_ref, b2_ref, o_ref):
        o_ref[:] = jax.lax.dot(
            al_ref[0], b1_ref[:], precision=precision,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot(
            ar_ref[0], b2_ref[:], precision=precision,
            preferred_element_type=jnp.float32,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, TM, W), lambda p_, iw: (p_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, W), lambda p_, iw: (p_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, k), lambda p_, iw: (iw[p_], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, k), lambda p_, iw: (iw[p_] + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, k), lambda p_, iw: (p_, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P * TM, k), jnp.float32),
    )

    @jax.jit
    def run(iW, a_left, a_right, B):
        n_pad = ((n + W - 1) // W + 2) * W
        B_pad = jnp.zeros((n_pad, k), jnp.float32).at[:n].set(B)
        # B passed twice: one input per B-block spec (left/right windows)
        return call(iW, a_left, a_right, B_pad, B_pad)[:m]

    return run


if __name__ == "__main__":
    p(f"device: {jax.devices()}")
    g = banded_graph(262_144, 256, 64.0, seed=2)
    B = make_features(g, 128)
    Bd = jnp.asarray(B)
    dev = DeviceCSR.from_graph(g)
    plan = prepare_band(g, dev=dev, tm=256, interpret=False)
    P, TM, W = plan.band.shape
    p(f"P={P} TM={TM} W={W}")

    ws_el = np.asarray(plan.ws128, dtype=np.int64) * 128
    iW = (ws_el // W).astype(np.int32)
    iW_rows = jnp.asarray(
        iW[np.minimum(np.arange(g.m) // TM, P - 1)].astype(np.int32))
    a_left, a_right = build_split_band(
        dev.row_ptr, dev.col, dev.vals, iW_rows, layout=(g.nnz, P, TM, W))

    f = make_pallas_v2(P, TM, W, 128, g.m, g.n,
                       jax.lax.Precision.HIGHEST)
    try:
        C = np.asarray(f(jnp.asarray(iW), a_left, a_right, Bd))
        chk = res_check(spmm_scipy(g, B), C, g.degrees)
        dt = _time_device(f, jnp.asarray(iW), a_left, a_right, Bd, iters=10)
        p(f"pallas v2: {dt*1e3:.2f} ms = {2*g.nnz*128/dt/1e9:.1f} GF/s "
          f"err={chk.err_frac:.2e} max={chk.max_err:.2e}")
    except Exception as e:
        p(f"pallas v2 FAILED: {type(e).__name__}: {str(e)[:400]}")

    fx = jax.jit(lambda band, ws128, b: _band_spmm_xla(
        band, ws128, b, m=g.m, n=g.n, w_pad=plan.w_pad,
        precision=jax.lax.Precision.HIGHEST))
    dt = _time_device(fx, plan.band, plan.ws128, Bd, iters=10)
    p(f"xla ref: {dt*1e3:.2f} ms")
