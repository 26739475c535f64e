"""Isolate the windowed kernel's per-step cost: precision, G (windows per
step), and DMA/MXU overlap.  Synthetic step-major format, real shapes."""
import functools
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

m, k, W, TM = 232_965, 128, 128, 256
nblk = -(-m // W)
rng = np.random.default_rng(0)
# device-side generation: a host-built A would crawl through the 35 MB/s
# upload tunnel (docs/measurements.md)
B_pad = jax.jit(lambda: jax.random.uniform(
    jax.random.PRNGKey(0), ((nblk + 1) * W, k), jnp.float32))()


def run(G, S, precision, steps_per_panel=4):
    A = jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(1), (S, TM, G * W), jnp.float32))()
    n_panels = S // steps_per_panel
    out_panel = jnp.asarray(
        np.repeat(np.arange(n_panels, dtype=np.int32), steps_per_panel))
    first = jnp.asarray(
        (np.arange(S) % steps_per_panel == 0).astype(np.int32))
    win = jnp.asarray(rng.integers(0, nblk, S * G).astype(np.int32))

    def kernel(first_ref, panel_ref, win_ref, a_ref, *refs):
        b_refs, o_ref = refs[:-1], refs[-1]
        s = pl.program_id(0)

        @pl.when(first_ref[s] == 1)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        bcat = jnp.concatenate([b[:] for b in b_refs], axis=0)
        o_ref[:] += jax.lax.dot(a_ref[0], bcat, precision=precision,
                                preferred_element_type=jnp.float32)

    def b_spec(gi):
        return pl.BlockSpec((W, k), lambda s, f, op, ws, gi=gi:
                            (ws[s * G + gi], 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[pl.BlockSpec((1, TM, G * W), lambda s, f, op, ws: (s, 0, 0),
                               memory_space=pltpu.VMEM),
                  *[b_spec(gi) for gi in range(G)]],
        out_specs=pl.BlockSpec((TM, k), lambda s, f, op, ws: (op[s], 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_panels * TM, k), jnp.float32),
    )
    f = jax.jit(lambda *a: call(*a))
    dt = _time_device(f, first, out_panel, win, A, *([B_pad] * G), iters=10)
    flops = 2 * S * TM * G * W * k
    dma = S * (TM * G * W * 4 + G * W * k * 4)
    print(f"G={G} S={S} {precision:>8s}: {dt*1e3:7.2f} ms "
          f"{dt/S*1e6:6.2f} us/step  mxu={flops/dt/1e12:5.1f} TF/s "
          f"dma={dma/dt/1e9:5.0f} GB/s", flush=True)


for G in (4, 8):
    S = 28000 // G
    for prec in ("highest", "default"):
        run(G, S, prec)
# no-accumulate variant: every step its own panel (no revisit dependency)
for G in (4,):
    run(G, 28000 // G, "highest", steps_per_panel=1)
