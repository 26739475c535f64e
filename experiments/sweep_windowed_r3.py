"""Round-3 (tm, W, mc, G, step_order) sweep of the windowed hybrid on the
headline graph (VERDICT r02 item 3: cut the residue; item 4: step-order).

One plan resident at a time (multiple dense arrays degrade tElap ~1.6x —
docs/measurements.md).  Prints one line per config + residue/dense split.

  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/sweep_windowed_r3.py
"""
from __future__ import annotations

import gc
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from flex_tpu.bench.harness import _sync, _time_device
from flex_tpu.ops.window_spmm import prepare_windowed
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR

CONFIGS = [
    # (tm, W, mc, G, step_order, max_dense_bytes)
    # round 2 of the sweep: the 6 GB dense cap (set when the build had a
    # transient copy, since removed) was the binding constraint at mc<64;
    # probe the capacity frontier + the finer tm granularity
    (256, 128, 56, 4, "row", 8 << 30),
    (256, 128, 48, 4, "row", 9 << 30),
    (128, 128, 32, 4, "row", 6 << 30),
    (128, 128, 24, 4, "row", 8 << 30),
    # round 3 of the sweep: taller panels — same mc over 2x rows keeps
    # more windows per byte; per-step (512,512)x(512,128) MXU dot
    (512, 128, 64, 4, "row", 6 << 30),
    (512, 128, 96, 4, "row", 6 << 30),
]


def main():
    d = np.load("/tmp/reddit_posts_rbdeg_v3.npz")
    g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                             name="reddit_posts", order="RBD")
    k = 128
    dev = DeviceCSR.from_graph(g)
    _sync(dev.vals)
    B = jnp.asarray(np.random.default_rng(0).standard_normal(
        (g.n, k), dtype=np.float32))
    print(f"graph {g}; k={k}", flush=True)

    for tm, W, mc, gs, so, cap in CONFIGS:
        tag = f"tm={tm} W={W} mc={mc} G={gs} so={so}"
        try:
            t0 = time.time()
            plan = prepare_windowed(g, dev=dev, tm=tm, W=W, min_count=mc,
                                    g_step=gs, step_order=so,
                                    max_dense_bytes=cap)
            _sync(plan.__dict__)
            t_pre_cold = time.time() - t0
            _sync(plan(B))  # compile
            t_elap = _time_device(plan, B, iters=20)
            t_res = _time_device(plan.ell, B, iters=20) \
                if plan.ell.nnz else 0.0
            gf = 2 * g.nnz * k / t_elap / 1e9
            print(f"{tag}: tElap={t_elap*1e3:6.1f}ms ({gf:5.1f} GF/s) "
                  f"res={t_res*1e3:6.1f}ms cov={plan.coverage:.3f} "
                  f"steps={plan.A.shape[0]} preCold={t_pre_cold:.1f}s",
                  flush=True)
            del plan
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
        gc.collect()


if __name__ == "__main__":
    main()
