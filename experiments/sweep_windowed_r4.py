"""Round-4 coverage-frontier sweep (VERDICT r03 item 2).

The residue ELL is ~36 of 52.8 ms at coverage 0.81 (mc=64, 6 GB dense
cap); every point of coverage moves nnz from the ~210 M rows/s gather
bound to the ~0.34 µs/window MXU path.  The chunked dense-A build
(window_spmm._plan_build_chunks) dropped build peak HBM from 2·dense to
dense + ~2.3 GB, so the capacity frontier now extends to ~10 GB dense.

Axes: mc ∈ {16..64}, W=64 with G=8 (same GW=512 dot, finer occupancy
granularity), tm ∈ {128, 256, 512}, capacity ≤ 11 GB (expect the 11 GB
row to probe the OOM edge).  Also times the k=32 transposed kernel
(VERDICT item 4) against the row-major lane-padded one.

  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/sweep_windowed_r4.py
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

# (k, transposed, tm, W, mc, G, max_dense_bytes)
CONFIGS = [
    # k=128 capacity/coverage frontier
    (128, False, 256, 128, 64, 4, 6 << 30),    # r3 headline baseline
    (128, False, 256, 128, 48, 4, 10 << 30),
    (128, False, 256, 128, 40, 4, 10 << 30),
    (128, False, 256, 128, 32, 4, 11 << 30),   # OOM-edge probe
    # W=64 windows: half the bytes per window, same GW=512 dot
    (128, False, 256, 64, 32, 8, 8 << 30),
    (128, False, 256, 64, 24, 8, 10 << 30),
    (128, False, 256, 64, 16, 8, 11 << 30),
    # tall panels at the bigger budget
    (128, False, 512, 128, 48, 4, 10 << 30),
    (128, False, 128, 128, 32, 4, 10 << 30),
    # k=32: transposed vs row-major at matched selections
    (32, False, 256, 128, 64, 4, 6 << 30),
    (32, True, 256, 128, 64, 4, 6 << 30),
    (32, True, 256, 128, 40, 4, 10 << 30),
    (32, True, 256, 64, 24, 8, 10 << 30),
    # k=128 transposed cross-check (is the transposed layout free at 128?)
    (128, True, 256, 128, 64, 4, 6 << 30),
]


def run_one(idx: int):
    """One config in THIS process (fresh-process isolation: after any
    RESOURCE_EXHAUSTED the relay keeps failing subsequent allocations in
    the same process — measured cascade in the first sweep run)."""
    d = np.load("/tmp/reddit_posts_rbdeg_v3.npz")
    g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                             name="reddit_posts", order="RBD")
    dev = DeviceCSR.from_graph(g)
    _sync(dev.vals)
    rng = np.random.default_rng(0)
    Bs = {k: jnp.asarray(rng.standard_normal((g.n, k), dtype=np.float32))
          for k in sorted({c[0] for c in CONFIGS})}
    print(f"graph {g}", flush=True)

    rows = []
    for k, tr, tm, W, mc, gs, cap in [CONFIGS[idx]]:
        tag = (f"k={k} T={int(tr)} tm={tm} W={W} mc={mc} G={gs} "
               f"cap={cap >> 30}G")
        B = Bs[k]
        try:
            t0 = time.time()
            plan = prepare_windowed(g, dev=dev, tm=tm, W=W, min_count=mc,
                                    g_step=gs, max_dense_bytes=cap,
                                    transposed=tr)
            _sync(plan.__dict__)
            t_pre_cold = time.time() - t0
            # free plan #1 BEFORE re-preparing: holding two plans peaks
            # at 2x dense + build temp (the 10 GB configs need 22 GB)
            del plan
            gc.collect()
            t0 = time.time()
            plan = prepare_windowed(g, dev=dev, tm=tm, W=W, min_count=mc,
                                    g_step=gs, max_dense_bytes=cap,
                                    transposed=tr)
            _sync(plan.__dict__)
            t_pre = time.time() - t0
            _sync(plan(B))  # compile
            t_elap = _time_device(plan, B, iters=20)
            t_res = _time_device(plan.ell, B, iters=20) \
                if plan.ell.nnz else 0.0
            gf = 2 * g.nnz * k / t_elap / 1e9
            st = plan.stats
            print(f"{tag}: tElap={t_elap*1e3:6.1f}ms ({gf:6.1f} GF/s) "
                  f"res={t_res*1e3:6.1f}ms cov={plan.coverage:.3f} "
                  f"mc_eff={st['min_count_eff']} "
                  f"dense={st['dense_bytes']/2**30:.1f}G "
                  f"steps={st['n_steps']} tPre={t_pre:.2f}s "
                  f"(cold {t_pre_cold:.0f}s)", flush=True)
            rows.append((tag, gf, t_elap, t_res, plan.coverage,
                         st["dense_bytes"], t_pre))
            del plan
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
        gc.collect()

def main():
    import subprocess
    import sys

    for i in range(len(CONFIGS)):
        subprocess.run([sys.executable, "-u", __file__, "--one", str(i)],
                       timeout=1200)


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]))
    else:
        main()
