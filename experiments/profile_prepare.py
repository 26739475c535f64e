"""Round-3: instrument the warm windowed prepare at reddit scale.

Measures the stage breakdown of the new 2-scatter build + device-meta ELL
residue path (VERDICT r02 item 2: budget <= 0.6 s warm) and the headline
tElap, with the autotuner's selection tables reused.

  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/profile_prepare.py
"""
from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from flex_tpu.bench.autotune import suggest
from flex_tpu.bench.harness import _sync, _time_device
from flex_tpu.ops.ell_spmm import prepare_ell_device
from flex_tpu.ops.window_spmm import (
    _build_windowed, prepare_windowed, sel_device_tables, window_select,
)
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR


def main():
    d = np.load("/tmp/reddit_posts_rbdeg_v3.npz")
    g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                             name="reddit_posts", order="RBD")
    k = 128
    print(f"graph {g}", flush=True)

    t0 = time.time()
    dev = DeviceCSR.from_graph(g)
    _sync(dev.vals)
    print(f"upload: {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    sel = window_select(g, dev=dev)
    print(f"window_select (hist+host tables): {time.time()-t0:.2f}s "
          f"coverage={sel['coverage']:.3f} steps={sel['total_steps']}",
          flush=True)
    t0 = time.time()
    tabs = sel_device_tables(sel)
    _sync(tabs)
    print(f"sel table upload: {time.time()-t0:.2f}s", flush=True)

    # cold pass (compiles)
    t0 = time.time()
    plan = prepare_windowed(g, dev=dev, sel=sel)
    _sync(plan.__dict__)
    print(f"cold prepare: {time.time()-t0:.1f}s", flush=True)
    B = jnp.asarray(np.random.default_rng(0).standard_normal(
        (g.n, k), dtype=np.float32))
    t0 = time.time()
    _sync(plan(B))
    print(f"cold call: {time.time()-t0:.1f}s", flush=True)
    del plan

    # warm stages (two-program path)
    layout = (g.nnz, g.m, 256, 128, sel["nblk"], sel["n_res"],
              sel["total_steps"], sel["G"], sel.get("unique_rc", False))
    for rep in range(2):
        t0 = time.time()
        A, res_col, res_vals, res_rp_dev = _build_windowed(
            dev.row_ptr, dev.col, dev.vals, tabs["slot"], tabs["pstep0"],
            layout=layout)
        _sync(res_rp_dev)
        t_build = time.time() - t0
        t0 = time.time()
        rp_host = np.asarray(res_rp_dev).astype(np.int64)
        t_d2h = time.time() - t0
        t0 = time.time()
        ell = prepare_ell_device(res_rp_dev, res_col, res_vals, m=g.m,
                                 nnz=sel["n_res"], res_row_ptr_host=rp_host)
        _sync(ell.buckets)
        t_ell = time.time() - t0
        print(f"[warm {rep}] build={t_build:.2f}s d2h={t_d2h:.2f}s "
              f"ell={t_ell:.2f}s total={t_build+t_d2h+t_ell:.2f}s",
              flush=True)
        del A, res_col, res_vals, res_rp_dev, ell

    # full warm prepare + timed call, both build modes (fused = default:
    # one XLA program for dense A + residue compaction + ELL buckets)
    plan = None
    for fused in (False, "scatter", "scatter", "scatter2", "scatter2",
                  True, True):
        if plan is not None:
            del plan
        t0 = time.time()
        plan = prepare_windowed(g, dev=dev, sel=sel, fused=fused)
        _sync(plan.__dict__)
        t_pre = time.time() - t0
        name = {False: "two-program", True: "fused-slices",
                "scatter": "fused-scatter",
                "scatter2": "fused-scatter2"}[fused]
        print(f"warm tPre ({name}) = {t_pre:.2f}s", flush=True)
    t_elap = _time_device(plan, B, iters=20)
    gf = 2 * g.nnz * k / t_elap / 1e9
    print(f"tElap={t_elap*1e3:.1f}ms {gf:.1f} GF/s "
          f"pre/elap={t_pre/t_elap:.1f}", flush=True)

    if "--check" in sys.argv:
        from flex_tpu.ops.ref import spmm_scipy
        from flex_tpu.utils.check import res_check

        Bh = np.asarray(B)
        print(res_check(spmm_scipy(g, Bh), np.asarray(plan(B)), g.degrees),
              flush=True)


if __name__ == "__main__":
    main()
