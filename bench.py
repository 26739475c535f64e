"""Headline benchmark for the driver.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "GFLOP/s", "vs_baseline": N}

Config: Reddit-scale SpMM (BASELINE.json config 3) — 232,965 rows,
23.4M nnz (R-MAT stand-in; the real reddit.csv is not in-tree), k=128,
DEG ordering, ELL kernel on the attached TPU chip.  Baseline =
ASpT on H100, Reddit k=128: 1237.25 GFLOP/s (BASELINE.md; recorded there
with ~99% wrong outputs — ours validates at err=0).
All progress chatter goes to stderr; stdout stays one line.
"""
from __future__ import annotations

import json
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


BASELINE_GFLOPS = 1237.25  # ASpT H100 Reddit k=128 (README.md:39)


def main() -> None:
    t_start = time.time()
    import jax

    # Persistent compile cache: tPre is otherwise dominated by the first
    # remote compile of the format-build kernel.
    jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np

    from flex_tpu.bench.harness import bench_spmm
    from flex_tpu.io.synth import rmat_graph
    from flex_tpu.reorder import reorder

    k = 128
    log("generating reddit-scale R-MAT (233K rows, 23.4M nnz)...")
    g = rmat_graph(232_965, 23_446_803, seed=1, name="reddit_like")
    log(f"graph: {g}")
    log("applying DEG ordering...")
    g = reorder(g, "deg", check=False)

    log("running ELL SpMM bench (k=128)...")
    r = bench_spmm(g, k, method="ell", iters=5, check=True)
    log(
        f"tPre={r.t_pre:.2f}s tElap={r.t_elap*1e3:.1f}ms "
        f"gflops={r.gflops:.1f} pre/elap={r.pre_ratio:.2f} "
        f"err_frac={r.check.err_frac if r.check else None} "
        f"extra={r.extra} total_wall={time.time()-t_start:.0f}s"
    )
    if r.check is not None and r.check.err_frac > 1e-4:
        log("WARNING: result check failed; reporting 0")
        value = 0.0
    else:
        value = round(r.gflops, 2)

    print(json.dumps({
        "metric": "spmm_effective_gflops_reddit_like_k128",
        "value": value,
        "unit": "GFLOP/s",
        "vs_baseline": round(value / BASELINE_GFLOPS, 4),
    }))


if __name__ == "__main__":
    main()
