"""Find (or refute) the panel kernel's winning regime (VERDICT r03 weak #6).

The autotuner's model only proposes `panel` on hub-concentrated column
skew with B-reuse ≥ 2 (bench/autotune.suggest); README admits windowed
usually dominates in practice.  This measures panel vs windowed vs ell
head-to-head on hub graphs across hub concentration, on chip.  If panel
never wins a row, it gets demoted to experiments/.

  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/panel_regime.py
"""
from __future__ import annotations

import subprocess
import sys
import time

CASES = [
    # (m, nnz, n_hub_cols, hub_frac)
    (200_000, 20_000_000, 512, 0.95),
    (200_000, 20_000_000, 512, 0.85),
    (200_000, 20_000_000, 2048, 0.9),
    (50_000, 5_000_000, 256, 0.95),
]


def run_one(idx: int):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np

    from flex_tpu.bench.autotune import suggest
    from flex_tpu.bench.harness import _fmt, bench_spmm
    from flex_tpu.io.synth import hub_graph
    from flex_tpu.reorder import reorder
    from flex_tpu.sparse.device import DeviceCSR

    m, nnz, nh, hf = CASES[idx]
    t0 = time.time()
    g = reorder(hub_graph(m, nnz, n_hub_cols=nh, hub_frac=hf, seed=idx),
                "deg", check=False)
    print(f"case {idx}: m={m} nnz={g.nnz} hub_cols={nh} frac={hf} "
          f"(gen {time.time()-t0:.0f}s)", flush=True)
    dev = DeviceCSR.from_graph(g)
    sug = suggest(g, 128, dev=dev)
    print(f"  autotuner says: {sug.method} ({sug.reason})", flush=True)
    for method in ("panel", "windowed", "ell"):
        kw = {"dev": dev} if method in ("ell", "windowed") else {}
        try:
            r = bench_spmm(g, 128, method=method, iters=8, check=True, **kw)
            print(f"  {method:9s} {_fmt(r)}", flush=True)
        except Exception as e:
            print(f"  {method:9s} refused/failed: {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]))
    else:
        for i in range(len(CASES)):
            subprocess.run([sys.executable, "-u", __file__, "--one",
                            str(i)], timeout=1500)
