"""Proxy-risk bounding study (VERDICT r03 item 7 / missing #3).

Five of six headline graphs are construction-calibrated synthetic
proxies (io/synth.py) — no egress means the real CSVs can't be fetched.
This study bounds the risk that the headline number is an artifact of
one lucky generator draw: perturb the reddit_posts generator ±20% on
its structural knobs (cross-community rate ≙ clustering/homophily,
popularity tail ≙ degree skew), shuffle vertex ids (a different rbdeg
ordering problem), and run the SAME autotuned pipeline on each.  Also
runs the headline method on `uniform_graph` at the same size to record
the honest collapse when there is no community structure at all.

Outputs one line per variant: chosen method, coverage, GF/s, err.
Run on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/robustness_proxy.py
"""
from __future__ import annotations

import gc
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from flex_tpu.bench.autotune import suggest
from flex_tpu.bench.harness import _sync, _time_device
from flex_tpu.io.synth import bipartite_projection_graph, uniform_graph
from flex_tpu.ops.window_spmm import prepare_windowed
from flex_tpu.ops.ell_spmm import prepare_ell
from flex_tpu.reorder import reorder
from flex_tpu.sparse.device import DeviceCSR

K = 128
BASE = dict(n=232_965, nnz=23_446_803, n_comm=41, cross=0.128,
            act_mean=6.0, act_sigma=0.9, act_max=256, pop_sigma=1.5)

VARIANTS = [
    ("baseline seed0", dict(BASE), 0),
    ("seed7 redraw", dict(BASE), 7),
    ("cross +20% (less clustered)", dict(BASE, cross=0.154), 1),
    ("cross -20% (more clustered)", dict(BASE, cross=0.102), 2),
    ("pop_sigma +20% (heavier tail)", dict(BASE, pop_sigma=1.8), 3),
    ("pop_sigma -20% (flatter degrees)", dict(BASE, pop_sigma=1.2), 4),
    ("act_sigma +20%", dict(BASE, act_sigma=1.08), 5),
]


def run_variant(tag, g, dev):
    # In-harness-safe config (docs/measurements.md round-4): the mc=48 /
    # 8 GiB frontier OOMs whenever the process holds extra residency
    # (measured again here: the very first variant died at plan build).
    # The study compares variants, so one fixed safe config is also the
    # methodologically right choice.
    sug = suggest(g, K, dev=dev, win_min_count=64,
                  max_dense_bytes=6 << 30)
    kw = dict(sug.prep_kwargs)
    if sug.method == "windowed":
        plan = prepare_windowed(g, dev=dev, **kw)
    else:
        plan = prepare_ell(g, dev=dev)
    _sync(plan.__dict__)
    B = jnp.asarray(np.random.default_rng(0).standard_normal(
        (g.n, K), dtype=np.float32) * 0.1)
    _sync(plan(B))
    t = _time_device(plan, B, iters=10)
    gf = 2 * g.nnz * K / t / 1e9
    cov = getattr(plan, "coverage", float("nan"))
    # spot result check on 2048 random rows vs SciPy
    import scipy.sparse as sp

    from flex_tpu.utils.check import res_check

    rows = np.sort(np.random.default_rng(1).choice(g.m, 2048,
                                                   replace=False))
    A = sp.csr_matrix((np.asarray(g.vals), np.asarray(g.col),
                       np.asarray(g.row_ptr)), shape=(g.m, g.n))
    gold = A[rows] @ np.asarray(B)
    C = np.asarray(plan(B))[rows]
    chk = res_check(gold, C, g.degrees[rows])
    print(f"{tag}: method={sug.method} cov={cov:.3f} "
          f"tElap={t*1e3:.1f}ms gf={gf:.1f} err={chk.err_frac:.2g}",
          flush=True)
    del plan
    gc.collect()
    return gf, sug.method


def _gen_variant(seed: int, kw: dict):
    """Generate + rbdeg-order one variant, cached to /tmp so the CPU gen
    can run ahead of (and in parallel with) the TPU bench pass."""
    import os

    from flex_tpu.sparse.csr import CSRGraph

    kw = dict(kw)
    n, nnz = kw.pop("n"), kw.pop("nnz")
    cache = f"/tmp/reddit_var_{seed}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        return CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                                    name=f"reddit_var_{seed}", order="RBD")
    g = bipartite_projection_graph(n, nnz, seed=seed,
                                   name=f"reddit_var_{seed}", **kw)
    g = reorder(g, "rbdeg", check=False)
    np.savez(cache, row_ptr=np.asarray(g.row_ptr),
             col=np.asarray(g.col), vals=np.asarray(g.vals))
    return g


def _load_uniform():
    import os

    from flex_tpu.sparse.csr import CSRGraph

    cache = "/tmp/reddit_var_uniform.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        return CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                                    name="uniform", order="RBD")
    g = uniform_graph(232_965, 23_446_803, seed=0)
    g = reorder(g, "rbdeg", check=False)
    np.savez(cache, row_ptr=np.asarray(g.row_ptr),
             col=np.asarray(g.col), vals=np.asarray(g.vals))
    return g


def _run_one(idx: int):
    """One variant in this process (index into VARIANTS, or len() for
    the uniform collapse row).  One process per variant because a TPU
    OOM poisons every later allocation in the process
    (docs/measurements.md round-4 sweep lessons)."""
    if idx == len(VARIANTS):
        tag, g = "uniform (no structure)", _load_uniform()
    else:
        tag, kw, seed = VARIANTS[idx]
        g = _gen_variant(seed, kw)
    dev = DeviceCSR.from_graph(g)
    _sync(dev.vals)
    run_variant(tag, g, dev)


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only == "--one":
        _run_one(int(sys.argv[2]))
        return
    if only == "--gen-only":
        for tag, kw, seed in VARIANTS:
            t0 = time.time()
            _gen_variant(seed, kw)
            print(f"[gen {tag}: {time.time()-t0:.0f}s]", flush=True)
        _load_uniform()
        print("[gen uniform done]", flush=True)
        return

    # driver mode: one subprocess per variant, collect the printed rows
    import os
    import re
    import subprocess

    gfs = []
    for idx in range(len(VARIANTS) + 1):
        cmd = [sys.executable, __file__, "--one", str(idx)]
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=1800, env=os.environ)
        sys.stdout.write(p.stdout)
        if p.returncode != 0:
            print(f"[variant {idx} rc={p.returncode}] "
                  f"{p.stderr.strip().splitlines()[-1] if p.stderr else ''}",
                  flush=True)
            continue
        m = re.search(r"gf=([0-9.]+)", p.stdout)
        if m and idx < len(VARIANTS):
            gfs.append(float(m.group(1)))
    if gfs:
        print(f"\nheadline family: min={min(gfs):.1f} max={max(gfs):.1f} "
              f"GF/s (spread {(max(gfs)-min(gfs))/max(gfs)*100:.0f}%)",
              flush=True)


if __name__ == "__main__":
    main()
