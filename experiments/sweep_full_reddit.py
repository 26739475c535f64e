"""Full-size reference-style sweep artifact (VERDICT r02 item 6): the
headline graph at FULL size (23.4M nnz), orderings x methods, k=128,
every config SciPy-checked, refusals recorded — the analog of the
reference's run() grid at real scale (flex.cu:4695-4825).

Writes docs/sweep_reddit_posts_full.csv.

  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/sweep_full_reddit.py
"""
import sys
import time

import jax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from flex_tpu.bench.harness import _fmt, _sync, bench_spmm, write_csv
from flex_tpu.io.csv_loader import make_features
from flex_tpu.ops import ref as _ref
from flex_tpu.reorder import reorder
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR

K = 128
METHODS = ("xla", "bcoo", "ell", "windowed", "band", "panel")


def main():
    d = np.load("/tmp/reddit_posts_rbdeg_v3.npz")
    g_rbd = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                                 name="reddit_posts", order="RBD")
    variants = [("rbdeg", g_rbd), ("deg", reorder(g_rbd, "deg", check=False))]

    results = []
    for order, g in variants:
        dev = DeviceCSR.from_graph(g)
        _sync(dev.vals)
        B = make_features(g, K)
        t0 = time.time()
        gold = _ref.spmm_scipy(g, B)
        print(f"[{order}] gold in {time.time()-t0:.0f}s", flush=True)
        for method in METHODS:
            kw = {"dev": dev} if method in ("ell", "band", "windowed",
                                            "gespmm", "bcoo") else {}
            try:
                r = bench_spmm(g, K, method=method, iters=10, check=True,
                               B=B, gold=gold, **kw)
            except Exception as e:
                from flex_tpu.bench.harness import BenchResult

                r = BenchResult(
                    graph=g.name, order=order, method=method, k=K,
                    m=g.m, nnz=g.nnz, t_pre=0.0, t_elap=float("inf"),
                    gflops=0.0, pre_ratio=0.0, check=None,
                    extra={"error": f"{type(e).__name__}: {e}"[:160]})
            r.order = order
            print(_fmt(r), flush=True)
            results.append(r)
        del dev
    write_csv(results, "docs/sweep_reddit_posts_full.csv")
    print("wrote docs/sweep_reddit_posts_full.csv", flush=True)


if __name__ == "__main__":
    main()
