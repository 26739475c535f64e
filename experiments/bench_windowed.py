"""Measure the windowed hybrid vs ELL on reddit_posts (rbdeg-ordered).

Uses the cached /tmp npz graphs to skip the 20-60s generation/ordering.
"""
import sys
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.bench.harness import bench_spmm, _fmt

which = sys.argv[1] if len(sys.argv) > 1 else "rbdeg"
d = np.load(f"/tmp/reddit_posts_{which}.npz")
g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                         name="reddit_posts", order=which.upper())
k = 128

for spec in sys.argv[2:]:
    parts = dict(p.split("=") for p in spec.split(",") if "=" in p)
    method = spec.split(",")[0]
    kw = {}
    if method == "windowed":
        kw = dict(tm=int(parts.get("tm", 256)), W=int(parts.get("W", 256)),
                  J=int(parts.get("J", 16)),
                  min_count=int(parts.get("mc", 128)),
                  impl=parts.get("impl", "pallas"))
        if "bdt" in parts:
            kw["b_dtype"] = parts["bdt"]
    elif method == "ell" and "bdt" in parts:
        kw = dict(b_dtype=parts["bdt"])
    t0 = time.time()
    r = bench_spmm(g, k, method=method, iters=int(parts.get("iters", 10)),
                   check=parts.get("check", "1") != "0", **kw)
    print(_fmt(r), f"wall={time.time()-t0:.0f}s", r.extra, flush=True)
