"""Multi-dataset headline table (the reference README's table analog):
each graph at its calibrated community proxy, rbdeg-ordered, autotuned
method, k=128, SciPy-checked.  Writes docs/headline_table.csv.

Usage: python experiments/bench_table.py [graph ...]
Graphs come from /tmp/<name>_rbdeg.npz caches (gen_graphs.py), plus the
real in-tree pubmed.csv.
"""
import sys

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from flex_tpu.bench.autotune import suggest
from flex_tpu.bench.harness import bench_spmm, write_csv, _fmt
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR

names = sys.argv[1:] or ["pubmed", "flickr_posts", "yelp_comm",
                         "reddit_posts"]
results = []
for name in names:
    if name == "pubmed":
        from flex_tpu.io import load_csv
        from flex_tpu.reorder import reorder

        g = reorder(load_csv("/root/reference/data/pubmed.csv"), "rbdeg",
                    check=False)
    else:
        d = np.load(f"/tmp/{name}_rbdeg.npz")
        g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                                 name=name, order="RBD")
    dev = DeviceCSR.from_graph(g)
    sug = suggest(g, 128, dev=dev)
    kw = dict(sug.prep_kwargs)
    kw.pop("sel", None)  # timed prepare must redo all host work
    if sug.method in ("ell", "band", "windowed"):
        kw["dev"] = dev  # only these preparers take the resident CSR
    print(f"{name}: auto -> {sug.method} ({sug.reason})", flush=True)
    r = bench_spmm(g, 128, method=sug.method, iters=10, check=True, **kw)
    r.extra["auto"] = sug.method
    print(_fmt(r), r.extra.get("model_gb"), flush=True)
    results.append(r)

write_csv(results, "docs/headline_table.csv")
print("wrote docs/headline_table.csv", flush=True)
