"""On-chip amazon-scale windowed-vs-ELL with the byte-budgeted selection.

Usage: python experiments/bench_amazon_budget.py [budget_gib ...]
Loads /tmp/amazon_posts_rbdeg.npz (see gen_graphs.py).  For each budget
the count gate auto-raises (window_select max_dense_bytes) and the full
hybrid is built + benchmarked + SciPy-checked.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from flex_tpu.utils import enable_compile_cache

enable_compile_cache()

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR
from flex_tpu.bench.harness import bench_spmm, _fmt
from flex_tpu.ops.window_spmm import window_select

d = np.load("/tmp/amazon_posts_rbdeg.npz")
g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                         name="amazon_posts", order="RBD")
print(g, flush=True)
k = 128
dev = DeviceCSR.from_graph(g)

budgets = [float(a) for a in sys.argv[1:]] or [2.0, 4.0]
for b in budgets:
    t0 = time.time()
    sel = window_select(g, tm=256, W=128, min_count=64, dev=dev,
                        max_dense_bytes=int(b * (1 << 30)))
    print(f"budget={b}GiB: mc_eff={sel['min_count_eff']} "
          f"coverage={sel['coverage']:.3f} "
          f"dense={sel['dense_bytes']/1e9:.2f}GB steps={sel['total_steps']} "
          f"select={time.time()-t0:.1f}s", flush=True)
    try:
        r = bench_spmm(g, k, method="windowed", iters=5, check=True, dev=dev,
                       min_count=64, sel=sel, tm=256, W=128,
                       max_dense_bytes=int(b * (1 << 30)))
        print(_fmt(r), r.extra, flush=True)
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {e}", flush=True)
