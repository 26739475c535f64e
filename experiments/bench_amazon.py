"""Amazon-scale (264M nnz) windowed vs ELL on the co-purchase proxy.

Usage: python experiments/bench_amazon.py [mc ...]
Loads /tmp/amazon_posts_rbdeg.npz (see gen_graphs.py).
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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

mcs = [int(a) for a in sys.argv[1:]] or [256]
for mc in mcs:
    t0 = time.time()
    sel = window_select(g, tm=256, W=128, min_count=mc, dev=dev)
    print(f"mc={mc}: coverage={sel['coverage']:.3f} "
          f"dense={sel['dense_bytes']/1e9:.2f}GB steps={sel['total_steps']} "
          f"select={time.time()-t0:.1f}s", flush=True)
    if sel["dense_bytes"] > (6 << 30):
        print("  too big, skipping bench", flush=True)
        continue
    r = bench_spmm(g, k, method="windowed", iters=5, check=True, dev=dev,
                   min_count=mc, sel=sel, tm=256, W=128)
    print(_fmt(r), r.extra, flush=True)

r = bench_spmm(g, k, method="ell", iters=5, check=True, dev=dev)
print(_fmt(r), r.extra, flush=True)
