"""Produce the reference-style full sweep table (flex.cu run() analog):
6 orderings x 6 methods x tm {128,256} on a mid-size community graph,
CSV artifact for docs/.  Usage: python experiments/sweep_artifact.py [out.csv]
"""
import sys

import jax

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from flex_tpu.bench.harness import sweep
from flex_tpu.io.synth import bipartite_projection_graph

out = sys.argv[1] if len(sys.argv) > 1 else "docs/sweep_reddit_posts_small.csv"
# reddit_posts process scaled to ~6M nnz (same clustering regime)
g = bipartite_projection_graph(60_000, 6_000_000, n_comm=12, seed=0,
                               name="rp_small")
results = sweep(
    g, ks=(128,),
    orders=("ovo", "deg", "rcm", "dfs", "gorder", "rabbit", "rbdeg"),
    methods=("xla", "ell", "panel", "band", "windowed", "gespmm"),
    tms=(128, 256), csv_path=out, check=True, iters=5,
)
best = max((r for r in results if r.check and r.check.ok),
           key=lambda r: r.gflops)
print(f"wrote {out}; best: {best.order}/{best.method} "
      f"{best.gflops:.1f} GF/s")
