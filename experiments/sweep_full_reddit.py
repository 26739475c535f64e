"""Round-3: reference-style sweep at FULL reddit scale (23.4M nnz).

The checked-in full-grid artifact (docs/sweep_reddit_posts_small.csv)
covers a 6M-nnz graph; this runs the same harness sweep on the full-size
reddit_posts proxy with a reduced grid (3 orderings x 4 methods, k=128,
tm=256) sized for one chip session — every config SciPy-checked,
refusals recorded as rows (the reference's run() prints every config,
flex.cu:4695-4825).

  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/sweep_full_reddit.py
"""
from __future__ import annotations

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from flex_tpu.bench.harness import sweep
from flex_tpu.io.synth import reddit_posts


def main():
    g = reddit_posts(seed=0)
    print(f"graph {g}", flush=True)
    sweep(
        g,
        ks=(128,),
        orders=("ovo", "deg", "rbdeg"),
        methods=("xla", "bcoo", "ell", "windowed"),
        tms=(256,),
        csv_path="docs/sweep_reddit_posts_full.csv",
        iters=5,
    )


if __name__ == "__main__":
    main()
