"""A/B the windowed format-build variants for tPre (VERDICT r04 next #3:
get pre/elap < 10 on the headline config; r04 shipped fused=True without
ever measuring the scatter-assembled variants at scale).

Variants (ops/window_spmm.prepare_windowed `fused=`):
  True       dense scatter + residue compaction scatter + pack gather +
             per-bucket slice assembly, one program (the shipped default)
  'scatter'  dense scatter + ONE packed [nnz, 2] (col,val) scatter into
             the padded ELL layout
  'scatter2' ONE combined no-drop value scatter (dense prefix + ELL
             suffix) + one dropped col scatter; A sliced out of the
             combined buffer (~11 ms copy at 6 GB)
  False      two-program fallback (build + ell metadata dispatch)

Each variant: cold pass (compile + table upload), then 3 timed WARM
prepares (the tPre convention), result correctness vs the fused build
via res_check on one SpMM call.

PYTHONPATH=/root/repo:$PYTHONPATH python experiments/tpre_variants.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

from flex_tpu.utils import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from flex_tpu.bench.harness import _sync
from flex_tpu.ops.window_spmm import prepare_windowed, window_select
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR

GiB = 1 << 30


def main():
    d = np.load("/tmp/reddit_posts_rbdeg_v3.npz")
    g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                             name="reddit_posts", order="RBD")
    dev = DeviceCSR.from_graph(g)
    _sync((dev.row_ptr, dev.col, dev.vals))
    k = 128
    # shared selection (the autotuner's pass) so every variant's timed
    # prepare ships nothing
    sel = window_select(g, tm=256, W=128, min_count=64, dev=dev,
                        max_dense_bytes=6 * GiB)
    print(f"selection: cov={sel['coverage']:.4f} steps={sel['total_steps']}"
          f" n_res={sel['n_res']}", flush=True)

    B = jnp.asarray((2 * np.random.default_rng(0).random(
        (g.n, k)) - 1).astype(np.float32))
    gold = None
    for fused in (True, "scatter", "scatter2", False):
        try:
            t0 = time.time()
            plan = prepare_windowed(g, dev=dev, min_count=64,
                                    max_dense_bytes=6 * GiB, sel=sel,
                                    fused=fused)
            _sync(plan.__dict__)
            cold = time.time() - t0
            ts = []
            for _ in range(3):
                del plan
                t0 = time.time()
                plan = prepare_windowed(g, dev=dev, min_count=64,
                                        max_dense_bytes=6 * GiB, sel=sel,
                                        fused=fused)
                _sync(plan.__dict__)
                ts.append(time.time() - t0)
            out = np.asarray(plan(B))
            if gold is None:
                gold = out
                agree = "ref"
            else:
                agree = f"maxdiff={np.abs(out - gold).max():.2e}"
            print(f"fused={fused!s:9s} cold={cold:6.1f}s "
                  f"warm tPre={min(ts):.3f}s (all {['%.3f' % t for t in ts]})"
                  f" {agree}", flush=True)
            del plan
        except Exception as e:
            print(f"fused={fused!s:9s} FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
