"""Host-only budgeted window selection at full amazon scale.

Validates the byte-budgeted selection path (window_select with
max_dense_bytes, host-bincount histogram, shared O(nnz) key pass) at
264M nnz WITHOUT a TPU: prints the budget -> (mc_eff, coverage,
dense_bytes, total_steps, select wall time) frontier that the on-chip
run (bench_amazon_budget.py) then executes.

Usage: python experiments/amazon_select_host.py [budget_gib ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from flex_tpu.ops.window_spmm import window_select
from flex_tpu.sparse.csr import CSRGraph

t0 = time.time()
d = np.load("/tmp/amazon_posts_rbdeg.npz")
g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                         name="amazon_posts", order="RBD")
print(f"{g}  load={time.time()-t0:.1f}s", flush=True)

budgets = [float(a) for a in sys.argv[1:]] or [1.0, 2.0, 4.0, 6.0]
for b in budgets:
    t1 = time.time()
    sel = window_select(g, tm=256, W=128, min_count=64,
                        max_dense_bytes=int(b * (1 << 30)))
    print(f"budget={b:4.1f}GiB  mc_eff={sel['min_count_eff']:4d}  "
          f"coverage={sel['coverage']:.3f}  "
          f"dense={sel['dense_bytes']/2**30:.2f}GiB  "
          f"steps={sel['total_steps']}  n_res={sel['n_res']}  "
          f"unique={sel['unique_rc']}  select={time.time()-t1:.1f}s",
          flush=True)
