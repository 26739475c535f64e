"""Generate + order the headline proxy graphs, cached as /tmp npz.

Usage: python experiments/gen_graphs.py [graph ...] [order ...]
Defaults: reddit_posts reddit_comm x rbdeg deg.  CPU-only (forces the cpu
platform so it can run alongside a TPU-attached process).
"""
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from flex_tpu.io import synth
from flex_tpu.reorder import reorder

GRAPHS = [a for a in sys.argv[1:] if hasattr(synth, a)]
ORDERS = [a for a in sys.argv[1:] if not hasattr(synth, a)]
GRAPHS = GRAPHS or ["reddit_posts", "reddit_comm"]
ORDERS = ORDERS or ["rbdeg", "deg"]

for gname in GRAPHS:
    t0 = time.time()
    g = getattr(synth, gname)(seed=0)
    print(f"{gname}: m={g.m} nnz={g.nnz} gen={time.time()-t0:.0f}s", flush=True)
    for oname in ORDERS:
        t0 = time.time()
        go = reorder(g, oname, check=False) if oname != "ovo" else g
        np.savez(f"/tmp/{gname}_{oname}.npz", row_ptr=go.row_ptr,
                 col=go.col, vals=go.vals)
        print(f"  {oname}: {time.time()-t0:.0f}s -> /tmp/{gname}_{oname}.npz",
              flush=True)
