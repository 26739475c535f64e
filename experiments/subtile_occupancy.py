"""How empty are the windowed format's dense A tiles at sub-window
granularity?

The windowed dense array stores every kept (tm, W) window fully dense:
~1.3% element density at the headline config, i.e. ~98.7% of the 6 GB
A-array DMA moves zeros.  Mosaic can DMA (8, 128)-aligned subtiles, so a
packed-subtile variant (store only nonempty 8-row strips of each window,
plus a per-step strip index) would cut dense bytes by the strip-empty
fraction.  This script measures that fraction on the host from the
cached headline graph — if most strips are nonempty (plausible: ~400 nnz
per window spread over 32 strips), the idea is dead and the 6 GB read is
fundamental to the design.

Pure host/NumPy — no TPU needed.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.ops.window_spmm import window_select


def main():
    d = np.load("/tmp/reddit_posts_rbdeg_v3.npz")
    g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                             name="reddit", order="RBD")
    tm, W = 256, 128
    for mc in (64, 32, 16):
        sel = window_select(g, tm=tm, W=W, min_count=mc)
        nblk, P = sel["nblk"], sel["P"]
        slot = sel["slot"]

        rows = np.repeat(np.arange(g.m, dtype=np.int64), g.degrees)
        p = rows // tm
        blk = g.col.astype(np.int64) // W
        key = p * nblk + blk
        j1 = slot[key].astype(np.int64)
        hit = j1 > 0
        # global window id = pstep0[p]*G + (j-1)  (steps are G windows)
        Gs = sel["G"]
        wid = (sel["pstep0"][p[hit]] * Gs + (j1[hit] - 1))
        n_windows = sel["total_steps"] * Gs  # includes sentinel pads
        for sub in (8, 16, 32, 64):
            strips = tm // sub
            skey = wid * strips + (rows[hit] % tm) // sub
            nonempty = len(np.unique(skey))
            frac = nonempty / (n_windows * strips)
            print(f"mc={mc} cov={sel['coverage']:.3f} "
                  f"dense={sel['dense_bytes']/2**30:.2f}GiB sub={sub}: "
                  f"nonempty strips {nonempty}/{n_windows * strips} "
                  f"= {frac:.3f}  -> packed bytes "
                  f"{sel['dense_bytes']*frac/2**30:.2f} GiB", flush=True)


if __name__ == "__main__":
    main()
