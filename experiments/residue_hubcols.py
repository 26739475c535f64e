"""Residue hub-column analysis (host-only, no TPU).

Question: after mc=64 window selection on the headline graph, how
column-skewed is the residue?  A column with global in-degree ~10K
spread over ~900 panels has ~11 nnz per panel — below every min_count —
so ALL its nnz are residue.  If the top-H residue columns hold a big
nnz share, a dense (m, H) hub slab + one MXU GEMM absorbs them at
~0.5 ns/elem instead of the ~7 ns/nnz residue gather chain.

Run: python experiments/residue_hubcols.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from flex_tpu.sparse.csr import CSRGraph
    from flex_tpu.ops.window_spmm import window_select

    d = np.load("/tmp/reddit_posts_rbdeg_v3.npz")
    g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                             name="reddit_posts", order="RBD")
    print(f"graph: {g}", flush=True)

    tm, W, mc = 256, 128, 64
    sel = window_select(g, tm=tm, W=W, min_count=mc, dev=None)
    print(f"mc={mc}: coverage={sel['coverage']:.3f} n_res={sel['n_res']:,} "
          f"dense={sel['dense_bytes']/2**30:.2f} GiB "
          f"steps={sel['total_steps']}", flush=True)

    rows = np.repeat(np.arange(g.m, dtype=np.int64), g.degrees)
    key = (rows // tm) * np.int64(sel["nblk"]) + g.col.astype(np.int64) // W
    res_mask = sel["slot"][key] == 0
    res_col = g.col[res_mask]
    n_res = len(res_col)
    assert n_res == sel["n_res"]

    cdeg = np.bincount(res_col, minlength=g.n)
    order = np.argsort(-cdeg)
    csum = np.cumsum(cdeg[order])
    print("\nresidue col-degree skew (share of residue nnz in top-H cols):")
    for H in (128, 256, 512, 1024, 2048, 4096, 8192):
        share = csum[H - 1] / n_res
        slab_mb = g.m * H * 4 / 2**20
        print(f"  H={H:5d}: {share*100:5.1f}%  ({csum[H-1]:,} nnz; "
              f"slab {slab_mb:.0f} MB; "
              f"avg deg of H-th col {cdeg[order[H-1]]})", flush=True)

    # the same question for residue ROWS (transpose view): would a
    # row-side dense slab make sense?  (C rows are exclusive — a hub-row
    # slab would be (H, n) x (n, k): n=233K makes that a full dense SpMM
    # per row — only report the skew for the record.)
    rdeg = np.bincount(rows[res_mask], minlength=g.m)
    rorder = np.argsort(-rdeg)
    rcsum = np.cumsum(rdeg[rorder])
    print("\nresidue row-degree skew (for the record):")
    for H in (512, 2048, 8192):
        print(f"  H={H:5d}: {rcsum[H-1]/n_res*100:5.1f}%")

    # what the ELL residue would look like after removing top-H cols
    from flex_tpu.ops.ell_spmm import ell_padded_nnz
    print("\npost-hub residue ELL padded nnz (drives the gather chain):")
    base = ell_padded_nnz(rdeg)
    print(f"  H=0    : residue {n_res:>10,}  padded {base:>10,}")
    for H in (256, 512, 1024, 2048):
        hub = np.zeros(g.n, dtype=bool)
        hub[order[:H]] = True
        keep = ~hub[res_col]
        rdeg2 = np.bincount(rows[res_mask][keep], minlength=g.m)
        p2 = ell_padded_nnz(rdeg2)
        print(f"  H={H:5d}: residue {keep.sum():>10,}  padded {p2:>10,} "
              f"({p2/base*100:.0f}% of base)", flush=True)


if __name__ == "__main__":
    main()
