"""Column-packing ordering experiment: can an *asymmetric* column
relabeling raise window coverage beyond rbdeg's symmetric 0.734?

The reference's ASpT baseline reorders columns within each row panel by
density before extracting dense blocks (bb_segsort calls,
``aspt/sspmm_128.cu:1249,1282``) — per-panel column permutations are free
there because its sparse kernel gathers anyway.  On TPU the windowed
format shares one global B layout across panels, so only a GLOBAL column
permutation is free (it relabels the graph; the reference's own
``flexspmm_v9_permuteX`` permutes B once per config outside the timed
loop, ``flex.cu:4985-4988``).

Heuristic evaluated here: group columns by their *primary panel* (the row
panel that uses them most), strongest-first within a group — columns
co-used by one community pack into the same W-blocks, which is exactly
what the per-(panel, block) count histogram rewards.

Host-only analysis: computes coverage/time-model deltas on the cached
headline graph for several (tm, W, mc) configs.  Run:
  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/colpack.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def panel_col_counts(row_ptr, col, m, n, tm):
    """(panel, col) -> count, as a sparse triplet array."""
    rows = np.repeat(np.arange(m, dtype=np.int64),
                     np.diff(row_ptr).astype(np.int64))
    key = (rows // tm) * np.int64(n) + col.astype(np.int64)
    uk, cnt = np.unique(key, return_counts=True)
    return uk // n, uk % n, cnt  # panel, col, count


def colpack_order(row_ptr, col, m, n, tm):
    """pi: old col id -> new col id (primary-panel grouping)."""
    p, c, cnt = panel_col_counts(row_ptr, col, m, n, tm)
    # primary panel per column = panel with the max count (ties: first)
    order = np.lexsort((-cnt, c))  # by col, then count desc
    c_sorted = c[order]
    first = np.r_[True, np.diff(c_sorted) != 0]
    prim_col = c_sorted[first]
    prim_panel = p[order][first]
    prim_cnt = cnt[order][first]
    # columns sorted by (primary panel, -strength); unused columns last
    P = m // tm + 1
    key = prim_panel * np.int64(n) + (n - 1 - np.minimum(prim_cnt, n - 1))
    rank_used = np.argsort(key, kind="stable")
    pi = np.full(n, -1, dtype=np.int64)
    new_ids = np.arange(len(prim_col), dtype=np.int64)
    pi[prim_col[rank_used]] = new_ids
    unused = np.where(pi < 0)[0]
    pi[unused] = np.arange(len(prim_col), n, dtype=np.int64)
    return pi


def coverage_of(row_ptr, col, m, n, tm, W, mc):
    nblk = -(-n // W)
    rows = np.repeat(np.arange(m, dtype=np.int64),
                     np.diff(row_ptr).astype(np.int64))
    key = (rows // tm) * np.int64(nblk) + col.astype(np.int64) // W
    cnt = np.bincount(key, minlength=(m // tm + 1) * nblk)
    keep = cnt >= mc
    nwin = int(keep.sum())
    covered = int(cnt[keep].sum())
    return covered, nwin


def tmodel(nnz, covered, nwin, us_per_win=0.45, ns_per_pad=7.3, pad=1.12):
    return nwin * us_per_win * 1e-6 + (nnz - covered) * pad * ns_per_pad * 1e-9


def main():
    cache = sys.argv[1] if len(sys.argv) > 1 \
        else "/tmp/reddit_posts_rbdeg_v3.npz"
    d = np.load(cache)
    row_ptr, col = d["row_ptr"].astype(np.int64), d["col"].astype(np.int64)
    m = len(row_ptr) - 1
    n = m
    nnz = len(col)
    print(f"graph: m={m} nnz={nnz}")

    for tm in (256, 128):
        t0 = time.time()
        pi = colpack_order(row_ptr, col, m, n, tm)
        col2 = pi[col]
        print(f"tm={tm}: colpack order in {time.time()-t0:.1f}s")
        for W in (128, 64):
            for mc_frac in (0.25, 0.375, 0.5):
                mc = max(int(tm * W * mc_frac / 256), 8)
                cov0, nw0 = coverage_of(row_ptr, col, m, n, tm, W, mc)
                cov1, nw1 = coverage_of(row_ptr, col2, m, n, tm, W, mc)
                t0_, t1_ = tmodel(nnz, cov0, nw0), tmodel(nnz, cov1, nw1)
                print(f"  tm={tm} W={W} mc={mc}: "
                      f"base cov={cov0/nnz:.3f} win={nw0} t={t0_*1e3:.1f}ms"
                      f" | colpack cov={cov1/nnz:.3f} win={nw1} "
                      f"t={t1_*1e3:.1f}ms")


if __name__ == "__main__":
    main()
