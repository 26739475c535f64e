"""Stage-timed host window selection at amazon scale (single-core host).

Breaks the 264M-nnz host selection into its O(nnz)/O(P*nblk) passes to
find where the wall time goes (first full run measured 523 s/budget —
far above the ~60 s the docs assumed for 'host bincount').
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from flex_tpu.ops.window_spmm import window_select
from flex_tpu.sparse.csr import CSRGraph

tm, W = 256, 128


def t(tag, fn):
    t0 = time.time()
    out = fn()
    print(f"{tag:34s} {time.time()-t0:7.1f}s", flush=True)
    return out


d = np.load("/tmp/amazon_posts_rbdeg.npz")
g = t("CSRGraph.from_arrays", lambda: CSRGraph.from_arrays(
    d["row_ptr"], d["col"], d["vals"], name="amazon_posts", order="RBD"))
m, nnz = g.m, g.nnz
P = -(-m // tm)
nblk = -(-g.n // W)

rows_h = t("rows_h np.repeat", lambda: np.repeat(
    np.arange(m, dtype=np.int64), g.degrees))
key_h = t("key_h build", lambda: (rows_h // tm) * np.int64(nblk)
          + g.col.astype(np.int64) // W)
cnt = t("bincount -> cnt", lambda: np.bincount(
    key_h, minlength=P * nblk).reshape(P, nblk))


def bytes_at(thr):
    nb = np.minimum((cnt >= thr).sum(axis=1), 1024)
    return int((-(-nb[nb > 0] // 4)).sum()) * tm * 4 * W * 4


t("one bytes_at", lambda: bytes_at(64))
t("binary search (17 it)", lambda: [bytes_at(x) for x in
                                    np.geomspace(64, 40000, 17).astype(int)])

mc = 3414
valid = t("valid = cnt >= mc", lambda: cnt >= mc)
t("np.nonzero(valid)", lambda: np.nonzero(valid))
slot = np.zeros(P * nblk, dtype=np.int16)
pw, bw = np.nonzero(valid)
slot[pw * nblk + bw] = 1
sk = t("slot[key_h] gather", lambda: slot[key_h])
msk = t("mask ==0", lambda: sk == 0)
rres = t("rows_h[mask]", lambda: rows_h[msk])
t("res_deg bincount", lambda: np.bincount(rres, minlength=m))
same_row = t("unique: same_row", lambda: rows_h[1:] == rows_h[:-1])
t("unique: col compares", lambda: (np.any(same_row & (g.col[1:] < g.col[:-1])),
                                   np.any(same_row & (g.col[1:] == g.col[:-1]))))

t0 = time.time()
sel = window_select(g, tm=tm, W=W, min_count=64,
                    max_dense_bytes=4 << 30)
print(f"full window_select(4GiB)          {time.time()-t0:7.1f}s "
      f"(mc_eff={sel['min_count_eff']} cov={sel['coverage']:.3f})",
      flush=True)
