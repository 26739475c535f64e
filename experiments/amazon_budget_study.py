"""Coverage vs min_count threshold at amazon scale (host-only study).

The windowed format is HBM-capacity-gated on amazon (mc<=384 needs a
>=13 GB dense array).  Before adding a byte-budgeted selection mode,
measure the frontier: for each count threshold, how many windows pass,
what dense_bytes they cost, and what fraction of nnz they cover — i.e.
is there a budget point where the dense part pays for itself
(marginal window worth ~72 residue nnz, docs/measurements.md)?
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from flex_tpu.sparse.csr import CSRGraph

d = np.load("/tmp/amazon_posts_rbdeg.npz")
g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                         name="amazon_posts", order="RBD")
print(g, flush=True)

tm, W, G = 256, 128, 4
P = -(-g.m // tm)
nblk = -(-g.n // W)
rows = np.repeat(np.arange(g.m, dtype=np.int64), g.degrees)
key = (rows // tm) * np.int64(nblk) + g.col.astype(np.int64) // W
cnt = np.bincount(key, minlength=P * nblk).reshape(P, nblk)
del rows, key
print(f"P={P} nblk={nblk} hist done", flush=True)

step_bytes = tm * G * W * 4
for t in (64, 96, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048, 4096):
    valid = cnt >= t
    nb_per = valid.sum(axis=1)
    steps = int(np.sum(-(-nb_per[nb_per > 0] // G)))
    covered = int(cnt[valid].sum())
    n_win = int(nb_per.sum())
    dense_gb = steps * step_bytes / 1e9
    # time model: dense 0.34us/step*G? per-window ~0.34us; residue 4.76ns/nnz
    t_dense_ms = steps * 4 * 0.34e-3
    t_res_ms = (g.nnz - covered) * 4.76e-6 * 1.55  # 1.55 = chain overhead
    print(f"t={t:5d} windows={n_win:8d} steps={steps:8d} "
          f"dense={dense_gb:6.2f}GB coverage={covered/g.nnz:.3f} "
          f"model dense={t_dense_ms:7.1f}ms res={t_res_ms:7.1f}ms "
          f"total={t_dense_ms+t_res_ms:7.1f}ms", flush=True)
