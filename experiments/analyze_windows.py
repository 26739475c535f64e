"""Host-side window-structure analysis of a cached ordered graph.

For each (tm, W, J, min_count) config, print the measured structure that
decides the windowed kernel's economics (docs/measurements.md round-2):
  coverage, valid-window histogram, compact-A vs fixed-J A bytes,
  B-block refetch count after per-panel block-id sort (cross-panel index
  stability), residue nnz, and a total-time model:
    t_dense = (A_bytes + B_fetch_bytes + C_bytes) / 250 GB/s
    t_res   = res_padded_nnz * 7.3 ns  (measured ELL rate, f32)
Usage: python experiments/analyze_windows.py /tmp/reddit_posts_rbdeg.npz
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.ops.ell_spmm import ell_padded_nnz

path = sys.argv[1]
d = np.load(path)
g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"], name="g")
m, nnz, k = g.m, g.nnz, 128
print(f"{path}: m={m} nnz={nnz}")

BW = 250e9  # measured HBM stream
ELL_NS = 7.3e-9  # measured per padded-nnz ELL cost, f32 k=128


ell_padded = ell_padded_nnz  # the kernel's own padded-nnz model


base_ell = ell_padded(g.degrees) * ELL_NS
print(f"pure-ELL model: padded={ell_padded(g.degrees)} t={base_ell*1e3:.1f}ms "
      f"-> {2*nnz*k/base_ell/1e9:.0f} GF/s")

rows_of = np.repeat(np.arange(m, dtype=np.int64), g.degrees)

for tm in (128, 256):
    P = -(-m // tm)
    for W in (128, 256):
        nblk = -(-g.n // W)
        key = (rows_of // tm) * nblk + (g.col.astype(np.int64) // W)
        cnt_flat = np.bincount(key, minlength=P * nblk)
        cnt = cnt_flat.reshape(P, nblk)
        for mc in (64, 128, 192, 256):
            # break-even model: block costs TM*W*4 (A) + W*k*4 (B if fetched)
            valid = cnt >= mc
            nb_per = valid.sum(1)
            NB = int(nb_per.sum())
            if NB == 0:
                continue
            covered = int(cnt[valid].sum())
            cov = covered / nnz
            # B refetch model: per j-slot (block ids sorted ascending per
            # panel, sentinel=nblk at the end), a refetch happens whenever
            # the slot's block id differs from the previous panel's.
            Jmax = int(nb_per.max())
            ids = np.where(valid, np.arange(nblk)[None, :], np.int64(nblk))
            ids.sort(axis=1)
            refetch = 0
            for j in range(min(Jmax, 64)):
                col_j = ids[:, j]
                refetch += 1 + int((np.diff(col_j) != 0).sum())
            # residue
            hit = valid.reshape(-1)[key]
            res_deg = g.degrees - np.bincount(rows_of[hit], minlength=m)
            res_pad = ell_padded(res_deg)
            t_res = res_pad * ELL_NS
            A_fix = P * tm * min(Jmax, 16) * W * 4
            A_cmp = NB * tm * W * 4
            B_fetch = refetch * W * k * 4
            C = m * k * 4
            t_dense = (A_cmp + B_fetch + 2 * C) / BW
            t = t_dense + t_res
            q = np.percentile(nb_per, [50, 90, 99])
            print(
                f"tm={tm} W={W} mc={mc}: cov={cov:.3f} NB={NB} "
                f"J(p50/90/99/max)={q[0]:.0f}/{q[1]:.0f}/{q[2]:.0f}/{Jmax} "
                f"A_cmp={A_cmp/1e9:.2f}GB A_fixJ16={A_fix/1e9:.2f}GB "
                f"Bf={B_fetch/1e9:.2f}GB res={res_pad/1e6:.1f}Mpad "
                f"t={t*1e3:.0f}ms ({t_dense*1e3:.0f}+{t_res*1e3:.0f}) "
                f"-> {2*nnz*k/t/1e9:.0f} GF/s",
                flush=True,
            )

# panel-method economics: per-panel unique columns
for tm in (128, 256):
    P = -(-m // tm)
    pan = rows_of // tm
    u = np.array([
        len(np.unique(g.col[g.row_ptr[min(p*tm, m)]:g.row_ptr[min((p+1)*tm, m)]]))
        for p in range(0, P, max(P // 200, 1))
    ])
    seg = np.diff(np.r_[g.row_ptr[::tm], nnz])
    print(f"panel tm={tm}: sampled unique-cols mean={u.mean():.0f} "
          f"p90={np.percentile(u,90):.0f} reuse~{seg.mean()/max(u.mean(),1):.2f}")
