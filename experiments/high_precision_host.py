"""Host error study: can the windowed DENSE half run at Precision.HIGH?

The dense half is MXU-pass-bound: measured 19.3 TF/s realized at
Precision.HIGHEST (6 bf16 passes; DEFAULT single-pass bf16 measures
126-180 TF/s on this chip).  HIGH (3 passes: hi*hi + hi*lo + lo*hi,
dropping lo*lo) would halve the MXU time — ~9 ms off the 54 ms headline
call — IF the result still passes the reference tolerance
(`utils.check.res_check`: per-row eps_f32*4*row_nnz, relative when
|gold| >= 1).  Only window-covered nnz ride the MXU; the residue ELL
path is exact-f32 VPU either way.

This simulates the exact 3-pass arithmetic in numpy (ml_dtypes bf16):
for every covered nnz a*b decomposes as hi(a)hi(b)+hi(a)lo(b)+lo(a)hi(b),
each product exact in f32 (8x8-bit mantissas), f32-accumulated in the
panel order; the residue is computed in plain f32 and added.  Checked
against the f64 gold with res_check — the same acceptance the on-chip
benchmark uses.

Reference analog: the reference's kernels accumulate f32 and pass the
same resCheck (flex.cu:4154-4213); v21+ use TF32 MXU paths that shed
mantissa bits the same way HIGH does.

Run: python experiments/high_precision_host.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")  # TPU may be busy (one process)

import ml_dtypes

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.utils.check import res_check

BF16 = ml_dtypes.bfloat16


def split_hi_lo(x: np.ndarray):
    hi = x.astype(BF16).astype(np.float32)
    lo = (x - hi).astype(BF16).astype(np.float32)
    return hi, lo


def main():
    d = np.load("/tmp/reddit_posts_rbdeg_v3.npz")
    row_ptr = d["row_ptr"].astype(np.int64)
    col = d["col"].astype(np.int64)
    vals = d["vals"].astype(np.float32)
    m, nnz = len(row_ptr) - 1, len(col)
    n = int(col.max()) + 1
    g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                             name="reddit_posts", order="RBD")

    # the pinned capture selection: which nnz are window-covered
    from flex_tpu.ops.window_spmm import _host_panel_key, window_select

    sel = window_select(g, tm=256, W=128, min_count=64, dev=None,
                        max_dense_bytes=6 << 30)
    key_h, _ = _host_panel_key(g, 256, 128, sel["P"], sel["nblk"])
    covered = sel["slot"][key_h] != 0
    print(f"coverage {covered.mean():.3f} ({covered.sum()/1e6:.2f}M of "
          f"{nnz/1e6:.2f}M nnz on the MXU)")

    k = 128
    rng = np.random.default_rng(0)
    B = (2.0 * rng.random((n, k)) - 1.0).astype(np.float32)

    rows = np.repeat(np.arange(m), np.diff(row_ptr))

    t0 = time.time()
    gold = np.zeros((m, k), np.float64)
    np.add.at(gold, rows, vals[:, None].astype(np.float64)
              * B[col].astype(np.float64))
    print(f"f64 gold: {time.time()-t0:.0f}s")

    deg = np.diff(row_ptr)

    def run_check(tag, c_dense):
        c = c_dense.copy()
        rr, cc = rows[~covered], col[~covered]
        np.add.at(c, rr, (vals[~covered][:, None] * B[cc]))  # exact residue
        r = res_check(gold.astype(np.float32), c, deg)
        print(f"  {tag}: n_bad={r.n_bad} err_frac={r.err_frac:.2e} "
              f"max_err={r.max_err:.3g}")
        return r

    rc, cc_, vc = rows[covered], col[covered], vals[covered]
    a_hi, a_lo = split_hi_lo(vc)
    b_hi, b_lo = split_hi_lo(B)

    # HIGHEST-analog reference (numpy f32 fma ordering differs from the
    # MXU's, but res_check absorbs that by construction)
    t0 = time.time()
    c6 = np.zeros((m, k), np.float32)
    np.add.at(c6, rc, vc[:, None] * B[cc_])
    run_check("f32 dense (HIGHEST analog)", c6)
    print(f"  ({time.time()-t0:.0f}s)")

    # HIGH: hi*hi + hi*lo + lo*hi, each product exact, f32 accumulate
    t0 = time.time()
    c3 = np.zeros((m, k), np.float32)
    prod = (a_hi[:, None] * b_hi[cc_]
            + a_hi[:, None] * b_lo[cc_]
            + a_lo[:, None] * b_hi[cc_]).astype(np.float32)
    np.add.at(c3, rc, prod)
    run_check("HIGH 3-pass dense", c3)
    print(f"  ({time.time()-t0:.0f}s)")

    # DEFAULT: single bf16 pass (known-fail control)
    t0 = time.time()
    c1 = np.zeros((m, k), np.float32)
    np.add.at(c1, rc, (a_hi[:, None] * b_hi[cc_]).astype(np.float32))
    run_check("DEFAULT 1-pass dense (control)", c1)
    print(f"  ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
