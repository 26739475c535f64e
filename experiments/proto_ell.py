"""Prototype: degree-bucketed ELL SpMM — fused gather + multiply-reduce.

Compares VPU mul-sum vs MXU einsum formulations on a reddit-scale R-MAT,
against the take+segment_sum baseline (~657 ms on this chip).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from flex_tpu.bench.harness import _time_device
from flex_tpu.io import make_features
from flex_tpu.io.synth import rmat_graph
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.reorder import reorder
from flex_tpu.utils.check import res_check


def p(s):
    print(s, flush=True)


def build_ell(g, widths=(32, 128, 512, 2048)):
    """Rows → (width-bucketed) ELL chunks. Returns per-bucket numpy arrays."""
    deg = g.degrees
    wmax = widths[-1]
    rows = np.repeat(np.arange(g.m, dtype=np.int64), deg)
    pos = np.arange(g.nnz, dtype=np.int64) - g.row_ptr[rows]
    chunk_of_nnz_row = pos // wmax            # which chunk within the row
    n_chunks = np.maximum(-(-deg // wmax), 1)
    # width of each chunk: last chunk of a row is its remainder bucketed up
    buckets = {w: [] for w in widths}
    chunk_start = np.zeros(g.m + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=chunk_start[1:])
    N = chunk_start[-1]
    chunk_id = chunk_start[rows] + chunk_of_nnz_row
    chunk_len = np.bincount(chunk_id, minlength=N)
    chunk_row = np.repeat(np.arange(g.m, dtype=np.int64), n_chunks)
    # assign each chunk a width bucket
    w_arr = np.asarray(widths)
    chunk_w = w_arr[np.searchsorted(w_arr, np.maximum(chunk_len, 1))]
    out = {}
    pos_in_chunk = pos % wmax
    for w in widths:
        sel = np.where(chunk_w == w)[0]
        if not len(sel):
            continue
        remap = np.full(N, -1, dtype=np.int64)
        remap[sel] = np.arange(len(sel))
        cols = np.zeros((len(sel), w), dtype=np.int32)
        vals = np.zeros((len(sel), w), dtype=np.float32)
        m_e = remap[chunk_id] >= 0
        # only nnz whose chunk is in this bucket
        e_sel = np.where((chunk_w[chunk_id] == w))[0]
        cols[remap[chunk_id[e_sel]], pos_in_chunk[e_sel]] = g.col[e_sel]
        vals[remap[chunk_id[e_sel]], pos_in_chunk[e_sel]] = g.vals[e_sel]
        out[w] = (cols, vals, chunk_row[sel].astype(np.int32))
        del m_e
    return out


def spmm_ell(buckets_dev, B, m, mode="vpu", max_rows=2_000_000):
    parts = []
    rows = []
    for w, (cols, vals, crow) in buckets_dev.items():
        N = cols.shape[0]
        step = max(1, max_rows // w)
        for s in range(0, N, step):
            c = cols[s:s + step]
            v = vals[s:s + step]
            Bg = jnp.take(B, c.reshape(-1), axis=0).reshape(*c.shape, B.shape[1])
            if mode == "vpu":
                part = (v[:, :, None] * Bg).sum(axis=1)
            else:
                part = jnp.einsum("nw,nwk->nk", v, Bg,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
            parts.append(part)
            rows.append(crow[s:s + step])
    allp = jnp.concatenate(parts, axis=0)
    allr = jnp.concatenate(rows, axis=0)
    return jnp.zeros((m, B.shape[1]), jnp.float32).at[allr].add(allp)


if __name__ == "__main__":
    p(f"device: {jax.devices()}")
    g = reorder(rmat_graph(232_965, 23_446_803, seed=1, name="reddit_like"),
                "deg", check=False)
    B = make_features(g, 128)
    Bd = jnp.asarray(B)
    t0 = time.perf_counter()
    bk = build_ell(g)
    t1 = time.perf_counter()
    padded = sum(c.shape[0] * c.shape[1] for c, _, _ in bk.values())
    p(f"build_ell: {t1-t0:.2f}s; buckets: "
      f"{ {w: v[0].shape for w, v in bk.items()} } padded_nnz={padded/1e6:.1f}M "
      f"(x{padded/g.nnz:.2f})")
    t0 = time.perf_counter()
    bkd = {w: tuple(map(jnp.asarray, v)) for w, v in bk.items()}
    np.asarray(bkd[2048][0][-1:, -1])
    t1 = time.perf_counter()
    p(f"upload: {t1-t0:.2f}s")

    gold = spmm_scipy(g, B)
    for mode in ("vpu", "mxu"):
        f = jax.jit(lambda b: spmm_ell(bkd, b, g.m, mode=mode))
        dt = _time_device(f, Bd, iters=3)
        chk = res_check(gold, np.asarray(f(Bd)), g.degrees)
        p(f"ELL {mode}: {dt*1e3:.1f} ms = {2*g.nnz*128/dt/1e9:.1f} GF/s eff "
          f"err={chk.err_frac:.2e} max={chk.max_err:.2e}")
