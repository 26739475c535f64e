"""Residue-chain glue itemization (round-4 open lever #1).

At the capture config (reddit_posts, mc=64, 6 GiB dense cap) the
residue+combine half occupies ~34.7 ms of the 54.2 ms hybrid call, vs
~20.5 ms for its 4.41M gathered rows at the measured 215 M rows/s
engine rate — up to ~14 ms of reduce/concat/scatter/relayout glue.
This itemizes that glue with residue-only serial chains (the pubmed
small-graph methodology, immune to the relay's dispatch floor and
non-serialization), component by component:

1. full hybrid call          (ground truth)
2. residue ELL, as shipped   (gather + mul-reduce + concat + scatter)
3. gather+mul-reduce only    (parts reduced straight to a k-vector;
                              no concat materialization, no scatter)
4. gather+mul-reduce+concat  (adds the concat materialization)
5. scatter-add only          (fixed partial, the .at[chunk_row].add)
6. dense half only           (for the complement)

Reference analog: per-warp clock itemization, flex.cu:5087-5132.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/residue_glue.py
"""
from __future__ import annotations

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from flex_tpu.bench.harness import _sync
from flex_tpu.ops.window_spmm import prepare_windowed
from flex_tpu.sparse.device import DeviceCSR

GiB = 1 << 30


def _load_graph():
    """reddit_posts at the bench.py cache (same CACHE_VERSION contract)."""
    import bench

    return bench._load_graph()


def chain_time(fn, B0, label, lo=2, hi=8, min_signal=0.04):
    """Serial-chain delta timing; stretch until >=min_signal s of device
    time (reddit-scale calls are ~10-50 ms, so hi=8 already clears it)."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(B, n):
        return jax.lax.fori_loop(0, n, lambda i, y: fn(y) * 0.01, B)

    for _ in range(3):
        ts = {}
        for n in (lo, hi):
            _sync(chain(B0, n=n))
            t0 = time.perf_counter()
            _sync(chain(B0, n=n))
            ts[n] = time.perf_counter() - t0
        if ts[hi] > ts[lo]:
            t = (ts[hi] - ts[lo]) / (hi - lo)
            if t * (hi - lo) < min_signal:
                hi = lo + max(hi - lo, int(min_signal / max(t, 1e-7)))
                continue
            print(f"{label:34s} {t*1e3:9.3f} ms/call", flush=True)
            return t
    print(f"{label:34s}       NaN", flush=True)
    return float("nan")


def main(only: set[str] | None = None):
    def want(name):
        return only is None or name in only

    k = 128
    g = _load_graph()
    dev = DeviceCSR.from_graph(g)
    _sync(dev.vals)
    plan = prepare_windowed(g, dev=dev, min_count=64,
                            max_dense_bytes=6 * GiB)
    _sync(plan.__dict__)
    ell = plan.ell
    print(f"graph {g}", flush=True)
    print(f"coverage={plan.coverage:.3f} n_res={ell.nnz} "
          f"padded={ell.padded_nnz} "
          f"buckets={[(c.shape, c.dtype) for c, v in ell.buckets]} "
          f"chunks={ell.chunk_row.shape[0]}", flush=True)

    n, m = g.n, g.m
    B0 = jnp.zeros((n, k), jnp.float32)

    def sq(out, B):
        # map arbitrary output back to (n, k) with everything kept live
        return B * 0.01 + out

    # 1. full hybrid
    if want("full"):
        chain_time(lambda B: plan(B)[:n], B0, "full hybrid")

    # 2. residue ELL as shipped
    if want("ell"):
        chain_time(lambda B: ell(B)[:n], B0, "residue ELL (shipped)")

    # 3/4. gather + mul-reduce, without / with the concat
    kp = 128
    mgr = ell.max_gather_rows

    def parts_of(B):
        Bp = B  # k == kp == 128 here
        out = []
        for cols, vals in ell.buckets:
            N, w = cols.shape
            step = max(1, mgr // w)
            for s in range(0, N, step):
                c = cols[s:s + step]
                v = vals[s:s + step]
                Bg = Bp[c]
                out.append((v[:, :, None] * Bg).sum(axis=1))
        return out

    def gr_only(B):
        acc = jnp.zeros((kp,), jnp.float32)
        for p in parts_of(B):
            acc = acc + p.sum(axis=0)
        return B * 0.01 + acc[None, :]

    if want("gr"):
        chain_time(lambda B: gr_only(B), B0, "gather+reduce (no concat)",
                   lo=2, hi=8)

    def gr_concat(B):
        partial = jnp.concatenate(parts_of(B), axis=0)
        return B * 0.01 + partial.sum(axis=0)[None, :]

    if want("grc"):
        chain_time(lambda B: gr_concat(B), B0, "gather+reduce+concat")

    # 5. scatter-add only, against a fixed partial
    n_chunks = int(ell.chunk_row.shape[0])
    partial_const = jnp.ones((n_chunks, kp), jnp.float32)
    chunk_row = ell.chunk_row

    def scat_only(B):
        p = partial_const * (1.0 + B[0, 0] * 1e-9)
        out = jnp.zeros((m, kp), jnp.float32).at[chunk_row].add(p)
        return B * 0.01 + out[:n] if m >= n else B * 0.01 + jnp.pad(
            out, ((0, n - m), (0, 0)))

    if want("scat"):
        chain_time(lambda B: scat_only(B), B0, "scatter-add only")

    # 6. dense half only
    import dataclasses

    from flex_tpu.ops.ell_spmm import EllPlan

    empty = EllPlan(m=m, buckets=(), chunk_row=jnp.zeros((0,), jnp.int32),
                    padded_nnz=0, nnz=0, b_dtype="float32")
    plan_dense = dataclasses.replace(plan, ell=empty)
    if want("dense"):
        chain_time(lambda B: plan_dense(B)[:n], B0, "dense half only")

    # engine-rate floor for the residue
    rows = sum(int(c.shape[0] * c.shape[1]) for c, v in ell.buckets)
    print(f"\nresidue gathered rows (padded): {rows} "
          f"-> floor at 215 M rows/s = {rows/215e6*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    import sys

    main(set(sys.argv[1:]) or None)
