"""Residue-chain glue itemization (round-4 open lever #1 / VERDICT r04 #2).

At the capture config (reddit_posts, mc=64, 6 GiB dense cap) the
residue+combine half occupies ~34.7 ms of the 54.2 ms hybrid call, vs
~20.5 ms for its 4.41M gathered rows at the measured 215 M rows/s
engine rate — up to ~14 ms of reduce/concat/scatter/relayout glue.
This itemizes that glue with residue-only serial chains (the pubmed
small-graph methodology, immune to the relay's dispatch floor and
non-serialization), component by component:

1.  full hybrid call          (ground truth)
2.  residue ELL, standalone   (gather + mul-reduce + concat + scatter
                               into zeros + slice)
2b. residue ELL into=live     (the SHIPPED combine: scatter straight
                               into a live (m,128) accumulator)
3.  gather+mul-reduce only    (parts reduced straight to a k-vector;
                               no concat materialization, no scatter)
3b. gather+row-reduce only    (drops the value multiply too)
4.  gather+mul-reduce+concat  (adds the concat materialization)
5.  scatter-add only          (fixed partial, into zeros AND into live)
6.  dense half only           (for the complement)

All jitted chains take the bucket/plan arrays as ARGUMENTS (registered
pytrees) — closing over them bakes GBs of constants into the executable
(CLAUDE.md; the documented 132 s-compile / HTTP 413 failure mode).

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


def chain_time(fn, ops, B0, label, lo=2, hi=8, min_signal=0.04):
    """Serial-chain delta timing; ``ops`` (plan/bucket pytree) enters the
    jitted chain as an argument, never a closure constant.  Stretches the
    chain until >= min_signal s of device time."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(ops, B, n):
        return jax.lax.fori_loop(0, n, lambda i, y: fn(ops, y) * 0.01, B)

    for _ in range(3):
        ts = {}
        for n in (lo, hi):
            _sync(chain(ops, B0, n=n))
            t0 = time.perf_counter()
            _sync(chain(ops, B0, n=n))
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

    # 1. full hybrid
    if want("full"):
        chain_time(lambda p, B: p(B)[:n], plan, B0, "full hybrid")

    # 2. residue ELL standalone (scatter into zeros + slice, as when
    #    called without into=)
    if want("ell"):
        chain_time(lambda e, B: e(B)[:n], ell, B0, "residue ELL standalone")

    # 2b. residue ELL into a live accumulator — the SHIPPED hybrid path
    if want("ell_into"):
        acc0 = jnp.ones((m, k), jnp.float32)

        def ell_into(ops, B):
            e, acc = ops
            out = e(B, into=acc * (1.0 + B[0, 0] * 1e-9))
            return B * 0.01 + out[:n] if m >= n else jnp.pad(
                out, ((0, n - m), (0, 0)))

        chain_time(ell_into, (ell, acc0), B0, "residue ELL into=live")

    # 3/4. gather + mul-reduce, without / with the concat
    kp = 128
    mgr = ell.max_gather_rows

    def parts_of(buckets, B, mul=True):
        out = []
        for cols, vals in buckets:
            N, w = cols.shape
            step = max(1, mgr // w)
            for s in range(0, N, step):
                c = cols[s:s + step]
                v = vals[s:s + step]
                Bg = B[c]
                out.append((v[:, :, None] * Bg).sum(axis=1) if mul
                           else Bg.sum(axis=1))
        return out

    def gr_only(buckets, B):
        acc = jnp.zeros((kp,), jnp.float32)
        for p in parts_of(buckets, B):
            acc = acc + p.sum(axis=0)
        return B * 0.01 + acc[None, :]

    if want("gr"):
        chain_time(gr_only, ell.buckets, B0, "gather+mulreduce (no concat)")

    def g_only(buckets, B):
        acc = jnp.zeros((kp,), jnp.float32)
        for p in parts_of(buckets, B, mul=False):
            acc = acc + p.sum(axis=0)
        return B * 0.01 + acc[None, :]

    if want("g"):
        chain_time(g_only, ell.buckets, B0, "gather+rowreduce (no vals)")

    def gr_concat(buckets, B):
        partial = jnp.concatenate(parts_of(buckets, B), axis=0)
        return B * 0.01 + partial.sum(axis=0)[None, :]

    if want("grc"):
        chain_time(gr_concat, ell.buckets, B0, "gather+mulreduce+concat")

    # 5. scatter-add only, against a fixed partial — both destinations
    n_chunks = int(ell.chunk_row.shape[0])
    partial_const = jnp.ones((n_chunks, kp), jnp.float32)

    def scat_zeros(ops, B):
        pc, cr = ops
        p = pc * (1.0 + B[0, 0] * 1e-9)
        out = jnp.zeros((m, kp), jnp.float32).at[cr].add(p)
        return B * 0.01 + out[:n] if m >= n else B * 0.01 + jnp.pad(
            out, ((0, n - m), (0, 0)))

    if want("scat"):
        chain_time(scat_zeros, (partial_const, ell.chunk_row), B0,
                   "scatter-add into zeros")

    acc0 = jnp.ones((m, kp), jnp.float32)

    def scat_live(ops, B):
        pc, cr, acc = ops
        p = pc * (1.0 + B[0, 0] * 1e-9)
        out = acc.at[cr].add(p)
        return B * 0.01 + out[:n] if m >= n else B * 0.01 + jnp.pad(
            out, ((0, n - m), (0, 0)))

    if want("scat"):
        chain_time(scat_live, (partial_const, ell.chunk_row, acc0), B0,
                   "scatter-add into live acc")

    # 6. dense half only
    import dataclasses

    from flex_tpu.ops.ell_spmm import EllPlan

    empty = EllPlan(m=m, buckets=(), chunk_row=jnp.zeros((0,), jnp.int32),
                    padded_nnz=0, nnz=0, b_dtype="float32")
    plan_dense = dataclasses.replace(plan, ell=empty)
    if want("dense"):
        chain_time(lambda p, B: p(B)[:n], plan_dense, B0, "dense half only")

    # engine-rate floor for the residue
    rows = sum(int(c.shape[0] * c.shape[1]) for c, v in ell.buckets)
    print(f"\nresidue gathered rows (padded): {rows} "
          f"-> floor at 215 M rows/s = {rows/215e6*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    import sys

    main(set(sys.argv[1:]) or None)
