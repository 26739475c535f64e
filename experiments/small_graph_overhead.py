"""Small-graph overhead breakdown (VERDICT r03 item 6).

pubmed k=128 runs at ~3.7 ms/call (7.5 GF/s) vs the reference's 607
(Flex-H100) — a fixed per-call floor dominates 108K nnz.  This splits
the 3.7 ms into its parts:

1. serial-chain tElap of the full hybrid call (ground truth, immune to
   the ~34 ms sync floor),
2. the same for each component: dense pallas-only, residue-ELL-only,
   output gather only, and an empty jitted identity (dispatch floor),
3. a trace_table pass over 30 chained calls for per-op device times.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/small_graph_overhead.py
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
from flex_tpu.io import load_csv, make_features
from flex_tpu.ops.window_spmm import prepare_windowed
from flex_tpu.reorder import reorder
from flex_tpu.sparse.device import DeviceCSR


def chain_time(fn, B0, lo=4, hi=24):
    """Serial-chain delta timing (bench._probe pattern)."""
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
            return (ts[hi] - ts[lo]) / (hi - lo)
    return float("nan")


def main():
    k = 128
    g = reorder(load_csv("/root/reference/data/pubmed.csv"), "rbdeg",
                check=False)
    dev = DeviceCSR.from_graph(g)
    _sync(dev.vals)
    plan = prepare_windowed(g, dev=dev, min_count=64)
    _sync(plan.__dict__)
    print(f"graph {g}; stats={plan.stats}", flush=True)
    B0 = jnp.zeros((g.n, k), jnp.float32)

    # square-pad helpers: chain needs fn: (n, k) -> (n, k)
    m, n = g.m, g.n

    def full(B):
        return plan(B)[:n] if m >= n else jnp.pad(plan(B), ((0, n - m), (0, 0)))

    t_full = chain_time(full, B0)
    print(f"full hybrid call:   {t_full*1e6:8.1f} us "
          f"({2*g.nnz*k/t_full/1e9:.1f} GF/s)", flush=True)

    ell = plan.ell

    def ell_only(B):
        return ell(B)[:n] if m >= n else jnp.pad(ell(B), ((0, n - m), (0, 0)))

    t_ell = chain_time(ell_only, B0)
    print(f"residue ELL only:   {t_ell*1e6:8.1f} us "
          f"(n_res={ell.nnz})", flush=True)

    # dense windowed only (zero-residue plan clone)
    import dataclasses

    from flex_tpu.ops.ell_spmm import EllPlan

    empty_ell = EllPlan(m=g.m, buckets=(), chunk_row=jnp.zeros(
        (0,), jnp.int32), padded_nnz=0, nnz=0, b_dtype="float32")
    plan_dense = dataclasses.replace(plan, ell=empty_ell)

    def dense_only(B):
        out = plan_dense(B)
        return out[:n] if m >= n else jnp.pad(out, ((0, n - m), (0, 0)))

    t_dense = chain_time(dense_only, B0)
    print(f"dense windows only: {t_dense*1e6:8.1f} us "
          f"(steps={plan.stats['n_steps']})", flush=True)

    # pure dispatch floor
    t_id = chain_time(lambda B: B * 1.000001, B0)
    print(f"identity op chain:  {t_id*1e6:8.1f} us", flush=True)

    # trace 30 calls for the per-op table
    from flex_tpu.utils.trace import trace, trace_table

    Bw = jnp.asarray(make_features(g, k))
    with trace("/tmp/flex_tpu_trace_pubmed") as td:
        out = Bw
        for _ in range(30):
            out = plan(out[: g.n] if m >= n else
                       jnp.pad(out, ((0, n - m), (0, 0))))
        _sync(out)
    rows = trace_table(td)
    print("\nper-op device times (top 12, 30 calls):", flush=True)
    for r in rows[:12]:
        print(f"  {r['op'][:60]:60s} n={r['count']:4d} "
              f"tot={r['total_ms']:7.2f}ms avg={r['avg_us']:7.1f}us",
              flush=True)


if __name__ == "__main__":
    main()
