"""Itemize one m=200K panel call to find the 5-10x unmodeled term
(VERDICT r04 next #6; bench/autotune.py:136-143 gates panel to
m <= 100K because case 0 of experiments/panel_regime.py measured 288 ms
against a 28 ms model).

Components, each a serial-chain delta timing (the only trustworthy
timing through the relay, docs/measurements.md):
  full        the shipped _panel_spmm call
  hub         hub row-split path only (gather + einsum + segment_sum)
  tail        tail buckets only (gather + batched einsum + order-restore)
  tail_gather per-bucket B[uc] gathers only (consume-reduced)
  tail_mm     per-bucket einsum with the gather replaced by a statically
              sliced B block (no gather) — isolates the MXU/batched-dot
Plus per-bucket shape printout and the model's own per-term prediction,
so the divergent term is named, not guessed.

PYTHONPATH=/root/repo:$PYTHONPATH python experiments/panel_profile.py [idx]
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from flex_tpu.utils import enable_compile_cache

enable_compile_cache()

from flex_tpu.bench.harness import _sync
from flex_tpu.io.synth import hub_graph
from flex_tpu.ops.panel_spmm import prepare_panel
from flex_tpu.reorder import reorder

CASES = [
    (200_000, 20_000_000, 512, 0.95),
    (50_000, 5_000_000, 256, 0.95),
]


def chain_time(fn, ops, B0, label, lo=2, hi=8, min_signal=0.04):
    """Serial-chain delta timing; ops enters as a jit ARGUMENT (never a
    closure constant — CLAUDE.md)."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(ops, B, n):
        return jax.lax.fori_loop(0, n, lambda i, y: fn(ops, y) * 0.01, B)

    for _ in range(4):
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
            print(f"{label:24s} {t*1e3:9.3f} ms/call", flush=True)
            return t
    print(f"{label:24s}       NaN", flush=True)
    return float("nan")


def main(idx: int = 0):
    m, nnz, nh, hf = CASES[idx]
    t0 = time.time()
    g = reorder(hub_graph(m, nnz, n_hub_cols=nh, hub_frac=hf, seed=idx),
                "deg", check=False)
    print(f"case m={m} nnz={g.nnz} hub_cols={nh} frac={hf} "
          f"(gen {time.time()-t0:.0f}s)", flush=True)
    plan = prepare_panel(g, tm=128, hub_threshold=512)
    st = plan.stats
    print(f"plan: {st}", flush=True)
    for i, (a, uc, ids) in enumerate(plan.data["buckets"]):
        print(f"  bucket {i}: A{tuple(a.shape)} ucols{tuple(uc.shape)} "
              f"gathered_rows={a.shape[0]*uc.shape[1]}", flush=True)
    k = 128
    B0 = jnp.zeros((g.n, k), jnp.float32)
    prec = jax.lax.Precision.HIGHEST

    # shipped full call: plan is a registered pytree -> pass as ops
    chain_time(lambda p, B: p(B)[: g.n], plan, B0, "full")

    # hub only (project to n rows for the chain shape)
    def hub_only(data, B):
        hc, hv, cr = data
        Nh, W = hc.shape
        parts = []
        step = max(1, (2 * 1024 * 1024) // W)
        for s in range(0, Nh, step):
            Bh = B[hc[s:s + step]]
            parts.append(jnp.einsum("nw,nwk->nk", hv[s:s + step], Bh,
                                    precision=prec,
                                    preferred_element_type=jnp.float32))
        p = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        out = jax.ops.segment_sum(p, cr, num_segments=plan.n_hub_rows,
                                  indices_are_sorted=True)
        return jnp.zeros_like(B).at[: plan.n_hub_rows].set(
            out[: min(plan.n_hub_rows, B.shape[0])])

    hub_ops = (plan.data["hub_cols"], plan.data["hub_vals"],
               plan.data["hub_chunk_row"])
    if plan.data["hub_cols"].shape[0]:
        chain_time(hub_only, hub_ops, B0, "hub")

    # tail only
    def tail_only(buckets, B):
        outs = []
        for a, uc, ids in buckets:
            P, tm, u = a.shape
            step = max(1, (2 * 1024 * 1024) // u)
            sub = []
            for s in range(0, P, step):
                Bp = B[uc[s:s + step]]
                sub.append(jnp.einsum("ptu,puk->ptk", a[s:s + step], Bp,
                                      precision=prec,
                                      preferred_element_type=jnp.float32))
            outs.append((jnp.concatenate(sub, axis=0) if len(sub) > 1
                         else sub[0]).sum(axis=(0, 1)))
        acc = functools.reduce(lambda x, y: x + y, outs)
        return jnp.zeros_like(B) + acc[None, :]

    chain_time(tail_only, plan.data["buckets"], B0, "tail")

    # tail gathers only (consume-reduce so nothing is elided)
    def tail_gather(buckets, B):
        outs = []
        for a, uc, ids in buckets:
            P, tm, u = a.shape
            step = max(1, (2 * 1024 * 1024) // u)
            for s in range(0, P, step):
                outs.append(B[uc[s:s + step]].sum(axis=(0, 1)))
        acc = functools.reduce(lambda x, y: x + y, outs)
        return jnp.zeros_like(B) + acc[None, :]

    chain_time(tail_gather, plan.data["buckets"], B0, "tail_gather")

    # tail matmuls with static B slabs (no gather)
    def tail_mm(buckets, B):
        outs = []
        for a, uc, ids in buckets:
            P, tm, u = a.shape
            step = max(1, (2 * 1024 * 1024) // u)
            for s in range(0, P, step):
                n_s = min(step, P - s)
                Bp = jnp.broadcast_to(B[:u, :], (n_s, u, B.shape[1]))
                outs.append(jnp.einsum(
                    "ptu,puk->ptk", a[s:s + step], Bp, precision=prec,
                    preferred_element_type=jnp.float32).sum(axis=(0, 1)))
        acc = functools.reduce(lambda x, y: x + y, outs)
        return jnp.zeros_like(B) + acc[None, :]

    chain_time(tail_mm, plan.data["buckets"], B0, "tail_mm")

    # model's own prediction per term (autotune constants)
    from flex_tpu.bench.autotune import HBM, MXU_HIGHEST

    a_bytes = st["a_dense_bytes"]
    gathered = st["gathered_rows"]
    flops = sum(2 * int(np.prod(a.shape)) * k
                for a, _, _ in plan.data["buckets"])
    print(f"model: a_bytes/HBM={a_bytes/HBM*1e3:.1f}ms  "
          f"gather 3pass={3*gathered*k*4/HBM*1e3:.1f}ms  "
          f"(row-rate={gathered/215e6*1e3:.1f}ms)  "
          f"mxu={flops/MXU_HIGHEST*1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
