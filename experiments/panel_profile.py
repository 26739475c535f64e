"""Profile one m=200K panel call and find the 5-10x unmodeled term
(VERDICT r04 next #6: either the term gets found and the model fixed, or
panel is demoted from `suggest`).

Method: the round-4 regime study's case 0 graph (m=200K, 20M nnz, 512
hub cols, frac 0.95, deg-ordered) measured 288 ms against a 28 ms model.
Here the call is ITEMIZED the way the round-4 small-graph study was:

- hub-only plan (tail buckets emptied) vs tail-only plan (hub arrays
  emptied) vs full plan, each timed as a serial chain (delta of two
  chain lengths — the only trustworthy estimator, CLAUDE.md);
- per-term model prediction printed next to each measured component;
- plan.stats (gathered rows, a_dense bytes, bucket count) for the
  byte/row accounting.

PYTHONPATH=/root/repo:$PYTHONPATH python experiments/panel_profile.py
"""
from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

from flex_tpu.utils import enable_compile_cache

enable_compile_cache()
import functools

import jax.numpy as jnp
import numpy as np

from flex_tpu.bench.autotune import FIXED_OVERHEAD, HBM, MXU_HIGHEST
from flex_tpu.bench.harness import _sync
from flex_tpu.io.synth import hub_graph
from flex_tpu.ops.panel_spmm import prepare_panel
from flex_tpu.reorder import reorder


@functools.partial(jax.jit, static_argnames=("steps",))
def _chain(plan, B0, *, steps):
    return jax.lax.fori_loop(0, steps, lambda i, y: plan(y) * 0.01, B0)


def chain_ms(plan, n, k, lo=3, hi=9) -> float:
    B0 = jnp.zeros((n, k), jnp.float32)
    for _ in range(3):
        ts = {}
        for steps in (lo, hi):
            _sync(_chain(plan, B0, steps=steps))
            t0 = time.perf_counter()
            _sync(_chain(plan, B0, steps=steps))
            ts[steps] = time.perf_counter() - t0
        if ts[hi] > ts[lo]:
            return (ts[hi] - ts[lo]) / (hi - lo) * 1e3
    return float("nan")


def main():
    k = 128
    t0 = time.time()
    g = reorder(hub_graph(200_000, 20_000_000, n_hub_cols=512,
                          hub_frac=0.95, seed=0), "deg", check=False)
    print(f"graph: m={g.m} nnz={g.nnz} (gen {time.time()-t0:.0f}s)",
          flush=True)

    t0 = time.time()
    plan = prepare_panel(g)
    _sync(plan.data)
    print(f"prepare_panel: {time.time()-t0:.1f}s  stats={plan.stats}",
          flush=True)

    st = plan.stats
    hub_rows_gathered = st["n_hub_chunks"] * plan.data["hub_cols"].shape[1]
    tail_gathered = st["gathered_rows"] - hub_rows_gathered
    # the autotuner's terms, split by component
    t_hub_bytes = 3 * hub_rows_gathered * k * 4 / HBM
    t_tail_bytes = (st["a_dense_bytes"] + 3 * tail_gathered * k * 4) / HBM
    flops = 0
    for a, _, _ in plan.data["buckets"]:
        P, tm, u = a.shape
        flops += 2 * P * tm * u * k
    t_tail_mxu = flops / MXU_HIGHEST
    print(f"model: hub={t_hub_bytes*1e3:.1f}ms "
          f"tail_bytes={t_tail_bytes*1e3:.1f}ms "
          f"tail_mxu={t_tail_mxu*1e3:.1f}ms "
          f"fixed={FIXED_OVERHEAD*1e3:.1f}ms "
          f"(hub_gathered={hub_rows_gathered} tail_gathered={tail_gathered})",
          flush=True)

    empty_hub = {
        "hub_cols": jnp.zeros((0, plan.data["hub_cols"].shape[1]), jnp.int32),
        "hub_vals": jnp.zeros((0, plan.data["hub_cols"].shape[1]),
                              jnp.float32),
        "hub_chunk_row": jnp.zeros((0,), jnp.int32),
        "buckets": plan.data["buckets"],
    }
    hub_only = {**plan.data, "buckets": ()}
    for tag, data in (("full", plan.data), ("tail-only", empty_hub),
                      ("hub-only", hub_only)):
        p = dataclasses.replace(plan, data=data)
        ms = chain_ms(p, g.n, k)
        print(f"{tag:10s} chain {ms:8.2f} ms", flush=True)

    # sanity: full result correct (guards the itemization against a
    # broken plan)
    from flex_tpu.io import make_features
    from flex_tpu.ops.ref import spmm_scipy
    from flex_tpu.utils.check import res_check

    B = make_features(g, k)
    chk = res_check(np.asarray(plan(jnp.asarray(B))), spmm_scipy(g, B),
                    g.degrees)
    print(f"res_check: {chk}", flush=True)
    print("ALL-DONE", flush=True)


if __name__ == "__main__":
    main()
