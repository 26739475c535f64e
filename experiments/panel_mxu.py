"""Panel m=200K mispredict root-cause A/B (VERDICT r04 next #6).

panel_profile.py isolated the 7.3x model miss to the TAIL path (305 ms
vs 42 ms modeled; zero hub rows in the case-0 graph — the docs' "hub
per-row dispatch" suspect is refuted).  The unaccounted ~260 ms matches
the 105 GFLOP einsum running at VPU rates (~0.4 TF/s) instead of the
MXU: XLA fuses the B[uc] gather into the contraction, degrading it to a
gather-multiply-reduce loop.  This A/Bs an optimization_barrier between
the gather and the einsum (forcing Bp to materialize and the dot to
dispatch on the MXU) on the SAME device-resident plan — one upload, two
variants.

PYTHONPATH=/root/repo:$PYTHONPATH python experiments/panel_mxu.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

from flex_tpu.utils import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from flex_tpu.bench.harness import _sync
from flex_tpu.io.synth import hub_graph
from flex_tpu.ops.panel_spmm import _panel_spmm, prepare_panel
from flex_tpu.reorder import reorder


def log(msg, _t0=time.time()):
    print(f"[{time.time()-_t0:6.0f}s] {msg}", flush=True)


@functools.partial(jax.jit,
                   static_argnames=("m", "n_hub_rows", "precision",
                                    "barrier"))
def _panel_variant(data, B, *, m, n_hub_rows, precision, barrier):
    from flex_tpu.ops.lanes import pad_k_lanes, unpad_k_lanes

    k_out = B.shape[1]
    B = pad_k_lanes(B)
    k = B.shape[1]
    chunks, ids = [], []
    for a_dense, ucols, pid in data["buckets"]:
        Bp = B[ucols]
        if barrier:
            Bp = jax.lax.optimization_barrier(Bp)
        chunks.append(jnp.einsum(
            "ptu,puk->ptk", a_dense, Bp, precision=precision,
            preferred_element_type=jnp.float32))
        ids.append(pid)
    all_C = jnp.concatenate(chunks, axis=0)
    order = jnp.argsort(jnp.concatenate(ids))
    C = all_C[order].reshape(-1, k)
    if C.shape[0] < m:
        C = jnp.concatenate(
            [C, jnp.zeros((m - C.shape[0], k), jnp.float32)])
    return unpad_k_lanes(C[:m], k_out)


@functools.partial(jax.jit, static_argnames=("steps", "kw_static"))
def _chain(data, B0, *, steps, kw_static):
    m, nh, prec, barrier = kw_static
    return jax.lax.fori_loop(
        0, steps,
        lambda i, y: _panel_variant(data, y, m=m, n_hub_rows=nh,
                                    precision=prec, barrier=barrier) * 0.01,
        B0)


def chain_ms(data, n, k, kw_static, lo=2, hi=6):
    B0 = jnp.zeros((n, k), jnp.float32)
    for _ in range(3):
        ts = {}
        for steps in (lo, hi):
            _sync(_chain(data, B0, steps=steps, kw_static=kw_static))
            t0 = time.perf_counter()
            _sync(_chain(data, B0, steps=steps, kw_static=kw_static))
            ts[steps] = time.perf_counter() - t0
        if ts[hi] > ts[lo]:
            return (ts[hi] - ts[lo]) / (hi - lo) * 1e3
    return float("nan")


def main():
    k = 128
    g = reorder(hub_graph(200_000, 20_000_000, n_hub_cols=512,
                          hub_frac=0.95, seed=0), "deg", check=False)
    log(f"graph m={g.m} nnz={g.nnz}; preparing (slow upload)...")
    plan = prepare_panel(g)
    _sync(plan.data)
    log(f"prepared: {plan.stats}")
    assert plan.n_hub_rows == 0  # tail-only case

    for barrier in (False, True):
        kw = (g.m, 0, plan.precision, barrier)
        ms = chain_ms(plan.data, g.n, k, kw)
        log(f"barrier={barrier}: {ms:8.2f} ms/call")

    # correctness of the barrier variant
    from flex_tpu.io import make_features
    from flex_tpu.ops.ref import spmm_scipy
    from flex_tpu.utils.check import res_check

    B = make_features(g, k)
    out = np.asarray(_panel_variant(plan.data, jnp.asarray(B), m=g.m,
                                    n_hub_rows=0,
                                    precision=plan.precision,
                                    barrier=True))
    print(f"res_check: {res_check(out, spmm_scipy(g, B), g.degrees)}",
          flush=True)
    print("ALL-DONE", flush=True)


if __name__ == "__main__":
    main()
