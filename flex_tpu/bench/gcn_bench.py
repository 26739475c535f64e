"""Fused GCN-layer benchmark (BASELINE.json config 4).

The TPU re-design of the reference's AXW experiment (``cusp.cu:run1/run2``,
``main.cu:22-77``): time H = relu(A·X·W + b) under both association orders,
cross-check the two results against each other (the reference's
``DataLoader::compare``, ``DataLoader.cu:859-869``) and against SciPy.
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from flex_tpu.bench.harness import _time_device
from flex_tpu.ops.gcn import gcn_layer, pick_association
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.utils.check import res_check2


@dataclasses.dataclass
class GCNBenchResult:
    graph: str
    d: int
    c: int
    t_axw: float          # A·(X·W)
    t_ax_w: float         # (A·X)·W
    auto_choice: str
    cross_err_frac: float  # run1-vs-run2 compare()
    scipy_err_frac: float

    def gflops(self, nnz: int, m: int) -> dict:
        return {
            "axw": (2 * m * self.d * self.c + 2 * nnz * self.c) / self.t_axw / 1e9,
            "ax_w": (2 * nnz * self.d + 2 * m * self.d * self.c) / self.t_ax_w / 1e9,
        }


def bench_gcn_layer(
    g: CSRGraph, d: int, c: int | None = None, method: str = "ell",
    iters: int = 5, seed: int = 0, check: bool = True,
) -> GCNBenchResult:
    from flex_tpu.bench.harness import _resolve_prepare
    from flex_tpu.io.csv_loader import make_features

    c = c if c is not None else g.label_width
    plan = _resolve_prepare(method)(g)
    X = jnp.asarray(make_features(g, d, seed=seed))
    rng = np.random.default_rng(seed + 1)
    W = jnp.asarray(rng.standard_normal((d, c)).astype(np.float32) * 0.1)

    # plan passed as a jit argument (plans are pytrees) — not a closure
    f_axw_ = jax.jit(lambda pl_, X, W: gcn_layer(pl_, X, W, association="axw"))
    f_ax_w_ = jax.jit(lambda pl_, X, W: gcn_layer(pl_, X, W, association="ax_w"))
    f_axw = lambda X, W: f_axw_(plan, X, W)
    f_ax_w = lambda X, W: f_ax_w_(plan, X, W)
    t_axw = _time_device(f_axw, X, W, iters=iters)
    t_ax_w = _time_device(f_ax_w, X, W, iters=iters)

    cross = scipy_err = 0.0
    if check:
        h1 = np.asarray(f_axw(X, W))
        h2 = np.asarray(f_ax_w(X, W))
        cross = res_check2(h1, h2, tol=0.01).err_frac
        A = g.to_scipy()
        want = np.maximum(A @ np.asarray(X) @ np.asarray(W), 0.0)
        scipy_err = res_check2(want, h1, tol=0.01).err_frac

    return GCNBenchResult(
        graph=g.name, d=d, c=c, t_axw=t_axw, t_ax_w=t_ax_w,
        auto_choice=pick_association(g.m, g.nnz, d, c),
        cross_err_frac=cross, scipy_err_frac=scipy_err,
    )
