"""Fused GCN layer: H = act(A · X · W + b).

Re-designs the reference's AXW experiment (``cusp.cu:3-207``, ``main.cu:22-77``):
a GCN layer can associate as (A·X)·W or A·(X·W); the cheaper order depends
on the widths — FLOPs are 2·nnz·d + 2·m·d·c vs 2·m·d·c + 2·nnz·c, so
A·(X·W) wins iff the output width c is smaller than the input width d
(the reference benchmarks both and cross-checks results,
``DataLoader.cu:859-869``).

The SpMM side takes any prepared plan (ell/panel/xla); the dense GEMM and
activation fuse under jit.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def pick_association(m: int, nnz: int, d: int, c: int) -> str:
    """'axw' = A·(X·W), 'ax_w' = (A·X)·W — minimise FLOPs (cusp.cu model)."""
    flops_axw = 2 * m * d * c + 2 * nnz * c
    flops_ax_w = 2 * nnz * d + 2 * m * d * c
    return "axw" if flops_axw <= flops_ax_w else "ax_w"


def _dense_precision():
    # TPU's default single-pass bf16 matmul breaks the cross-check between
    # the two association orders (~1e-3 rel err); match the SpMM side.
    return (
        jax.lax.Precision.DEFAULT
        if jax.default_backend() == "cpu"
        else jax.lax.Precision.HIGHEST
    )


def gcn_layer(
    plan,
    X,
    W,
    b=None,
    activation: Callable | None = jax.nn.relu,
    association: str = "auto",
    nnz: int | None = None,
    precision=None,
):
    """One GCN layer using a prepared SpMM plan for A.

    Args:
      plan: any flex_tpu SpMM plan (callable B ↦ A·B) for the adjacency.
      X: [n, d] features. W: [d, c] weights. b: optional [c] bias.
      association: 'axw', 'ax_w', or 'auto' (FLOP model).
      nnz: required for 'auto' (plans know their m via X, not nnz).
    """
    d, c = W.shape
    if precision is None:
        precision = _dense_precision()
    if association == "auto":
        assert nnz is not None, "association='auto' needs nnz"
        association = pick_association(X.shape[0], nnz, d, c)
    dot = lambda a, b_: jax.lax.dot(
        a, b_, precision=precision, preferred_element_type=jnp.float32
    )
    if association == "axw":
        H = plan(dot(jnp.asarray(X), W))
    elif association == "ax_w":
        H = dot(plan(jnp.asarray(X)), W)
    else:
        raise ValueError(association)
    if b is not None:
        H = H + b
    if activation is not None:
        H = activation(H)
    return H
