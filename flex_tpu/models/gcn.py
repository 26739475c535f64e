"""GCN model family built on the flex_tpu SpMM kernels.

The reference motivates its SpMM with GCN inference (the AXW path,
``main.cu:22-77``; per-dataset label widths ``DataLoader.cu:62-84``).  This
module completes the picture with an actual trainable 2-layer GCN
(Kipf & Welling) for semi-supervised node classification:

    H1 = relu(Â · X · W1 + b1)
    Z  = Â · H1 · W2 + b2
    L  = masked softmax cross-entropy

Â is any prepared flex_tpu SpMM plan; widths follow the dataset's
``label_width`` (c).  Pure-JAX parameter pytree + optax optimizer.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from flex_tpu.ops.gcn import gcn_layer


@dataclasses.dataclass
class GCN:
    """Configuration + init/apply for a 2-layer GCN."""

    d_in: int
    d_hidden: int
    n_classes: int
    nnz: int  # adjacency nnz, drives the association choice

    def init(self, key) -> dict:
        k1, k2 = jax.random.split(key)
        glorot = jax.nn.initializers.glorot_uniform()
        return {
            "W1": glorot(k1, (self.d_in, self.d_hidden), jnp.float32),
            "b1": jnp.zeros((self.d_hidden,), jnp.float32),
            "W2": glorot(k2, (self.d_hidden, self.n_classes), jnp.float32),
            "b2": jnp.zeros((self.n_classes,), jnp.float32),
        }

    def apply(self, params: dict, plan: Callable, X) -> jax.Array:
        h = gcn_layer(plan, X, params["W1"], params["b1"],
                      activation=jax.nn.relu, association="auto", nnz=self.nnz)
        z = gcn_layer(plan, h, params["W2"], params["b2"],
                      activation=None, association="auto", nnz=self.nnz)
        return z


def gcn_loss(model: GCN, params, plan, X, y, mask) -> jax.Array:
    """Masked softmax cross-entropy over labelled nodes."""
    from flex_tpu.models.common import masked_xent

    return masked_xent(model.apply(params, plan, X), y, mask)


def make_train_step(model: GCN, plan, optimizer) -> Callable:
    """Returns jitted (params, opt_state, X, y, mask) -> (params, opt_state, loss).

    The plan is passed into jit as a pytree *argument* (plans register as
    pytrees), never closed over — closures would bake its device arrays
    into the executable as constants.

    Windowed/ELL plans without a transposed backward get one attached
    here (``with_training_bwd``): training differentiates only the params
    — the adjacency is a constant — and the transposed-pattern residue
    backward measures 376.6 -> 249.9 ms/step at reddit scale
    (docs/measurements.md round-5)."""
    from flex_tpu.models.common import make_step

    from flex_tpu.ops.window_spmm import WindowedPlan, with_training_bwd
    if isinstance(plan, WindowedPlan) and plan.ell.bwd_plan is None:
        plan = with_training_bwd(plan)
    # bare EllPlan is NOT auto-wrapped: it does not record B's row count
    # (n != m on rectangular graphs) — callers use ell_spmm.with_bwd_plan
    # explicitly with the right n.
    return make_step(
        lambda p, plan_, X, y, mask: gcn_loss(model, p, plan_, X, y, mask),
        plan, optimizer)
