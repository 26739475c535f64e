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
    logits = model.apply(params, plan, X)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
    denom = jnp.maximum(mask.sum(), 1)
    return (nll * mask).sum() / denom


def make_train_step(model: GCN, plan, optimizer) -> Callable:
    """Returns jitted (params, opt_state, X, y, mask) -> (params, opt_state, loss).

    The plan is passed into jit as a pytree *argument* (plans register as
    pytrees), never closed over — closures would bake its device arrays
    into the executable as constants."""

    @jax.jit
    def _step(params, opt_state, plan, X, y, mask):
        loss, grads = jax.value_and_grad(
            lambda p: gcn_loss(model, p, plan, X, y, mask)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    def step(params, opt_state, X, y, mask):
        return _step(params, opt_state, plan, X, y, mask)

    return step
