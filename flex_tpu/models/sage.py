"""GraphSAGE model family built on the flex_tpu SpMM plans.

Beyond-reference model family (the reference stops at the SpMM + AXW
experiment, ``main.cu:22-77``): GraphSAGE (Hamilton et al. 2017) with the
mean aggregator, whose per-layer compute is exactly the framework's
kernel contract — one sparse aggregation Â·H (any prepared SpMM plan)
plus dense GEMMs:

    H_{l+1} = act( H_l · W_self + (Â · H_l) · W_neigh + b )

With a row-normalised Â (mean aggregation) this is the standard
sampled-free full-graph SAGE.  The separate self/neighbour weights are
what distinguish it from the GCN family (``models/gcn.py``); both share
the plans, the optimizer step, and the checkpointing module unchanged.

The dense side reuses the AXW association insight (``cusp.cu:run1/2``):
(Â·H)·W when the output width is narrower than the input, Â·(H·W)
otherwise — delegated to :func:`flex_tpu.ops.gcn.gcn_layer`'s cost model
by expressing each layer as two `gcn_layer` calls sharing one plan.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from flex_tpu.ops.gcn import gcn_layer


@dataclasses.dataclass
class GraphSAGE:
    """Configuration + init/apply for a 2-layer mean-aggregator SAGE."""

    d_in: int
    d_hidden: int
    n_classes: int
    nnz: int  # adjacency nnz, drives the AXW association choice

    def init(self, key) -> dict:
        ks = jax.random.split(key, 4)
        glorot = jax.nn.initializers.glorot_uniform()
        return {
            "Ws1": glorot(ks[0], (self.d_in, self.d_hidden), jnp.float32),
            "Wn1": glorot(ks[1], (self.d_in, self.d_hidden), jnp.float32),
            "b1": jnp.zeros((self.d_hidden,), jnp.float32),
            "Ws2": glorot(ks[2], (self.d_hidden, self.n_classes), jnp.float32),
            "Wn2": glorot(ks[3], (self.d_hidden, self.n_classes), jnp.float32),
            "b2": jnp.zeros((self.n_classes,), jnp.float32),
        }

    def _layer(self, plan, X, Ws, Wn, b, activation):
        # neighbour term through the shared association-aware layer (zero
        # bias — the bias rides the self term once)
        neigh = gcn_layer(plan, X, Wn, jnp.zeros((Wn.shape[1],), jnp.float32),
                          activation=None, association="auto", nnz=self.nnz)
        h = X @ Ws + neigh + b
        return activation(h) if activation is not None else h

    def apply(self, params: dict, plan: Callable, X) -> jax.Array:
        h = self._layer(plan, X, params["Ws1"], params["Wn1"], params["b1"],
                        jax.nn.relu)
        return self._layer(plan, h, params["Ws2"], params["Wn2"],
                           params["b2"], None)


def sage_loss(model: GraphSAGE, params, plan, X, y, mask) -> jax.Array:
    """Masked softmax cross-entropy over labelled nodes."""
    from flex_tpu.models.common import masked_xent

    return masked_xent(model.apply(params, plan, X), y, mask)


def make_sage_train_step(model: GraphSAGE, plan, optimizer) -> Callable:
    """Jitted (params, opt_state, X, y, mask) -> (params, opt_state, loss);
    the plan is a pytree argument, never closed over."""
    from flex_tpu.models.common import make_step

    return make_step(
        lambda p, plan_, X, y, mask: sage_loss(model, p, plan_, X, y, mask),
        plan, optimizer)
