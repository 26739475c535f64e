"""Shared training machinery for the model families.

One masked-cross-entropy and one optimizer-step factory instead of a
copy per model (GCN / GraphSAGE / GAT / 2D-sharded GCN all train the
same way: semi-supervised node classification over a prepared SpMM
plan).  The plan/graph argument is always a pytree *argument* of the
jitted step, never closed over (CLAUDE.md: closures bake device arrays
into the executable as constants).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def masked_xent(logits, y, mask) -> jax.Array:
    """Masked softmax cross-entropy over labelled nodes."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
    denom = jnp.maximum(mask.sum(), 1)
    return (nll * mask).sum() / denom


def make_step(loss_fn: Callable, graph_arg, optimizer) -> Callable:
    """Returns jitted ``(params, opt_state, X, y, mask) ->
    (params, opt_state, loss)`` for ``loss_fn(params, graph_arg, X, y,
    mask)``; ``graph_arg`` (a plan / attention graph pytree) is threaded
    through jit as an argument."""

    @jax.jit
    def _step(params, opt_state, graph_arg, X, y, mask):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, graph_arg, X, y, mask)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    def step(params, opt_state, X, y, mask):
        return _step(params, opt_state, graph_arg, X, y, mask)

    return step
