"""Graph Attention Network (GAT) on the dynamic-value SpMM plan.

Beyond-reference model family (the reference stops at SpMM + the AXW
experiment, ``main.cu:22-77``): GAT (Velickovic et al. 2018) is the
model whose aggregation weights are *recomputed every forward pass* —
the workload that exercises :mod:`flex_tpu.ops.dyn_ell` (static
sparsity pattern, traced edge values with gradients).

Per head:  e_ij   = LeakyReLU(a_srcᵀ W h_i + a_dstᵀ W h_j)
           α_ij   = softmax over j ∈ N(i) of e_ij
           h'_i   = Σ_j α_ij · W h_j          (one dynamic-value SpMM)

The decomposition aᵀ[Wh_i ‖ Wh_j] = a_srcᵀWh_i + a_dstᵀWh_j turns the
per-edge score into two m-vectors gathered at the edge endpoints — no
per-edge feature concat materialises.  The row-wise softmax is a
max-shifted segment softmax over the CSR row ids.  Layer 1 concatenates
heads, layer 2 averages them (the paper's output convention).

Self-loops: GAT conventionally attends over N(i) ∪ {i}; pass a graph
that includes diagonal entries (e.g. ``CSRGraph.with_self_loops``-style
preprocessing or a generator that emits them) if that behavior is
wanted — the model attends over exactly the given pattern.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from flex_tpu.ops.dyn_ell import DynEllPlan, prepare_dyn_ell
from flex_tpu.sparse.csr import CSRGraph


@dataclasses.dataclass
class AttentionGraph:
    """Static per-edge machinery shared by every GAT layer/head: the
    CSR-order endpoint ids (for scoring + segment softmax) and the
    dynamic-value SpMM plan (for aggregation).  Registered pytree —
    pass as a jit argument, never close over it."""

    m: int
    nnz: int
    rows: jax.Array   # int32[nnz] CSR-order source (output row) ids
    cols: jax.Array   # int32[nnz] CSR-order destination ids
    plan: DynEllPlan

    def tree_flatten(self):
        return (self.rows, self.cols, self.plan), (self.m, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        m, nnz = aux
        return cls(m=m, nnz=nnz, rows=children[0], cols=children[1],
                   plan=children[2])


jax.tree_util.register_pytree_node(
    AttentionGraph, AttentionGraph.tree_flatten,
    AttentionGraph.tree_unflatten)


def prepare_attention(g: CSRGraph, dev=None) -> AttentionGraph:
    """Fully device-resident build: the CSR is uploaded once (DeviceCSR),
    the edge-endpoint ids and the dyn-ELL structure derive from it on
    device — no nnz-sized host-built arrays cross the tunnel."""
    from flex_tpu.sparse.device import DeviceCSR, rows_from_row_ptr

    if dev is None:
        dev = DeviceCSR.from_graph(g)
    rows = jax.jit(rows_from_row_ptr, static_argnums=(1, 2))(
        dev.row_ptr, g.nnz, g.m)
    return AttentionGraph(
        m=g.m, nnz=g.nnz, rows=rows.astype(jnp.int32),
        cols=dev.col.astype(jnp.int32),
        plan=prepare_dyn_ell(g, dev=dev))


def edge_softmax(ag: AttentionGraph, e: jax.Array) -> jax.Array:
    """Row-wise (per destination-set) max-shifted softmax over CSR-order
    edge scores e[nnz] -> alpha[nnz]; rows with no edges contribute no
    terms, so the -inf segment maxima never propagate."""
    mx = jax.ops.segment_max(e, ag.rows, num_segments=ag.m)
    ex = jnp.exp(e - mx[ag.rows])
    s = jax.ops.segment_sum(ex, ag.rows, num_segments=ag.m)
    return ex / s[ag.rows]


def gat_head(ag: AttentionGraph, H, W, a_src, a_dst,
             negative_slope: float = 0.2) -> jax.Array:
    """One attention head: returns the aggregated (m, d_out) features."""
    Hw = H @ W
    e = jax.nn.leaky_relu(
        (Hw @ a_src)[ag.rows] + (Hw @ a_dst)[ag.cols], negative_slope)
    alpha = edge_softmax(ag, e)
    return ag.plan(alpha, Hw)


@dataclasses.dataclass
class GAT:
    """2-layer multi-head GAT: layer 1 concatenates ``n_heads`` heads of
    width ``d_hidden``, layer 2 averages ``n_heads`` output heads."""

    d_in: int
    d_hidden: int
    n_classes: int
    n_heads: int = 4

    def init(self, key) -> dict:
        nh, dh = self.n_heads, self.d_hidden
        ks = jax.random.split(key, 6)
        glorot = jax.nn.initializers.glorot_uniform()
        return {
            "W1": glorot(ks[0], (nh, self.d_in, dh), jnp.float32),
            "a1s": glorot(ks[1], (nh, dh, 1), jnp.float32)[..., 0],
            "a1d": glorot(ks[2], (nh, dh, 1), jnp.float32)[..., 0],
            "W2": glorot(ks[3], (nh, nh * dh, self.n_classes), jnp.float32),
            "a2s": glorot(ks[4], (nh, self.n_classes, 1), jnp.float32)[..., 0],
            "a2d": glorot(ks[5], (nh, self.n_classes, 1), jnp.float32)[..., 0],
        }

    def apply(self, params: dict, ag: AttentionGraph, X) -> jax.Array:
        h1 = jnp.concatenate(
            [jax.nn.elu(gat_head(ag, X, params["W1"][h], params["a1s"][h],
                                 params["a1d"][h]))
             for h in range(self.n_heads)], axis=1)
        out = [gat_head(ag, h1, params["W2"][h], params["a2s"][h],
                        params["a2d"][h])
               for h in range(self.n_heads)]
        return sum(out) / self.n_heads


def gat_loss(model: GAT, params, ag, X, y, mask) -> jax.Array:
    """Masked softmax cross-entropy over labelled nodes."""
    from flex_tpu.models.common import masked_xent

    return masked_xent(model.apply(params, ag, X), y, mask)


def make_gat_train_step(model: GAT, ag: AttentionGraph,
                        optimizer) -> Callable:
    """Jitted (params, opt_state, X, y, mask) -> (params, opt_state, loss);
    the attention graph is a pytree argument, never closed over."""
    from flex_tpu.models.common import make_step

    return make_step(
        lambda p, ag_, X, y, mask: gat_loss(model, p, ag_, X, y, mask),
        ag, optimizer)
