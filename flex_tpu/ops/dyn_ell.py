"""Dynamic-value ELL SpMM: static sparsity pattern, per-call edge values.

Every kernel in :mod:`flex_tpu.ops` bakes the adjacency *values* into its
format at prepare time — the right trade for GCN/SAGE, whose Â is fixed.
Attention GNNs (GAT et al.) recompute the edge values every forward pass
(``alpha = softmax_row(e)``), so they need ``C = A(vals) · B`` where the
pattern is static but ``vals`` is a traced argument with a gradient.

The plan reuses the width-bucketed ELL layout (``ops/ell_spmm.py``; the
reference's row-split generalisation, ``flex.cu:3510-3927``): column
buckets, per-bucket chunk starts/lengths, and the chunk→row map are
built once at prepare time ON DEVICE from the resident CSR (the shared
``_bucket_layouts`` pass — zero nnz-sized host uploads, per CLAUDE.md's
tunnel rule).  Per call, each bucket's value matrix is assembled with
batched w-wide ``dynamic_slice``s of the contiguous CSR value runs,
after which the call is exactly :func:`ell_spmm._ell_spmm` on the
assembled buckets.  Measured (docs/measurements.md): the assembly is
element-rate-bound (~4.5 ns/elem — XLA decomposes misaligned 1-D slices
into element gathers; a permutation-gather formulation costs the same),
so dynamic re-weighting runs at ~2x the static ELL call — the price of
fresh edge weights every forward.  The slice tables are n_chunks-sized
(vs a padded-nnz permutation), keeping the plan structure small.
The whole chain is differentiable (dynamic_slice transposes to
dynamic_update_slice and the mask's ``where`` zeroes pad cotangents),
so ``d loss / d vals`` comes out of ``jax.grad`` with no custom VJP.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from flex_tpu.ops.ell_spmm import (
    DEFAULT_WIDTHS, _bucket_layouts, _chunk_order, _ell_spmm,
    host_bucket_sizes,
)
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR


@dataclasses.dataclass
class DynEllPlan:
    """Static ELL structure; ``__call__(vals, B)`` does SpMM with fresh
    edge values (CSR order, length nnz)."""

    m: int
    nnz: int
    wmax: int
    cols: Any        # tuple of int32[N, w] device arrays (per width bucket)
    starts: Any      # tuple of int[N]: chunk start in CSR order (pad=nnz)
    lengths: Any     # tuple of int[N]: live slots per chunk
    chunk_row: Any   # int32[total_chunks]
    padded_nnz: int
    max_gather_rows: int = 2 * 1024 * 1024

    def __call__(self, vals, B) -> jax.Array:
        return _dyn_ell_spmm(self, vals, B)

    def tree_flatten(self):
        return (self.cols, self.starts, self.lengths, self.chunk_row), (
            self.m, self.nnz, self.wmax, self.padded_nnz,
            self.max_gather_rows)

    @classmethod
    def tree_unflatten(cls, aux, children):
        m, nnz, wmax, padded_nnz, mgr = aux
        return cls(m=m, nnz=nnz, wmax=wmax, cols=children[0],
                   starts=children[1], lengths=children[2],
                   chunk_row=children[3], padded_nnz=padded_nnz,
                   max_gather_rows=mgr)


jax.tree_util.register_pytree_node(
    DynEllPlan, DynEllPlan.tree_flatten, DynEllPlan.tree_unflatten)


@jax.jit
def _dyn_ell_spmm(plan: DynEllPlan, vals, B):
    if not plan.cols:
        return jnp.zeros((plan.m, B.shape[1]), jnp.float32)
    vals_pad = jnp.concatenate(
        [vals.astype(jnp.float32), jnp.zeros((plan.wmax,), jnp.float32)])
    buckets = []
    for c, st, ln in zip(plan.cols, plan.starts, plan.lengths):
        w = c.shape[1]
        sl_v = jax.vmap(
            lambda s, w=w: jax.lax.dynamic_slice(vals_pad, (s,), (w,))
        )(st)
        mask = (jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
                < ln[:, None])
        buckets.append((c, jnp.where(mask, sl_v, 0.0)))
    return _ell_spmm(tuple(buckets), plan.chunk_row, B, m=plan.m,
                     max_gather_rows=plan.max_gather_rows, out_rows=plan.m)


@functools.partial(jax.jit, static_argnames=("meta",))
def _dyn_structure(row_ptr, col_dev, *, meta):
    """Device structure build: per width bucket the [N, w] column matrix
    plus chunk starts/lengths (for the per-call contiguous value
    slicing).  Same one-argsort + batched contiguous dynamic-slice pass
    as the static ELL builder."""
    wmax, widths, _, _ = meta
    nnz = col_dev.shape[0]
    deg = row_ptr[1:] - row_ptr[:-1]
    order = _chunk_order(row_ptr, deg, widths)

    col_pad = jnp.concatenate([col_dev, jnp.zeros((wmax,), col_dev.dtype)])

    cols, starts_l, lengths_l, rows_parts = [], [], [], []
    for w, n_alloc, rows_b, starts, lengths, mask in _bucket_layouts(
            row_ptr, deg, order, nnz, meta):
        sl_c = jax.vmap(
            lambda s, w=w: jax.lax.dynamic_slice(col_pad, (s,), (w,))
        )(starts)
        cols.append(jnp.where(mask, sl_c, 0).astype(jnp.int32))
        starts_l.append(starts)
        lengths_l.append(lengths)
        rows_parts.append(rows_b)
    return (tuple(cols), tuple(starts_l), tuple(lengths_l),
            jnp.concatenate(rows_parts))


def prepare_dyn_ell(g: CSRGraph, dev: DeviceCSR | None = None,
                    widths: tuple[int, ...] = DEFAULT_WIDTHS) -> DynEllPlan:
    """Build the static structure on device from the resident CSR
    (``dev`` is created with the one sanctioned CSR upload when absent).
    The host contributes only the static bucket sizes from its degree
    array — no nnz-sized host-built upload."""
    if dev is None:
        dev = DeviceCSR.from_graph(g)
    deg = g.degrees.astype(np.int64)
    by_w, n_rows_last, padded = host_bucket_sizes(deg, widths)
    bucket_meta = tuple((w, nc, nc) for w, nc in by_w.items())
    if not bucket_meta:  # empty graph
        return DynEllPlan(m=g.m, nnz=g.nnz, wmax=widths[-1], cols=(),
                          starts=(), lengths=(),
                          chunk_row=jnp.zeros((0,), jnp.int32),
                          padded_nnz=0)
    cols, starts, lengths, chunk_row = _dyn_structure(
        dev.row_ptr, dev.col,
        meta=(widths[-1], tuple(widths), bucket_meta, n_rows_last))
    return DynEllPlan(m=g.m, nnz=g.nnz, wmax=widths[-1], cols=cols,
                      starts=starts, lengths=lengths,
                      chunk_row=chunk_row.astype(jnp.int32),
                      padded_nnz=padded)


def spmm_dyn(g: CSRGraph, vals, B, **kwargs) -> jax.Array:
    """One-shot dynamic-value SpMM (prepare + call)."""
    return prepare_dyn_ell(g, **kwargs)(jnp.asarray(vals), jnp.asarray(B))
