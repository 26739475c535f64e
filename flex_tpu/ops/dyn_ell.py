"""Dynamic-value ELL SpMM: static sparsity pattern, per-call edge values.

Every kernel in :mod:`flex_tpu.ops` bakes the adjacency *values* into its
format at prepare time — the right trade for GCN/SAGE, whose Â is fixed.
Attention GNNs (GAT et al.) recompute the edge values every forward pass
(``alpha = softmax_row(e)``), so they need ``C = A(vals) · B`` where the
pattern is static but ``vals`` is a traced argument with a gradient.

The plan reuses the width-bucketed ELL layout (``ops/ell_spmm.py``; the
reference's row-split generalisation, ``flex.cu:3510-3927``): column
buckets and the chunk→row map are built once at prepare time; per call,
each bucket's value matrix is ONE plain gather ``vals_pad[perm]`` (CSR
order → bucket slots; padding slots point at an appended zero), after
which the call is exactly :func:`ell_spmm._ell_spmm` on the assembled
buckets.  The whole chain is differentiable — the gather transposes to a
scatter-add, so ``d loss / d vals`` comes out of ``jax.grad`` with no
custom VJP.

Built host-side (model-scale graphs; the nnz-critical paths stay with the
device builders in ``ell_spmm``/``window_spmm``).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from flex_tpu.ops.ell_spmm import DEFAULT_WIDTHS, _ell_spmm
from flex_tpu.sparse.csr import CSRGraph


@dataclasses.dataclass
class DynEllPlan:
    """Static ELL structure; ``__call__(vals, B)`` does SpMM with fresh
    edge values (CSR order, length nnz)."""

    m: int
    nnz: int
    cols: Any        # tuple of int32[N, w] device arrays (per width bucket)
    perms: Any       # tuple of int32[N, w]: bucket slot -> CSR index (pad=nnz)
    chunk_row: Any   # int32[total_chunks]
    padded_nnz: int
    max_gather_rows: int = 2 * 1024 * 1024

    def __call__(self, vals, B) -> jax.Array:
        return _dyn_ell_spmm(self, vals, B)

    def tree_flatten(self):
        return (self.cols, self.perms, self.chunk_row), (
            self.m, self.nnz, self.padded_nnz, self.max_gather_rows)

    @classmethod
    def tree_unflatten(cls, aux, children):
        m, nnz, padded_nnz, mgr = aux
        return cls(m=m, nnz=nnz, cols=children[0], perms=children[1],
                   chunk_row=children[2], padded_nnz=padded_nnz,
                   max_gather_rows=mgr)


jax.tree_util.register_pytree_node(
    DynEllPlan, DynEllPlan.tree_flatten, DynEllPlan.tree_unflatten)


@jax.jit
def _dyn_ell_spmm(plan: DynEllPlan, vals, B):
    if not plan.cols:
        return jnp.zeros((plan.m, B.shape[1]), jnp.float32)
    vals_pad = jnp.concatenate(
        [vals.astype(jnp.float32), jnp.zeros((1,), jnp.float32)])
    buckets = tuple(
        (c, vals_pad[p]) for c, p in zip(plan.cols, plan.perms))
    return _ell_spmm(buckets, plan.chunk_row, B, m=plan.m,
                     max_gather_rows=plan.max_gather_rows, out_rows=plan.m)


# Host-build scale gate: the plan ships ~3 nnz-sized int32 arrays from
# the host, and this environment's H2D tunnel moves ~35 MB/s
# (docs/measurements.md; CLAUDE.md's never-upload-nnz rule).  Model-scale
# attention graphs sit far below this; a device-side structure builder
# (the ell_spmm pattern) is the path past it.
MAX_HOST_BUILD_NNZ = 8_000_000


def prepare_dyn_ell(g: CSRGraph,
                    widths: tuple[int, ...] = DEFAULT_WIDTHS,
                    allow_large: bool = False) -> DynEllPlan:
    """Host-side structure build (same chunking rules as the device ELL
    builder: smallest bucket width ≥ degree; rows wider than the last
    bucket split into wmax chunks)."""
    if g.nnz > MAX_HOST_BUILD_NNZ and not allow_large:
        raise ValueError(
            f"prepare_dyn_ell host-builds ~3 nnz-sized arrays; at "
            f"{g.nnz:,} nnz that upload is slow on this environment's "
            f"tunnel (pass allow_large=True to proceed)")
    deg = g.degrees.astype(np.int64)
    wmax = widths[-1]
    w_arr = np.asarray(widths, dtype=np.int64)
    wor = w_arr[np.minimum(np.searchsorted(w_arr, np.maximum(deg, 1)),
                           len(w_arr) - 1)]
    wor = np.where(deg > wmax, wmax, wor)

    cols, perms, chunk_rows = [], [], []
    padded = 0
    for w in widths:
        rows_w = np.where((wor == w) & (deg > 0))[0]
        if not len(rows_w):
            continue
        n_chunks = -(-deg[rows_w] // w)  # 1 unless w == wmax
        rows_b = np.repeat(rows_w, n_chunks)
        local = (np.arange(len(rows_b))
                 - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
        starts = g.row_ptr[rows_b].astype(np.int64) + local * w
        lengths = np.clip(deg[rows_b] - local * w, 0, w)
        idx = starts[:, None] + np.arange(w, dtype=np.int64)[None, :]
        mask = np.arange(w)[None, :] < lengths[:, None]
        idx = np.where(mask, idx, g.nnz)  # pad -> appended zero value
        c = np.where(mask, g.col[np.minimum(idx, g.nnz - 1)], 0)
        cols.append(jnp.asarray(c.astype(np.int32)))
        perms.append(jnp.asarray(idx.astype(np.int32)))
        chunk_rows.append(rows_b.astype(np.int32))
        padded += int(mask.size)

    return DynEllPlan(
        m=g.m, nnz=g.nnz, cols=tuple(cols), perms=tuple(perms),
        chunk_row=jnp.asarray(np.concatenate(chunk_rows)
                              if chunk_rows else np.zeros(0, np.int32)),
        padded_nnz=padded)


def spmm_dyn(g: CSRGraph, vals, B, **kwargs) -> jax.Array:
    """One-shot dynamic-value SpMM (prepare + call)."""
    return prepare_dyn_ell(g, **kwargs)(jnp.asarray(vals), jnp.asarray(B))
