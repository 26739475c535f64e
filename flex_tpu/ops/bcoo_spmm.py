"""BCOO SpMM baseline — the stock `jax.experimental.sparse` path.

The reference compiles two independent optimized baselines in-tree
(GE-SpMM, ``flex.cu:81-273``; ASpT, ``aspt/``) and positions Flex against
them.  This is the TPU build's second *stock* competitor next to
``xla_spmm`` (take + segment_sum): JAX's own batched-COO sparse matmul,
``bcoo_dot_general``, which XLA lowers through its native scatter/gather
machinery.  It shares nothing with the ELL/windowed code paths, so it is
an honest cross-check for both correctness and speed.

The BCOO arrays are built ON DEVICE from the resident CSR (rows recovered
with the indicator-cumsum trick) — the host ships nothing (CLAUDE.md
upload rule).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import sparse as jsparse

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR, rows_from_row_ptr


@functools.partial(jax.jit, static_argnames=("nnz", "m"))
def _build_indices(row_ptr, col, *, nnz, m):
    rows = rows_from_row_ptr(row_ptr, nnz, m)
    return jnp.stack([rows, col], axis=1)


@jax.jit
def _bcoo_call(mat: jsparse.BCOO, B):
    return jsparse.bcoo_dot_general(
        mat, B, dimension_numbers=(([1], [0]), ([], [])))


@dataclasses.dataclass
class BcooPlan:
    m: int
    n: int
    nnz: int
    mat: Any  # jsparse.BCOO (itself a pytree)

    def __call__(self, B) -> jax.Array:
        return _bcoo_call(self.mat, B)

    @property
    def stats(self) -> dict:
        return {"format": "bcoo", "nnz": self.nnz}

    def traffic_model(self, k: int) -> dict:
        """Lower-bound byte model: per-nnz (row, col, val) reads, one
        B-row gather materialisation + re-read for the combine, and the
        output (same take→materialise→reduce structure XLA gives the
        `xla` method — docs/measurements.md)."""
        by = self.nnz * 12 + 3 * self.nnz * k * 4 + self.m * k * 4
        return {"bytes": int(by), "gathered_rows": self.nnz}

    def tree_flatten(self):
        return (self.mat,), (self.m, self.n, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        m, n, nnz = aux
        return cls(m=m, n=n, nnz=nnz, mat=children[0])


def prepare_bcoo(g: CSRGraph, dev: DeviceCSR | None = None,
                 **_unused) -> BcooPlan:
    if dev is None:
        dev = DeviceCSR.from_graph(g)
    indices = _build_indices(dev.row_ptr, dev.col, nnz=g.nnz, m=g.m)
    # Only promise sorted/unique indices when the host pattern pass can
    # PROVE it (duplicate-free with columns sorted within rows) — with a
    # false promise the results are undefined, and the TPU scatter
    # lowering can drop duplicate contributions while the CPU one
    # happens to sum them (the 'CPU tests do not see it' class).
    from flex_tpu.ops.window_spmm import pattern_is_unique

    proven = pattern_is_unique(g)
    mat = jsparse.BCOO((dev.vals, indices), shape=(g.m, g.n),
                       indices_sorted=proven, unique_indices=proven)
    return BcooPlan(m=g.m, n=g.n, nnz=g.nnz, mat=mat)


def spmm_bcoo(g: CSRGraph, B, **kwargs):
    return prepare_bcoo(g, **kwargs)(jnp.asarray(B))


jax.tree_util.register_pytree_node(
    BcooPlan, BcooPlan.tree_flatten, BcooPlan.tree_unflatten
)
