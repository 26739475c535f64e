"""XLA-native SpMM baseline: gather + segment-sum.

This is the always-correct device path (the role cuSPARSE plays in the
reference, ``flex.cu:5717-5804``): C[r] = Σ_e vals[e] · B[col[e]] grouped by
row, expressed with ``jnp.take`` + ``jax.ops.segment_sum`` so XLA lowers it to
its native dynamic-gather / scatter-add machinery.  Memory-bound by design
(streams nnz·k elements); the Pallas kernels exist to beat it.

Every SpMM implementation in flex_tpu follows the same two-phase contract:

  plan = prepare_xla(g)   # host preprocessing, benchmarked as tPre
  C    = plan(B)          # jitted device execution, benchmarked as tElap
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from flex_tpu.sparse.csr import CSRGraph, repeat_arange


def _pad_to(x: np.ndarray, size: int, fill) -> np.ndarray:
    out = np.full(size, fill, dtype=x.dtype)
    out[: len(x)] = x
    return out


@partial(jax.jit, static_argnames=("m",))
def _spmm_edges(rows, cols, vals, B, *, m):
    # sub-128-lane layouts are pathological on TPU (3-19x, measured on
    # the ELL chain — docs/measurements.md); pad the feature dim, slice
    # the result (gathers are row-rate-bound so the padding is ~free)
    k = B.shape[1]
    if k < 128:
        # barrier: stop XLA distributing the gather over the concat and
        # recreating the narrow-lane chain (see ell_spmm)
        B = jax.lax.optimization_barrier(jnp.concatenate(
            [B, jnp.zeros((B.shape[0], 128 - k), B.dtype)], axis=1))
    gathered = jnp.take(B, cols, axis=0)  # [E, kp]
    contrib = gathered * vals[:, None]
    out = jax.ops.segment_sum(contrib, rows, num_segments=m)
    if B.shape[1] != k:
        out = jax.lax.optimization_barrier(out)  # keep the wide layout
    return out[:, :k]


@dataclasses.dataclass
class XLASpmmPlan:
    rows: jax.Array  # int32[E_pad], padded entries point at row m (dropped)
    cols: jax.Array  # int32[E_pad], padded entries point at col 0, val 0
    vals: jax.Array  # float32[E_pad]
    m: int

    def __call__(self, B) -> jax.Array:
        out = _spmm_edges(self.rows, self.cols, self.vals, B, m=self.m + 1)
        return out[: self.m]

    @property
    def flops(self) -> int:
        return 2 * int(self.vals.shape[0])  # per feature column

    def traffic_model(self, k: int) -> dict:
        """Byte model: take materialises [E, k], the multiply reads+writes
        it, segment_sum reads it again; C written once."""
        E = int(self.vals.shape[0])
        return {"bytes": 4 * E * k * 4 + self.m * k * 4, "gathered_rows": E}


def prepare_xla(g: CSRGraph, pad_multiple: int = 1024) -> XLASpmmPlan:
    E = g.nnz
    E_pad = -(-max(E, 1) // pad_multiple) * pad_multiple
    rows = repeat_arange(g.degrees, dtype=np.int32, total=E)
    rows = _pad_to(rows, E_pad, g.m)  # padding rows land in segment m
    cols = _pad_to(g.col.astype(np.int32), E_pad, 0)
    vals = _pad_to(g.vals, E_pad, 0.0)
    return XLASpmmPlan(
        rows=jnp.asarray(rows), cols=jnp.asarray(cols), vals=jnp.asarray(vals), m=g.m
    )


def spmm_xla(g: CSRGraph, B, **kwargs):
    return prepare_xla(g, **kwargs)(jnp.asarray(B))
