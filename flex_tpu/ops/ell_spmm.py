"""ELL SpMM: width-bucketed row chunks — the robust general-purpose kernel.

Each row is padded to the smallest bucket width ≥ its degree; rows longer
than the widest bucket are split into chunks (the reference's row-split
kernels v31-v35, ``flex.cu:3510-3927``, generalised to all rows).  Per
bucket the computation is an exact-f32 VPU multiply-reduce over gathered B
rows — zero FLOP inflation, no MXU precision concerns, no atomics (chunk
partials combine in one scatter-add, replacing the reference's
MSB/atomicAdd protocol ``flex.cu:4107-4117``).

The ELL layout itself is built **on device** by a single scatter from the
resident CSR (`DeviceCSR`): the host computes only per-row metadata
(bucket id, chunk base) — O(m) uploads, never O(nnz) — because the
host→device path moves only ~35 MB/s (docs/measurements.md).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR

DEFAULT_WIDTHS = (2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)


@functools.partial(jax.jit, static_argnames=("layout",))
def _build_arena(dev_row_ptr, dev_col, dev_vals, width_of_row, chunk_base,
                 *, layout):
    """Scatter the CSR nnz stream into the flat ELL arena on device.

    layout: (nnz, arena_len, bucket_offsets_by_width) — static ints only.
    width_of_row: int32[m] bucket width per row (wmax for split rows).
    chunk_base: int32[m] first chunk index (bucket-global arena chunk id
      premultiplied by nothing — it's the global chunk number; arena slot =
      arena_chunk_start[row's bucket] handled on host via chunk_base).
    """
    nnz, arena_len = layout
    e = jnp.arange(nnz, dtype=jnp.int32)
    rows = (
        jnp.searchsorted(dev_row_ptr, e, side="right").astype(jnp.int32) - 1
    )
    pos = e - dev_row_ptr[rows]
    w = width_of_row[rows]
    slot = pos % w
    chunk_local = pos // w
    # chunk_base[row] already encodes the arena position of the row's first
    # chunk in *elements* (host precomputed): arena_pos = base + local*w + slot
    arena_pos = chunk_base[rows] + chunk_local * w + slot
    cols_a = jnp.zeros((arena_len,), jnp.int32).at[arena_pos].set(dev_col)
    vals_a = jnp.zeros((arena_len,), jnp.float32).at[arena_pos].set(dev_vals)
    return cols_a, vals_a


@functools.partial(
    jax.jit,
    static_argnames=("m", "views", "max_gather_rows", "out_rows", "b_dtype"),
)
def _ell_spmm(cols_a, vals_a, chunk_row, B, *, m, views, max_gather_rows,
              out_rows, b_dtype="float32"):
    """views: tuple of (arena_offset, N, w) per bucket — static.
    chunk_row: int32[total_chunks] output row per chunk (bucket-major order).
    b_dtype: gather-source dtype. "bfloat16" is the fast inference mode —
      bf16 row gathers run ~3x faster on this hardware
      (docs/measurements.md) at ~1e-3 relative error; accumulation stays
      f32 either way.
    """
    k = B.shape[1]
    if b_dtype != "float32":
        B = B.astype(b_dtype)
    parts = []
    for off, N, w in views:
        cols = jax.lax.dynamic_slice(cols_a, (off,), (N * w,)).reshape(N, w)
        vals = jax.lax.dynamic_slice(vals_a, (off,), (N * w,)).reshape(N, w)
        step = max(1, max_gather_rows // w)
        for s in range(0, N, step):
            c = cols[s : s + step]
            v = vals[s : s + step]
            Bg = jnp.take(B, c.reshape(-1), axis=0).reshape(*c.shape, k)
            parts.append(
                (v[:, :, None] * Bg.astype(jnp.float32)).sum(axis=1)
            )
    partial = jnp.concatenate(parts, axis=0)
    return jnp.zeros((out_rows, k), jnp.float32).at[chunk_row].add(partial)[:m]


@dataclasses.dataclass
class EllPlan:
    m: int
    cols_a: Any
    vals_a: Any
    chunk_row: Any
    views: tuple
    padded_nnz: int
    nnz: int
    max_gather_rows: int = 2 * 1024 * 1024
    b_dtype: str = "float32"

    def __call__(self, B) -> jax.Array:
        return _ell_spmm(
            self.cols_a, self.vals_a, self.chunk_row, B, m=self.m,
            views=self.views, max_gather_rows=self.max_gather_rows,
            out_rows=self.m, b_dtype=self.b_dtype,
        )

    @property
    def stats(self) -> dict:
        return {
            "padded_nnz": self.padded_nnz,
            "pad_ratio": self.padded_nnz / max(self.nnz, 1),
            "n_chunks": int(self.chunk_row.shape[0]),
            "views": self.views,
        }


def prepare_ell(
    g: CSRGraph,
    dev: DeviceCSR | None = None,
    widths: tuple[int, ...] = DEFAULT_WIDTHS,
    b_dtype: str = "float32",
) -> EllPlan:
    """Host: O(m) metadata.  Device: one scatter builds the ELL arena."""
    if dev is None:
        dev = DeviceCSR.from_graph(g)
    deg = g.degrees.astype(np.int64)
    m = g.m
    wmax = widths[-1]
    w_arr = np.asarray(widths, dtype=np.int64)

    # bucket width per row; split rows live in the widest bucket
    wor = w_arr[np.minimum(np.searchsorted(w_arr, np.maximum(deg, 1)),
                           len(w_arr) - 1)]
    wor = np.where(deg > wmax, wmax, wor).astype(np.int32)
    n_chunks = np.where(deg > 0, -(-deg // wor.astype(np.int64)), 0)

    # bucket-major arena layout: all chunks of bucket w are contiguous
    order = np.argsort(wor, kind="stable")  # rows grouped by width
    views = []
    chunk_base = np.zeros(m, dtype=np.int64)
    chunk_row_parts = []
    off = 0
    for w in widths:
        sel = order[wor[order] == w]
        if not len(sel):
            continue
        ch = n_chunks[sel]
        N = int(ch.sum())
        if N == 0:
            continue
        starts = off + np.concatenate([[0], np.cumsum(ch[:-1])]) * w
        chunk_base[sel] = starts
        chunk_row_parts.append(np.repeat(sel, ch).astype(np.int32))
        views.append((int(off), N, int(w)))
        off += N * w
    arena_len = int(off)
    chunk_row = (
        np.concatenate(chunk_row_parts)
        if chunk_row_parts else np.zeros((0,), np.int32)
    )

    cols_a, vals_a = _build_arena(
        dev.row_ptr, dev.col, dev.vals,
        jnp.asarray(wor), jnp.asarray(chunk_base.astype(np.int32)),
        layout=(g.nnz, arena_len),
    )
    return EllPlan(
        m=m, cols_a=cols_a, vals_a=vals_a,
        chunk_row=jnp.asarray(chunk_row),
        views=tuple(views), padded_nnz=arena_len, nnz=g.nnz,
        b_dtype=b_dtype,
    )


def spmm_ell(g: CSRGraph, B, **kwargs):
    return prepare_ell(g, **kwargs)(jnp.asarray(B))
