"""Row-sharded SpMM across a device mesh (BASELINE.json config 5).

Design (SURVEY.md §5.8): A is split into contiguous row shards balanced by
nnz; each device holds its shard in the ELL-arena format and computes its
C rows locally against a replicated B — no inter-chip reduction is needed
because row ownership is exclusive by construction (the multi-chip
re-statement of the reference's "no atomics when a row is wholly owned"
rule, ``mat.cu:816-825``).  B is replicated here; an all-gather variant
only pays when B stops fitting per-chip.

Every shard shares one static program (same bucket views / arena length,
padded to the max over shards), as `shard_map` requires.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flex_tpu.ops.ell_spmm import DEFAULT_WIDTHS, _ell_spmm
from flex_tpu.sparse.csr import CSRGraph


def _split_rows_by_nnz(g: CSRGraph, n_shards: int) -> list[tuple[int, int]]:
    """Contiguous row ranges with ~equal nnz (static load balance — the
    TPU replacement for the reference's atomic work stealing)."""
    targets = np.linspace(0, g.nnz, n_shards + 1)[1:-1]
    cuts = np.searchsorted(g.row_ptr, targets, side="left")
    bounds = np.concatenate([[0], cuts, [g.m]]).astype(np.int64)
    return [(int(bounds[i]), int(bounds[i + 1])) for i in range(n_shards)]


@dataclasses.dataclass
class ShardedEllPlan:
    mesh: Mesh
    axis: str
    m: int
    row_bounds: list[tuple[int, int]]
    m_shard_pad: int
    views: tuple          # common across shards
    cols_a: Any           # [D, arena_len] sharded on axis 0
    vals_a: Any           # [D, arena_len]
    chunk_row: Any        # [D, n_chunks_pad]
    nnz: int
    padded_nnz: int
    fn: Any = None

    def __call__(self, B) -> jax.Array:
        if self.fn is None:
            views = self.views
            m_pad = self.m_shard_pad
            ax = self.axis

            def local(cols_a, vals_a, chunk_row, B):
                return _ell_spmm(
                    cols_a[0], vals_a[0], chunk_row[0], B,
                    m=m_pad, views=views, max_gather_rows=2 * 1024 * 1024,
                    out_rows=m_pad,
                )[None]

            mapped = jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(ax, None), P(ax, None), P(ax, None), P(None, None)),
                out_specs=P(ax, None, None),
            )
            bounds = self.row_bounds

            @jax.jit
            def fn(cols_a, vals_a, chunk_row, B):
                out = mapped(cols_a, vals_a, chunk_row, B)  # [D, m_pad, k]
                return jnp.concatenate(
                    [out[d, : r1 - r0] for d, (r0, r1) in enumerate(bounds)],
                    axis=0,
                )

            self.fn = fn
        return self.fn(self.cols_a, self.vals_a, self.chunk_row, B)

    @property
    def stats(self) -> dict:
        return {
            "n_shards": len(self.row_bounds),
            "padded_nnz": self.padded_nnz,
            "pad_ratio": self.padded_nnz / max(self.nnz, 1),
            "views": self.views,
        }


def _shard_metadata(g: CSRGraph, r0: int, r1: int, widths):
    """Per-shard ELL metadata (host, O(rows))."""
    deg = g.degrees[r0:r1].astype(np.int64)
    wmax = widths[-1]
    w_arr = np.asarray(widths, dtype=np.int64)
    wor = w_arr[np.minimum(np.searchsorted(w_arr, np.maximum(deg, 1)),
                           len(w_arr) - 1)]
    wor = np.where(deg > wmax, wmax, wor).astype(np.int64)
    n_chunks = np.where(deg > 0, -(-deg // wor), 0)
    return deg, wor, n_chunks


def prepare_ell_sharded(
    g: CSRGraph,
    mesh: Mesh,
    axis: str | None = None,
    widths: tuple[int, ...] = DEFAULT_WIDTHS,
) -> ShardedEllPlan:
    axis = axis or mesh.axis_names[0]
    D = mesh.shape[axis]
    bounds = _split_rows_by_nnz(g, D)

    # Pass 1: common layout — per-width chunk counts maxed over shards.
    metas = [_shard_metadata(g, r0, r1, widths) for r0, r1 in bounds]
    n_by_w = {w: 0 for w in widths}
    for deg, wor, n_chunks in metas:
        for w in widths:
            n_by_w[w] = max(n_by_w[w], int(n_chunks[wor == w].sum()))
    views = []
    off = 0
    for w in widths:
        if n_by_w[w] == 0:
            continue
        views.append((int(off), int(n_by_w[w]), int(w)))
        off += n_by_w[w] * w
    arena_len = int(off)
    n_chunks_pad = sum(N for _, N, _ in views)
    m_shard_pad = max(r1 - r0 for r0, r1 in bounds)

    # Pass 2: fill per-shard arenas (host; rows are shard-local ids).
    cols_a = np.zeros((D, arena_len), dtype=np.int32)
    vals_a = np.zeros((D, arena_len), dtype=np.float32)
    # padded chunks write zero values into row 0 — harmless by construction
    chunk_row = np.zeros((D, n_chunks_pad), dtype=np.int32)
    for d, ((r0, r1), (deg, wor, n_chunks)) in enumerate(zip(bounds, metas)):
        rows_local = np.arange(r1 - r0, dtype=np.int64)
        order = np.argsort(wor, kind="stable")
        chunk_base = np.zeros(r1 - r0, dtype=np.int64)
        cpos = 0
        for off_w, N, w in views:
            sel = order[wor[order] == w]
            ch = n_chunks[sel]
            if len(sel):
                starts = off_w + np.concatenate([[0], np.cumsum(ch[:-1])]) * w
                chunk_base[sel] = starts
                n_here = int(ch.sum())
                chunk_row[d, cpos : cpos + n_here] = np.repeat(
                    rows_local[sel], ch
                ).astype(np.int32)
            else:
                n_here = 0
            cpos += N  # common layout: bucket slots fixed even if underfull
        # scatter this shard's nnz
        e0, e1 = int(g.row_ptr[r0]), int(g.row_ptr[r1])
        rows_e = (
            np.repeat(rows_local, deg)
        )
        pos = np.arange(e1 - e0, dtype=np.int64) - (
            g.row_ptr[r0 + rows_e] - e0
        )
        w_e = wor[rows_e]
        arena_pos = chunk_base[rows_e] + (pos // w_e) * w_e + pos % w_e
        cols_a[d, arena_pos] = g.col[e0:e1]
        vals_a[d, arena_pos] = g.vals[e0:e1]

    sharding = NamedSharding(mesh, P(axis, None))
    return ShardedEllPlan(
        mesh=mesh, axis=axis, m=g.m, row_bounds=bounds,
        m_shard_pad=m_shard_pad, views=tuple(views),
        cols_a=jax.device_put(cols_a, sharding),
        vals_a=jax.device_put(vals_a, sharding),
        chunk_row=jax.device_put(chunk_row, sharding),
        nnz=g.nnz, padded_nnz=D * arena_len,
    )
