"""Row-sharded SpMM across a device mesh (BASELINE.json config 5).

Design (SURVEY.md §5.8): A is split into contiguous row shards balanced by
nnz; each device holds its shard in the width-bucketed ELL format and
computes its C rows locally — no inter-chip reduction is needed because
row ownership is exclusive by construction (the multi-chip re-statement of
the reference's "no atomics when a row is wholly owned" rule,
``mat.cu:816-825``).

Two B layouts (``b_layout``):

- ``"replicated"`` (default): every chip holds full B; zero collective
  traffic per call.  Right when B is produced replicated (inference
  features) and fits per-chip HBM: resident n·k·4 bytes per chip.
- ``"gathered"``: B is column-sharded P(None, axis) — each chip holds
  n·k/D·4 bytes — and the kernel opens with one
  ``jax.lax.all_gather(..., tiled=True)`` over the ICI axis, costing
  n·k·4·(D-1)/D bytes of ICI traffic per call.  Right when B arrives
  column-sharded from a tensor-parallel producer (H = X·W with W
  column-sharded, cf. ``parallel/gcn_sharded.py``) or when full B stops
  fitting per-chip.  Crossover byte model: replicated wins on traffic
  whenever B is already replicated (ICI cost 0 vs (D-1)/D·n·k·4); with a
  column-sharded producer both layouts move the same bytes (the
  replicated layout would need the same all-gather *outside* the op) and
  "gathered" additionally shrinks per-chip residency by D×.

Every shard shares one static program (same bucket shapes, padded to the
max over shards), as `shard_map` requires.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flex_tpu.ops.ell_spmm import DEFAULT_WIDTHS, _ell_spmm
from flex_tpu.sparse.csr import CSRGraph

# Coarser default ladder than single-chip: every bucket exists on every
# shard (shapes are maxed across shards), so too many buckets inflate
# cross-shard padding.
SHARDED_WIDTHS = (2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)


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
    buckets: Any          # tuple of (cols [D,N,w], vals [D,N,w]) sharded dim 0
    chunk_row: Any        # [D, n_chunks_pad] sharded dim 0
    nnz: int
    padded_nnz: int
    b_layout: str = "replicated"
    fn: Any = None

    def __call__(self, B) -> jax.Array:
        if self.fn is None:
            m_pad = self.m_shard_pad
            ax = self.axis
            gathered = self.b_layout == "gathered"

            def local(buckets, chunk_row, B):
                if gathered:
                    # B arrives column-sharded [n, k/D]; reassemble the
                    # full feature matrix over ICI (XLA all-gather).
                    B = jax.lax.all_gather(B, ax, axis=1, tiled=True)
                local_buckets = tuple((c[0], v[0]) for c, v in buckets)
                return _ell_spmm(
                    local_buckets, chunk_row[0], B,
                    m=m_pad, max_gather_rows=2 * 1024 * 1024,
                    out_rows=m_pad,
                )[None]

            bucket_specs = tuple(
                (P(ax, None, None), P(ax, None, None)) for _ in self.buckets
            )
            mapped = jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(bucket_specs, P(ax, None),
                          P(None, ax) if gathered else P(None, None)),
                out_specs=P(ax, None, None),
            )
            bounds = self.row_bounds

            @jax.jit
            def fn(buckets, chunk_row, B):
                out = mapped(buckets, chunk_row, B)  # [D, m_pad, k]
                return jnp.concatenate(
                    [out[d, : r1 - r0] for d, (r0, r1) in enumerate(bounds)],
                    axis=0,
                )

            self.fn = fn
        return self.fn(self.buckets, self.chunk_row, B)

    @property
    def stats(self) -> dict:
        return {
            "n_shards": len(self.row_bounds),
            "padded_nnz": self.padded_nnz,
            "pad_ratio": self.padded_nnz / max(self.nnz, 1),
            "bucket_shapes": [c.shape for c, _ in self.buckets],
            "b_layout": self.b_layout,
        }

    def ici_bytes_per_call(self, n: int, k: int) -> int:
        """Collective traffic of one call under the current B layout."""
        D = len(self.row_bounds)
        return 0 if self.b_layout == "replicated" \
            else n * k * 4 * (D - 1) // D


def _sharded_flatten(p: ShardedEllPlan):
    children = (p.buckets, p.chunk_row)
    aux = (p.mesh, p.axis, p.m, tuple(p.row_bounds), p.m_shard_pad, p.nnz,
           p.padded_nnz, p.b_layout)
    return children, aux


def _sharded_unflatten(aux, children):
    mesh, axis, m, bounds, m_pad, nnz, padded, b_layout = aux
    return ShardedEllPlan(
        mesh=mesh, axis=axis, m=m, row_bounds=list(bounds),
        m_shard_pad=m_pad, buckets=children[0], chunk_row=children[1],
        nnz=nnz, padded_nnz=padded, b_layout=b_layout,
    )


jax.tree_util.register_pytree_node(
    ShardedEllPlan, _sharded_flatten, _sharded_unflatten
)


def prepare_ell_sharded(
    g: CSRGraph,
    mesh: Mesh,
    axis: str | None = None,
    widths: tuple[int, ...] = SHARDED_WIDTHS,
    b_layout: str = "replicated",
) -> ShardedEllPlan:
    if b_layout not in ("replicated", "gathered"):
        raise ValueError(f"unknown b_layout {b_layout!r}")
    axis = axis or mesh.axis_names[0]
    D = mesh.shape[axis]
    bounds = _split_rows_by_nnz(g, D)
    wmax = widths[-1]
    w_arr = np.asarray(widths, dtype=np.int64)

    # Pass 1: per-shard chunk metadata; common bucket sizes = max over shards.
    metas = []
    for r0, r1 in bounds:
        deg = g.degrees[r0:r1].astype(np.int64)
        wor = w_arr[np.minimum(np.searchsorted(w_arr, np.maximum(deg, 1)),
                               len(w_arr) - 1)]
        wor = np.where(deg > wmax, wmax, wor)
        n_chunks = np.where(deg > 0, -(-deg // wor), 0)
        metas.append((deg, wor, n_chunks))
    n_by_w = {}
    for deg, wor, n_chunks in metas:
        for w in widths:
            n_by_w[w] = max(n_by_w.get(w, 0), int(n_chunks[wor == w].sum()))
    live_widths = [w for w in widths if n_by_w[w] > 0]

    # Pass 2: fill per-shard buckets on host (common shapes).
    buckets_np = {
        w: (np.zeros((D, n_by_w[w], w), np.int32),
            np.zeros((D, n_by_w[w], w), np.float32))
        for w in live_widths
    }
    n_chunks_pad = sum(n_by_w[w] for w in live_widths)
    chunk_row = np.zeros((D, n_chunks_pad), np.int32)
    padded = 0
    for d, ((r0, r1), (deg, wor, n_chunks)) in enumerate(zip(bounds, metas)):
        cpos = 0
        for w in live_widths:
            sel = np.where((wor == w) & (n_chunks > 0))[0]
            cols_b, vals_b = buckets_np[w]
            if len(sel):
                ch = n_chunks[sel]
                rows_rep = np.repeat(sel, ch)
                cum0 = np.concatenate([[0], np.cumsum(ch)[:-1]])
                local = (
                    np.arange(int(ch.sum()), dtype=np.int64)
                    - np.repeat(cum0, ch)
                )
                starts = g.row_ptr[r0 + rows_rep] + local * w
                lengths = np.minimum(deg[rows_rep] - local * w, w)
                # vectorised ragged copy: chunk i slots [0, len_i) <- CSR run
                tot = int(lengths.sum())
                chunk_ids = np.repeat(np.arange(len(rows_rep)), lengths)
                within = np.arange(tot, dtype=np.int64) - np.repeat(
                    np.cumsum(lengths) - lengths, lengths
                )
                src = np.repeat(starts, lengths) + within
                dst = chunk_ids * w + within
                cols_b[d].reshape(-1)[dst] = g.col[src]
                vals_b[d].reshape(-1)[dst] = g.vals[src]
                chunk_row[d, cpos : cpos + len(rows_rep)] = rows_rep
            cpos += n_by_w[w]
        padded += sum(n_by_w[w] * w for w in live_widths)

    sh2 = NamedSharding(mesh, P(axis, None))
    sh3 = NamedSharding(mesh, P(axis, None, None))
    buckets = tuple(
        (jax.device_put(c, sh3), jax.device_put(v, sh3))
        for c, v in (buckets_np[w] for w in live_widths)
    )
    return ShardedEllPlan(
        mesh=mesh, axis=axis, m=g.m, row_bounds=bounds,
        m_shard_pad=max(r1 - r0 for r0, r1 in bounds),
        buckets=buckets,
        chunk_row=jax.device_put(chunk_row, sh2),
        nnz=g.nnz, padded_nnz=padded, b_layout=b_layout,
    )
