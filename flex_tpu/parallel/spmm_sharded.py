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


def mesh_shard_devices(mesh: Mesh, axis: str, D: int):
    """(devices_of_shard, shard_of_device) maps for a dim-0 sharding over
    ``axis`` (devices on other mesh axes replicate their shard)."""
    sh = NamedSharding(mesh, P(axis, None, None, None))
    probe_shape = (D, 1, 1, 1)
    shard_of_device = {
        dvc: (idx[0].start or 0)
        for dvc, idx in sh.addressable_devices_indices_map(probe_shape).items()
    }
    devices_of_shard: dict[int, list] = {}
    for dvc, s_idx in shard_of_device.items():
        devices_of_shard.setdefault(s_idx, []).append(dvc)
    return devices_of_shard, shard_of_device


def stack_ell_plans(mesh, axis, m, bounds, plans, allocs, m_shard_pad,
                    devices_of_shard, shard_of_device,
                    widths: tuple[int, ...] = SHARDED_WIDTHS,
                    b_layout: str = "replicated") -> ShardedEllPlan:
    """Stack per-shard single-device :class:`EllPlan`s (common maxed
    bucket shapes, each already resident on its shard's device) into one
    :class:`ShardedEllPlan` — nothing moves through the host."""
    D = len(bounds)
    if not allocs:  # zero nnz everywhere
        return ShardedEllPlan(
            mesh=mesh, axis=axis, m=m, row_bounds=bounds,
            m_shard_pad=m_shard_pad, buckets=(),
            chunk_row=jnp.zeros((0,), jnp.int32), nnz=0, padded_nnz=0,
            b_layout=b_layout)
    sh2 = NamedSharding(mesh, P(axis, None))
    sh3 = NamedSharding(mesh, P(axis, None, None))
    total_nnz = sum(p.nnz for p in plans)
    live_ws = [w for w in widths if allocs.get(int(w), 0) > 0]
    buckets = []
    for b_i, w in enumerate(live_ws):
        per_dev_c, per_dev_v = {}, {}
        for dvc, s_idx in shard_of_device.items():
            c, v = plans[s_idx].buckets[b_i]
            per_dev_c[dvc] = jax.device_put(c[None], dvc)
            per_dev_v[dvc] = jax.device_put(v[None], dvc)
        N = allocs[int(w)]
        cs = jax.make_array_from_single_device_arrays(
            (D, N, w), sh3, [per_dev_c[dvc] for dvc in shard_of_device])
        vs = jax.make_array_from_single_device_arrays(
            (D, N, w), sh3, [per_dev_v[dvc] for dvc in shard_of_device])
        buckets.append((cs, vs))
    n_chunks_pad = sum(allocs[int(w)] for w in live_ws)
    per_dev_cr = {
        dvc: jax.device_put(plans[s_idx].chunk_row[None], dvc)
        for dvc, s_idx in shard_of_device.items()
    }
    chunk_row = jax.make_array_from_single_device_arrays(
        (D, n_chunks_pad), sh2, [per_dev_cr[dvc] for dvc in shard_of_device])
    return ShardedEllPlan(
        mesh=mesh, axis=axis, m=m, row_bounds=bounds,
        m_shard_pad=m_shard_pad, buckets=tuple(buckets),
        chunk_row=chunk_row, nnz=total_nnz,
        padded_nnz=sum(p.padded_nnz for p in plans), b_layout=b_layout,
    )


def prepare_ell_sharded(
    g: CSRGraph,
    mesh: Mesh,
    axis: str | None = None,
    widths: tuple[int, ...] = SHARDED_WIDTHS,
    b_layout: str = "replicated",
    dev=None,
) -> ShardedEllPlan:
    """Device-resident sharded ELL build: per-shard CSR slices are cut
    from the resident :class:`DeviceCSR` (static row bounds) and moved to
    each shard's own device, where :func:`prepare_ell_device` builds the
    common-shape buckets — the host computes only O(m) metadata.  The
    previous host-side fill violated two measured rules (np.repeat at
    ~1.5M elem/s and nnz-sized uploads through the ~35 MB/s tunnel);
    at amazon scale that was minutes of host passes plus ~1 min of
    upload versus seconds on device."""
    if b_layout not in ("replicated", "gathered"):
        raise ValueError(f"unknown b_layout {b_layout!r}")
    from flex_tpu.ops.ell_spmm import host_bucket_sizes, prepare_ell_device
    from flex_tpu.sparse.device import DeviceCSR

    axis = axis or mesh.axis_names[0]
    D = mesh.shape[axis]
    bounds = _split_rows_by_nnz(g, D)
    if dev is None:
        dev = DeviceCSR.from_graph(g)
    row_ptr_h = np.asarray(g.row_ptr, dtype=np.int64)

    # common (maxed) bucket allocation so every shard shares one program
    allocs: dict[int, int] = {}
    for r0, r1 in bounds:
        by_w, _, _ = host_bucket_sizes(
            np.asarray(g.degrees[r0:r1], dtype=np.int64), widths)
        for w, nc in by_w.items():
            allocs[w] = max(allocs.get(w, 0), nc)

    devices_of_shard, shard_of_device = mesh_shard_devices(mesh, axis, D)
    plans = []
    for d_idx, (r0, r1) in enumerate(bounds):
        home = devices_of_shard[d_idx][0]
        s0, s1 = int(row_ptr_h[r0]), int(row_ptr_h[r1])
        rp_s = jax.device_put(dev.row_ptr[r0:r1 + 1] - dev.row_ptr[r0], home)
        col_s = jax.device_put(dev.col[s0:s1], home)
        vals_s = jax.device_put(dev.vals[s0:s1], home)
        plans.append(prepare_ell_device(
            rp_s, col_s, vals_s, m=r1 - r0, nnz=s1 - s0,
            res_row_ptr_host=row_ptr_h[r0:r1 + 1] - row_ptr_h[r0],
            widths=widths, bucket_alloc=allocs if allocs else None))
    return stack_ell_plans(
        mesh, axis, g.m, bounds, plans, allocs,
        max(r1 - r0 for r0, r1 in bounds), devices_of_shard,
        shard_of_device, widths=widths, b_layout=b_layout)
