"""Panel SpMM: the flagship TPU kernel strategy (the reference-v36 analog).

Strategy (designed from measurements in ``experiments/micro_tpu.py``; see
mat.cu's tile formats and flex.cu:4010-4124 for what it replaces):

- **Hub rows** (degree ≥ ``hub_threshold``) barely reuse B rows within a
  panel, so densifying them wastes memory.  They are row-split into
  fixed-width chunks (the reference's v31-v35 row-split idea,
  ``flex.cu:3510-3927``): each chunk is a [1×W]·[W×k] weighted sum on the
  MXU, partials combined by a tiny segment-sum.
- **Tail rows** are grouped into ``tm``-row panels; each panel gathers its
  deduplicated B rows once (the B-reuse the orderings create) and multiplies
  a host-densified A block [tm × u] against the gathered slab — a batched
  MXU matmul.  Panels are bucketed by unique-column count into power-of-2
  widths so padding stays bounded; one einsum per bucket keeps shapes static.
- No atomics anywhere: row ownership is exclusive (panels tile the row
  space; hub partials combine in a dedicated reduction), replacing the
  reference's MSB/atomicAdd protocol (mat.cu:816-825) by construction.

Phases:
  plan = prepare_panel(g, ...)   # host format build, benchmarked as tPre
  C    = plan(B)                 # jitted gather + batched-matmul, tElap

All device arrays are jit *arguments* (a pytree), never closed-over
constants — closing over them bakes gigabytes into the executable.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from flex_tpu.sparse.csr import CSRGraph, repeat_arange


@functools.partial(jax.jit, static_argnames=("m", "n_hub_rows", "precision"))
def _panel_spmm(data, B, *, m: int, n_hub_rows: int, precision):
    """data pytree:
      hub_cols i32[Nh, W], hub_vals f32[Nh, W], hub_chunk_row i32[Nh],
      buckets: tuple of (a_dense f32[P, tm, u], ucols i32[P, u], ids i32[P]).
    """
    from flex_tpu.ops.lanes import pad_k_lanes, unpad_k_lanes

    k_out = B.shape[1]
    B = pad_k_lanes(B)  # k<128 runs at k=128 cost anyway (gather-bound)
    k = B.shape[1]
    # Cap how many B rows a single take materialises (HBM temp = rows·k·4B);
    # larger gathers are split into sequential sub-batches.
    MAX_GATHER_ROWS = 2 * 1024 * 1024

    # --- tail panels: gather + batched matmul per bucket ---
    panel_chunks = []
    panel_ids = []
    for a_dense, ucols, ids in data["buckets"]:
        P, tm, u_pad = a_dense.shape
        step = max(1, MAX_GATHER_ROWS // u_pad)
        sub = []
        for s in range(0, P, step):
            uc = ucols[s : s + step]
            ad = a_dense[s : s + step]
            Bp = B[uc]  # 2D-index gather (docs/measurements.md)
            sub.append(
                jnp.einsum(
                    "ptu,puk->ptk", ad, Bp, precision=precision,
                    preferred_element_type=jnp.float32,
                )
            )
        panel_chunks.append(jnp.concatenate(sub, axis=0) if len(sub) > 1 else sub[0])
        panel_ids.append(ids)
    if panel_chunks:
        all_C = jnp.concatenate(panel_chunks, axis=0)      # [P_total, tm, k]
        all_ids = jnp.concatenate(panel_ids, axis=0)
        order = jnp.argsort(all_ids)
        C_tail = all_C[order].reshape(-1, k)               # tail rows, panel order
    else:
        C_tail = jnp.zeros((0, k), jnp.float32)

    # --- hub rows: row-split weighted sums (sub-batched like the panels) ---
    if data["hub_cols"].shape[0]:
        hub_cols = data["hub_cols"]
        hub_vals = data["hub_vals"]
        Nh, W = hub_cols.shape
        step = max(1, MAX_GATHER_ROWS // W)
        parts = []
        for s in range(0, Nh, step):
            hc = hub_cols[s : s + step]
            Bh = B[hc]  # 2D-index gather
            parts.append(
                jnp.einsum(
                    "nw,nwk->nk", hub_vals[s : s + step], Bh,
                    precision=precision, preferred_element_type=jnp.float32,
                )
            )
        partial = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        C_hub = jax.ops.segment_sum(
            partial, data["hub_chunk_row"], num_segments=n_hub_rows,
            indices_are_sorted=True,
        )
    else:
        C_hub = jnp.zeros((0, k), jnp.float32)

    # hub rows are exactly rows [0, n_hub_rows); tail panels tile the rest.
    # Pad with zero rows when the tail has no nnz (trailing zero-degree
    # rows) so the output is always (m, k).
    covered = n_hub_rows + C_tail.shape[0]
    if covered < m:
        C_tail = jnp.concatenate(
            [C_tail, jnp.zeros((m - covered, k), jnp.float32)], axis=0
        )
    return unpad_k_lanes(jnp.concatenate([C_hub, C_tail], axis=0)[:m], k_out)


@dataclasses.dataclass
class PanelPlan:
    m: int
    tm: int
    n_hub_rows: int
    n_panels: int
    precision: Any
    data: dict            # device-array pytree consumed by _panel_spmm
    gathered_rows: int    # Σ gathered B rows per call (traffic diagnostic)

    def __call__(self, B) -> jax.Array:
        return _panel_spmm(
            self.data, B, m=self.m, n_hub_rows=self.n_hub_rows,
            precision=self.precision,
        )

    @property
    def stats(self) -> dict:
        a_bytes = sum(int(np.prod(a.shape)) * 4 for a, _, _ in self.data["buckets"])
        return {
            "n_hub_chunks": int(self.data["hub_cols"].shape[0]),
            "n_hub_rows": self.n_hub_rows,
            "n_panels": self.n_panels,
            "n_buckets": len(self.data["buckets"]),
            "a_dense_bytes": a_bytes,
            "gathered_rows": self.gathered_rows,
        }

    def traffic_model(self, k: int) -> dict:
        """Byte model: dense A buckets read once; gathered (deduplicated)
        B rows follow the take→materialise→reduce chain; C written once."""
        st = self.stats
        by = (st["a_dense_bytes"]
              + 3 * self.gathered_rows * k * 4
              + self.m * k * 4)
        return {"bytes": int(by), "gathered_rows": self.gathered_rows}


def prepare_panel(
    g: CSRGraph,
    tm: int = 128,
    hub_threshold: int = 512,
    hub_width: int = 2048,
    u_bucket_min: int = 128,
    precision=None,
    **_unused,
) -> PanelPlan:
    """Build the panel plan.  Requires rows sorted hub-first — i.e. the
    graph should be DEG-ordered (or any order where rows with degree ≥
    hub_threshold form a prefix); if not, apply 'deg' reordering first.
    """
    deg = g.degrees
    is_hub = deg >= hub_threshold
    n_hubs = int(is_hub.sum())
    if not bool(is_hub[:n_hubs].all()):
        raise NotImplementedError(
            "prepare_panel requires hub rows to form a prefix; apply the "
            "'deg' ordering first (flex_tpu.reorder.reorder(g, 'deg'))"
        )
    if precision is None:
        # TPU MXU defaults to single-pass bf16 multiplication for f32
        # operands, which fails the eps·row_nnz·4 tolerance; HIGHEST uses
        # enough bf16 passes to recover ~f32 accuracy.
        precision = (
            jax.lax.Precision.DEFAULT
            if jax.default_backend() == "cpu"
            else jax.lax.Precision.HIGHEST
        )

    rows = repeat_arange(deg, total=g.nnz)
    cols = g.col.astype(np.int64)
    vals = g.vals

    # ---- hub path: chunk each hub row's nnz into hub_width pieces ----
    hub_mask_e = rows < n_hubs
    h_rows, h_cols, h_vals = rows[hub_mask_e], cols[hub_mask_e], vals[hub_mask_e]
    if len(h_rows):
        n_chunks_per = -(-deg[:n_hubs] // hub_width)
        Nh = int(n_chunks_per.sum())
        hub_cols = np.zeros((Nh, hub_width), dtype=np.int32)
        hub_vals = np.zeros((Nh, hub_width), dtype=np.float32)
        chunk_row = np.repeat(np.arange(n_hubs, dtype=np.int32), n_chunks_per)
        row_start = np.zeros(n_hubs + 1, dtype=np.int64)
        np.cumsum(deg[:n_hubs], out=row_start[1:])
        pos = np.arange(len(h_rows)) - row_start[h_rows]
        chunk_start = np.zeros(n_hubs + 1, dtype=np.int64)
        np.cumsum(n_chunks_per, out=chunk_start[1:])
        chunk_idx = chunk_start[h_rows] + pos // hub_width
        hub_cols[chunk_idx, pos % hub_width] = h_cols
        hub_vals[chunk_idx, pos % hub_width] = h_vals
    else:
        Nh = 0
        hub_cols = np.zeros((0, hub_width), np.int32)
        hub_vals = np.zeros((0, hub_width), np.float32)
        chunk_row = np.zeros((0,), np.int32)

    # ---- tail path: tm-row panels over rows [n_hubs, m) ----
    from flex_tpu.tiling.panels import build_panels

    tail = CSRGraph(
        row_ptr=(g.row_ptr[n_hubs:] - g.row_ptr[n_hubs]),
        col=g.col[g.row_ptr[n_hubs]:],
        vals=g.vals[g.row_ptr[n_hubs]:],
        name=g.name, order=g.order,
    )
    buckets = []
    gathered = Nh * hub_width
    n_panels = 0
    if tail.m > 0 and tail.nnz > 0:
        pf = build_panels(tail, tm=tm, u_align=8)
        n_panels = pf.n_panels
        u_len = pf.u_len.astype(np.int64)
        width = np.maximum(
            u_bucket_min,
            2 ** np.ceil(np.log2(np.maximum(u_len, 1))).astype(np.int64),
        )
        for u_pad in np.unique(width):
            sel = np.where(width == u_pad)[0]
            u_pad = int(u_pad)
            P = len(sel)
            a_dense = np.zeros((P, tm, u_pad), dtype=np.float32)
            ucols = np.zeros((P, u_pad), dtype=np.int32)
            ucols[:, :] = pf.ucols[sel, :1]  # pad: repeat panel's first col
            take_w = min(u_pad, pf.u_pad)
            ucols[:, :take_w] = pf.ucols[sel, :take_w]
            # add.at: padding sentinels land on (0, 0) with value 0 and must
            # not clobber a real nonzero stored there.
            p_local = np.repeat(np.arange(P), pf.e_pad)
            np.add.at(
                a_dense,
                (p_local, pf.e_row[sel].ravel(), pf.e_slot[sel].ravel()),
                pf.e_val[sel].ravel(),
            )
            buckets.append(
                (jnp.asarray(a_dense), jnp.asarray(ucols),
                 jnp.asarray(sel.astype(np.int32)))
            )
            gathered += P * u_pad

    data = {
        "hub_cols": jnp.asarray(hub_cols),
        "hub_vals": jnp.asarray(hub_vals),
        "hub_chunk_row": jnp.asarray(chunk_row),
        "buckets": tuple(buckets),
    }
    return PanelPlan(
        m=g.m, tm=tm, n_hub_rows=n_hubs, n_panels=n_panels,
        precision=precision, data=data, gathered_rows=gathered,
    )


def spmm_panel(g: CSRGraph, B, **kwargs):
    plan = prepare_panel(g, **kwargs)
    return plan(jnp.asarray(B))


def _panel_flatten(p: PanelPlan):
    return (p.data,), (p.m, p.tm, p.n_hub_rows, p.n_panels, p.precision,
                       p.gathered_rows)


def _panel_unflatten(aux, children):
    m, tm, n_hub_rows, n_panels, precision, gathered = aux
    return PanelPlan(m=m, tm=tm, n_hub_rows=n_hub_rows, n_panels=n_panels,
                     precision=precision, data=children[0],
                     gathered_rows=gathered)


jax.tree_util.register_pytree_node(PanelPlan, _panel_flatten, _panel_unflatten)
