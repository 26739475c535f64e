"""Row-sharded windowed-hybrid SpMM across a device mesh.

Composes the two proven pieces per shard (SURVEY.md §5.8; measured
motivation in docs/measurements.md: the windowed dense format is
HBM-capacity-gated at amazon scale on ONE chip but fits per row shard):

- the **dense windowed part** runs under `shard_map`: every shard holds
  its own step-major window format (padded to the max step count across
  shards, as shard_map's uniform-shape rule requires; pad steps hit an
  extra dump panel with sentinel B blocks and zero A), and each device
  runs the same Pallas program on its shard against a replicated B.
- the **residue** across all shards forms one global residue CSR (host
  mask pass) and rides :func:`flex_tpu.parallel.prepare_ell_sharded`,
  which balances rows by residue nnz *independently* — the two parts
  produce full [m, k] outputs under their own row partitions and sum,
  so their shard boundaries need not agree.

Like the single-chip plan, row ownership is exclusive by construction:
no inter-chip reduction exists for either part (C rows are disjoint per
shard).

Known limitation (documented, beyond-reference scope): the per-shard
dense formats are built by per-shard device programs, not yet by a
distributed build — on real multi-chip hardware the build serialises
through the default device one shard at a time (each shard's A is moved
to its own device as soon as it is built, so the default device's
high-water mark is ~one shard's dense array, not the full format), and
the per-shard CSR slices are uploaded from host rather than sliced from
a resident DeviceCSR.
"""
from __future__ import annotations

import dataclasses
from types import SimpleNamespace
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flex_tpu.ops.window_spmm import (
    G, WindowedPlan, _build_windowed, _window_pallas, _window_xla,
    window_select,
)
from flex_tpu.parallel.spmm_sharded import (
    ShardedEllPlan, _split_rows_by_nnz, prepare_ell_sharded,
)
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR


@dataclasses.dataclass
class ShardedWindowedPlan:
    mesh: Mesh
    axis: str
    m: int
    n: int
    tm: int
    W: int
    row_bounds: list[tuple[int, int]]
    m_shard_pad: int
    n_panels_pad: int        # incl. the dump panel
    A: Any                   # f32 [D, S_max, TM, G*W], sharded dim 0
    first: Any               # i32 [D, S_max]
    out_panel: Any           # i32 [D, S_max]
    win_step: Any            # i32 [D, S_max*G]
    row_gather: Any          # i32 [D, m_shard_pad]
    ell: ShardedEllPlan      # global residue (its own row balance)
    coverage: float
    interpret: bool
    impl: str = "pallas"
    precision: Any = jax.lax.Precision.HIGHEST
    fn: Any = None

    def __call__(self, B) -> jax.Array:
        if self.fn is None:
            ax = self.axis
            W, n, n_pan = self.W, self.n, self.n_panels_pad
            tm = self.tm
            impl, prec, interp = self.impl, self.precision, self.interpret
            m_pad = self.m_shard_pad
            nblk = max(-(-n // W), 1)

            def local(A, first, out_panel, win_step, row_gather, B):
                k = B.shape[1]
                B_pad = jnp.zeros(((nblk + 1) * W, k), jnp.float32).at[
                    :n].set(B)
                if impl == "xla":
                    out = _window_xla(win_step[0], A[0], B_pad,
                                      out_panel[0], n_panels=n_pan, W=W,
                                      k=k, precision=prec)
                else:
                    out = _window_pallas(first[0], out_panel[0],
                                         win_step[0], A[0], B_pad,
                                         n_panels=n_pan, W=W, k=k,
                                         precision=prec, interpret=interp)
                cat = jnp.concatenate(
                    [out, jnp.zeros((1, k), jnp.float32)], axis=0)
                return cat[row_gather[0]][None]

            mapped = jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(ax, None, None, None), P(ax, None), P(ax, None),
                          P(ax, None), P(ax, None), P(None, None)),
                out_specs=P(ax, None, None),
                # pallas_call's out ShapeDtypeStruct carries no vma info
                check_vma=False,
            )
            bounds = self.row_bounds

            @jax.jit
            def fn(A, first, out_panel, win_step, row_gather, B):
                out = mapped(A, first, out_panel, win_step, row_gather, B)
                return jnp.concatenate(
                    [out[d, : r1 - r0] for d, (r0, r1) in enumerate(bounds)],
                    axis=0,
                )

            self.fn = fn
        dense = self.fn(self.A, self.first, self.out_panel, self.win_step,
                        self.row_gather, B)
        if self.ell.nnz == 0:
            return dense
        return dense + self.ell(B)

    @property
    def stats(self) -> dict:
        return {
            "n_shards": len(self.row_bounds),
            "coverage": round(self.coverage, 4),
            "dense_bytes": int(np.prod(self.A.shape)) * 4,
            "S_max": int(self.A.shape[1]),
            "n_res": self.ell.nnz,
            "impl": self.impl,
        }


def _swin_flatten(p: ShardedWindowedPlan):
    children = (p.A, p.first, p.out_panel, p.win_step, p.row_gather, p.ell)
    aux = (p.mesh, p.axis, p.m, p.n, p.tm, p.W, tuple(p.row_bounds),
           p.m_shard_pad, p.n_panels_pad, p.coverage, p.interpret, p.impl,
           p.precision)
    return children, aux


def _swin_unflatten(aux, children):
    (mesh, axis, m, n, tm, W, bounds, m_pad, n_pan, cov, interp, impl,
     prec) = aux
    return ShardedWindowedPlan(
        mesh=mesh, axis=axis, m=m, n=n, tm=tm, W=W,
        row_bounds=list(bounds), m_shard_pad=m_pad, n_panels_pad=n_pan,
        A=children[0], first=children[1], out_panel=children[2],
        win_step=children[3], row_gather=children[4], ell=children[5],
        coverage=cov, interpret=interp, impl=impl, precision=prec,
    )


jax.tree_util.register_pytree_node(
    ShardedWindowedPlan, _swin_flatten, _swin_unflatten
)


def prepare_windowed_sharded(
    g: CSRGraph,
    mesh: Mesh,
    axis: str | None = None,
    tm: int = 256,
    W: int = 128,
    J: int = 1024,
    min_count: int = 128,
    min_coverage: float = 0.15,
    max_dense_bytes: int = 6 << 30,
    impl: str = "pallas",
    interpret: bool | None = None,
) -> ShardedWindowedPlan:
    """Shard rows by nnz; per shard run the single-chip window selection
    and device format build; residues recombine into one global CSR for
    the sharded ELL path.  Refuses (ValueError) when total coverage is
    below ``min_coverage`` or any shard's dense format exceeds
    ``max_dense_bytes`` (also the _build_windowed int32 index guard —
    same rules as the single-chip plan)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    axis = axis or mesh.axis_names[0]
    D = mesh.shape[axis]
    bounds = _split_rows_by_nnz(g, D)
    nblk = max(-(-g.n // W), 1)

    # --- per-shard selection (host) + hit masks ---------------------------
    sels, shard_graphs = [], []
    for r0, r1 in bounds:
        ms = r1 - r0
        s0, s1 = int(g.row_ptr[r0]), int(g.row_ptr[r1])
        gs = SimpleNamespace(
            m=ms, n=g.n, nnz=s1 - s0,
            row_ptr=g.row_ptr[r0:r1 + 1] - g.row_ptr[r0],
            degrees=g.degrees[r0:r1],
            col=g.col[s0:s1],
        )
        sel = window_select(gs, tm=tm, W=W, J=J, min_count=min_count)
        if sel["dense_bytes"] > min(max_dense_bytes, (2**31 - 2) * 4):
            raise ValueError(
                f"shard [{r0},{r1}) dense array too big: "
                f"{sel['dense_bytes']/1e9:.2f} GB — raise min_count or "
                f"use more shards")
        sels.append(sel)
        shard_graphs.append((gs, s0, s1))
    covered = sum(round(s["coverage"] * gs.nnz)
                  for s, (gs, _, _) in zip(sels, shard_graphs))
    coverage = covered / max(g.nnz, 1)
    if coverage < min_coverage:
        raise ValueError(
            f"sharded window coverage {coverage:.3f} < {min_coverage} — "
            f"use prepare_ell_sharded (or apply rbdeg first)")

    S_max = max(s["total_steps"] for s in sels)
    P_max = max(-(-(r1 - r0) // tm) for r0, r1 in bounds)
    U_max = max(s["n_used_panels"] for s in sels)
    n_panels_pad = U_max + 1  # + dump panel for padded steps
    m_shard_pad = P_max * tm
    zero_row = n_panels_pad * tm  # index of the appended zero row

    # Per-shard device placement: each shard's dense A moves to its own
    # mesh device as soon as it is built, then the global array is
    # assembled from the single-device shards — the full [D, ...] stack
    # never materialises on one chip (review round-2 finding: stacking
    # first would need the whole unsharded footprint on the default
    # device, defeating the capacity purpose of sharding).
    sh = NamedSharding(mesh, P(axis, None, None, None))
    sh2 = NamedSharding(mesh, P(axis, None))
    A_shape = (D, S_max, tm, G * W)
    # device -> which dim-0 shard it holds (devices on other mesh axes
    # replicate their shard)
    shard_of_device = {
        dvc: (idx[0].start or 0)
        for dvc, idx in sh.addressable_devices_indices_map(A_shape).items()
    }

    A_per_device: dict = {}
    first_sh, op_sh, ws_sh, rg_sh = [], [], [], []
    res_masks, res_degs = [], []
    for d_idx, ((gs, s0, s1), sel) in enumerate(zip(shard_graphs, sels)):
        dev_s = DeviceCSR(
            row_ptr=jnp.asarray(gs.row_ptr.astype(np.int64)),
            col=jnp.asarray(gs.col.astype(np.int32)),
            vals=jnp.asarray(g.vals[s0:s1]),
            m=gs.m, n=gs.n, nnz=gs.nnz,
        )
        A, _, _, _ = _build_windowed(
            dev_s.row_ptr, dev_s.col, dev_s.vals,
            jnp.asarray(sel["slot"]),
            jnp.asarray(sel["pstep0"].astype(np.int32)),
            layout=(gs.nnz, gs.m, tm, W, nblk, sel["n_res"],
                    sel["total_steps"], sel["G"]),
        )
        S = sel["total_steps"]
        A_pad = jnp.pad(A, ((0, S_max - S), (0, 0), (0, 0)))[None]
        # move this shard to its device(s) NOW — the build device's
        # high-water mark stays at ~one shard's dense array
        for dvc, shard in shard_of_device.items():
            if shard == d_idx:
                moved = jax.device_put(A_pad, dvc)
                moved.block_until_ready()
                A_per_device[dvc] = moved
        del A, A_pad, dev_s
        first_sh.append(np.pad(sel["first"], (0, S_max - S),
                               constant_values=1))
        op_sh.append(np.pad(sel["out_panel"], (0, S_max - S),
                            constant_values=U_max))
        ws_sh.append(np.pad(sel["win_step"], (0, (S_max - S) * G),
                            constant_values=nblk))
        used = sel["used"]
        P_s = -(-gs.m // tm)
        row_src = np.full(P_s, -1, dtype=np.int64)
        row_src[used] = np.arange(len(used))
        rg = np.full((P_s, tm), zero_row, dtype=np.int64)
        rg[used] = (row_src[used][:, None] * tm
                    + np.arange(tm, dtype=np.int64)[None, :])
        rg_full = np.full(m_shard_pad, zero_row, dtype=np.int64)
        rg_full[:P_s * tm] = rg.ravel()
        rg_sh.append(rg_full.astype(np.int32))
        # residue mask on host (avoids an nnz-sized D2H round trip; the
        # slot table is the same one the device build consumes)
        rows_s = np.repeat(np.arange(gs.m, dtype=np.int64), gs.degrees)
        key = (rows_s // tm) * nblk + gs.col.astype(np.int64) // W
        miss = sel["slot"][key] == 0
        res_masks.append(miss)
        res_degs.append(np.bincount(rows_s[miss], minlength=gs.m))

    A_stack = jax.make_array_from_single_device_arrays(
        A_shape, sh, list(A_per_device.values()))
    first_st = jax.device_put(np.stack(first_sh), sh2)
    op_st = jax.device_put(np.stack(op_sh), sh2)
    ws_st = jax.device_put(np.stack(ws_sh), sh2)
    rg_st = jax.device_put(np.stack(rg_sh), sh2)

    # --- global residue graph -> independently balanced sharded ELL ------
    res_deg = np.concatenate(res_degs)
    res_row_ptr = np.zeros(g.m + 1, dtype=np.int64)
    np.cumsum(res_deg, out=res_row_ptr[1:])
    miss_all = np.concatenate(res_masks)
    g_res = CSRGraph.from_arrays(
        res_row_ptr, g.col[miss_all], g.vals[miss_all],
        name=f"{g.name}_res", order=g.order)
    ell = prepare_ell_sharded(g_res, mesh, axis=axis)

    return ShardedWindowedPlan(
        mesh=mesh, axis=axis, m=g.m, n=g.n, tm=tm, W=W,
        row_bounds=bounds, m_shard_pad=m_shard_pad,
        n_panels_pad=n_panels_pad, A=A_stack, first=first_st,
        out_panel=op_st, win_step=ws_st, row_gather=rg_st, ell=ell,
        coverage=coverage, interpret=interpret, impl=impl,
    )
