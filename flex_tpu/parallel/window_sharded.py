"""Row-sharded windowed-hybrid SpMM across a device mesh.

Composes the two proven pieces per shard (SURVEY.md §5.8; measured
motivation in docs/measurements.md: the windowed dense format is
HBM-capacity-gated at amazon scale on ONE chip but fits per row shard):

- the **dense windowed part** runs under `shard_map`: every shard holds
  its own step-major window format (padded to the max step count across
  shards, as shard_map's uniform-shape rule requires; pad steps hit an
  extra dump panel with sentinel B blocks and zero A), and each device
  runs the same Pallas program on its shard against a replicated B.
- the **residue** stays on each shard's device (it is an output of the
  shard's format build) and forms a sharded ELL under the SAME row
  bounds as the dense part; both parts produce full [m, k] outputs and
  sum.

Like the single-chip plan, row ownership is exclusive by construction:
no inter-chip reduction exists for either part (C rows are disjoint per
shard).

Round-3 build (VERDICT r02 item 8): the build is fully device-resident.
Per-shard CSR slices are cut from the resident :class:`DeviceCSR` on
device (the row bounds are static) and moved to the shard's own mesh
device (ICI on real hardware — never back through the host), the dense
format AND the residue ELL buckets are built by device programs executing
on that device, and the host ships only O(P·nblk) selection tables per
shard.  No nnz-sized host array is touched: the builder works from a
graph handle that only needs (m, n, nnz, row_ptr, degrees) on host.

The residue shares the dense shards' row bounds (its chunks are born on
each shard's device); per-shard residue nnz may be less balanced than
the total-nnz split — reported in ``stats['res_imbalance']``.
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
    G, WindowedPlan, _build_windowed, _build_windowed_ell, _window_pallas,
    _window_xla, pattern_is_unique, window_select,
)
from flex_tpu.parallel.spmm_sharded import (
    ShardedEllPlan, _split_rows_by_nnz, mesh_shard_devices, stack_ell_plans,
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
    res_shard_nnz: tuple = ()
    # per-shard (dense_bytes, min_count_eff, coverage) — the realized
    # budgeted selection per chip
    shard_sel: tuple = ()
    fn: Any = None

    def __call__(self, B) -> jax.Array:
        from flex_tpu.ops.lanes import pad_k_lanes, unpad_k_lanes

        k_out = B.shape[1]
        # pad k<128 to the 128-lane layout once for both halves, like the
        # single-chip _windowed_call (sub-128-lane dense/gather chains are
        # pathological — docs/measurements.md)
        B = pad_k_lanes(B)
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
            has_res = self.ell.nnz > 0

            @jax.jit
            def fn(A, first, out_panel, win_step, row_gather, ell, B):
                out = mapped(A, first, out_panel, win_step, row_gather, B)
                dense = jnp.concatenate(
                    [out[d, : r1 - r0] for d, (r0, r1) in enumerate(bounds)],
                    axis=0,
                )
                # residue under the SAME jit (the single-chip hybrid runs
                # one program too): one dispatch, and XLA can overlap the
                # independent dense and gather chains.  (The single-chip
                # hybrid scatters partials straight into dense via
                # ``into=``; here the residue is a ShardedEllPlan whose
                # per-shard partials combine inside its own shard_map, so
                # the full-m add stays.)
                return dense + ell(B) if has_res else dense

            self.fn = fn
        out = self.fn(self.A, self.first, self.out_panel, self.win_step,
                      self.row_gather, self.ell, B)
        return unpad_k_lanes(out, k_out)

    @property
    def stats(self) -> dict:
        d = {
            "n_shards": len(self.row_bounds),
            "coverage": round(self.coverage, 4),
            "dense_bytes": int(np.prod(self.A.shape)) * 4,
            "S_max": int(self.A.shape[1]),
            "n_res": self.ell.nnz,
            "impl": self.impl,
        }
        if self.res_shard_nnz:
            avg = max(sum(self.res_shard_nnz) / len(self.res_shard_nnz), 1)
            d["res_imbalance"] = round(max(self.res_shard_nnz) / avg - 1, 3)
        if self.shard_sel:
            d["min_count_eff"] = max(s[1] for s in self.shard_sel)
        return d


def _swin_flatten(p: ShardedWindowedPlan):
    children = (p.A, p.first, p.out_panel, p.win_step, p.row_gather, p.ell)
    aux = (p.mesh, p.axis, p.m, p.n, p.tm, p.W, tuple(p.row_bounds),
           p.m_shard_pad, p.n_panels_pad, p.coverage, p.interpret, p.impl,
           p.precision, tuple(p.res_shard_nnz), tuple(p.shard_sel))
    return children, aux


def _swin_unflatten(aux, children):
    (mesh, axis, m, n, tm, W, bounds, m_pad, n_pan, cov, interp, impl,
     prec, res_nnz, shard_sel) = aux
    return ShardedWindowedPlan(
        mesh=mesh, axis=axis, m=m, n=n, tm=tm, W=W,
        row_bounds=list(bounds), m_shard_pad=m_pad, n_panels_pad=n_pan,
        A=children[0], first=children[1], out_panel=children[2],
        win_step=children[3], row_gather=children[4], ell=children[5],
        coverage=cov, interpret=interp, impl=impl, precision=prec,
        res_shard_nnz=res_nnz, shard_sel=shard_sel,
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
    dev: DeviceCSR | None = None,
) -> ShardedWindowedPlan:
    """Shard rows by nnz; per shard run the single-chip window selection
    and device format build ON the shard's own device; residues stay on
    their shard and form a same-bounds sharded ELL.  ``max_dense_bytes``
    is a PER-SHARD (per-chip HBM) budget: each shard's selection is
    byte-budgeted exactly like the single-chip plan's (window_select
    auto-raises the count gate to fit), so large graphs coarsen per
    shard instead of refusing.  Refuses (ValueError) only when total
    coverage falls below ``min_coverage``.

    ``g`` only needs host (m, n, nnz, row_ptr, degrees); nnz-sized data
    comes from the resident ``dev`` (uploaded once by the loader,
    reference ``cuda_alloc_cpy`` ``DataLoader.cu:167-218``)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    axis = axis or mesh.axis_names[0]
    D = mesh.shape[axis]
    if dev is None:
        dev = DeviceCSR.from_graph(g)
    bounds = _split_rows_by_nnz(g, D)
    nblk = max(-(-g.n // W), 1)

    # mesh devices along the sharded axis (devices on other axes replicate)
    sh = NamedSharding(mesh, P(axis, None, None, None))
    sh2 = NamedSharding(mesh, P(axis, None))

    # --- per-shard: device CSR slice -> own device -> select + build ------
    sels, shard_devs, shard_meta = [], [], []
    devices_of_shard, shard_of_device = mesh_shard_devices(mesh, axis, D)

    full_unique = pattern_is_unique(g)
    for d_idx, (r0, r1) in enumerate(bounds):
        ms = r1 - r0
        s0, s1 = int(g.row_ptr[r0]), int(g.row_ptr[r1])
        home = devices_of_shard[d_idx][0]
        # static-bound slices of the resident CSR, moved device-to-device
        # (ICI on real hardware) — the host never re-ships nnz data
        row_ptr_s = jax.device_put(
            dev.row_ptr[r0:r1 + 1] - dev.row_ptr[r0], home)
        col_s = jax.device_put(dev.col[s0:s1], home)
        vals_s = jax.device_put(dev.vals[s0:s1], home)
        dev_s = DeviceCSR(row_ptr=row_ptr_s, col=col_s, vals=vals_s,
                          m=ms, n=g.n, nnz=s1 - s0)
        # hand the shard host col/degrees VIEWS when the full graph has
        # them: window_select's histogram can then take the host-bincount
        # path past _HIST_D2H_MAX_BYTES (at amazon scale the per-shard
        # device hist would be a ~75 MB D2H through the relay, ~5 min
        # per shard) — zero-copy slices, the device build is unaffected
        host_kw = {}
        if getattr(g, "col", None) is not None and \
                getattr(g, "degrees", None) is not None:
            host_kw = {"col": g.col[s0:s1], "degrees": g.degrees[r0:r1]}
        gs = SimpleNamespace(m=ms, n=g.n, nnz=s1 - s0, **host_kw)
        sel = window_select(gs, tm=tm, W=W, J=J, min_count=min_count,
                            dev=dev_s,
                            max_dense_bytes=min(max_dense_bytes,
                                                (2**31 - 2) * 4))
        # duplicate detection: the full-graph verdict subsumes the
        # per-shard one (row slices of a duplicate-free graph are
        # duplicate-free), and it also covers shards without host data
        sel["unique_rc"] = full_unique
        sels.append(sel)
        shard_devs.append(dev_s)
        shard_meta.append((r0, r1, home))
    covered = sum(round(s["coverage"] * d.nnz)
                  for s, d in zip(sels, shard_devs))
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
    A_shape = (D, S_max, tm, G * W)

    from flex_tpu.ops.ell_spmm import EllPlan, host_bucket_sizes
    from flex_tpu.parallel.spmm_sharded import SHARDED_WIDTHS

    # Fused per-shard build (dense A + residue ELL in one program per
    # shard, zero per-shard D2H) needs every shard's residue degrees on
    # host — window_select provides them whenever the caller handed host
    # col/degrees views.  The common (maxed) bucket allocation is then
    # known BEFORE any build.
    use_fused = all(s.get("res_deg") is not None for s in sels)
    allocs: dict[int, int] = {}
    shard_byw: list = []
    if use_fused:
        for sel in sels:
            by_w, n_rows_last, _ = host_bucket_sizes(
                np.asarray(sel["res_deg"], dtype=np.int64), SHARDED_WIDTHS)
            shard_byw.append((by_w, n_rows_last))
            for w, nc in by_w.items():
                allocs[w] = max(allocs.get(w, 0), nc)
        live_ws = [int(w) for w in SHARDED_WIDTHS if allocs.get(int(w), 0)]
        padded_alloc = sum(allocs[w] * w for w in live_ws)

    A_per_device: dict = {}
    first_sh, op_sh, ws_sh, rg_sh = [], [], [], []
    shard_residues = []
    res_plans: list = []
    res_nnz: list[int] = []
    for d_idx, (dev_s, sel) in enumerate(zip(shard_devs, sels)):
        r0, r1, home = shard_meta[d_idx]
        # tables upload O(P·nblk) to the shard's device; the O(nnz) build
        # then executes there (its inputs are committed to `home`)
        slot_d = jax.device_put(sel["slot"], home)
        pstep0_d = jax.device_put(sel["pstep0"].astype(np.int32), home)
        layout = (dev_s.nnz, dev_s.m, tm, W, nblk, sel["n_res"],
                  sel["total_steps"], sel["G"], sel.get("unique_rc", False))
        if use_fused:
            by_w, n_rows_last = shard_byw[d_idx]
            ell_meta = (SHARDED_WIDTHS[-1], tuple(SHARDED_WIDTHS),
                        tuple((w, allocs[w], by_w.get(w, 0))
                              for w in live_ws),
                        n_rows_last)
            A, buckets, chunk_row = _build_windowed_ell(
                dev_s.row_ptr, dev_s.col, dev_s.vals, slot_d, pstep0_d,
                layout=layout, ell_meta=ell_meta,
                chunks=sel.get("build_chunks"))
            res_plans.append(EllPlan(
                m=dev_s.m, buckets=buckets, chunk_row=chunk_row,
                padded_nnz=padded_alloc if live_ws else 0,
                nnz=sel["n_res"]))
            res_nnz.append(int(sel["n_res"]))
        else:
            A, res_col, res_vals, res_rp = _build_windowed(
                dev_s.row_ptr, dev_s.col, dev_s.vals, slot_d, pstep0_d,
                layout=layout, chunks=sel.get("build_chunks"))
        S = sel["total_steps"]
        A_pad = jnp.pad(A, ((0, S_max - S), (0, 0), (0, 0)))[None]
        for dvc in devices_of_shard[d_idx]:
            moved = jax.device_put(A_pad, dvc)
            # backpressure so transient multi-GB A_pad copies don't pile
            # up on the build device; block_until_ready is a no-op under
            # the axon relay (CLAUDE.md) — sync via a tiny D2H instead
            from flex_tpu.bench.harness import _sync

            _sync(moved)
            A_per_device[dvc] = moved
        del A, A_pad
        if not use_fused:
            shard_residues.append((res_col, res_vals, res_rp,
                                   np.asarray(res_rp).astype(np.int64)))
        first_sh.append(np.pad(sel["first"], (0, S_max - S),
                               constant_values=1))
        op_sh.append(np.pad(sel["out_panel"], (0, S_max - S),
                            constant_values=U_max))
        ws_sh.append(np.pad(sel["win_step"], (0, (S_max - S) * G),
                            constant_values=nblk))
        # reuse the selection's assembly permutation (window_select's
        # row_gather); only the sentinel differs — the sharded layout's
        # shared dump/zero row instead of the single-plan appended row
        sel_rg = sel["row_gather"].astype(np.int64)  # copy
        sel_rg[sel_rg == len(sel["used"]) * tm] = zero_row
        rg_full = np.full(m_shard_pad, zero_row, dtype=np.int64)
        rg_full[:len(sel_rg)] = sel_rg
        rg_sh.append(rg_full.astype(np.int32))

    A_stack = jax.make_array_from_single_device_arrays(
        A_shape, sh, [A_per_device[dvc]
                      for dvc in shard_of_device])
    first_st = jax.device_put(np.stack(first_sh), sh2)
    op_st = jax.device_put(np.stack(op_sh), sh2)
    ws_st = jax.device_put(np.stack(ws_sh), sh2)
    rg_st = jax.device_put(np.stack(rg_sh), sh2)

    # --- residue: per-shard device ELL under the SAME row bounds ---------
    if use_fused:
        ell = stack_ell_plans(
            mesh, axis, g.m, bounds, res_plans, allocs, m_shard_pad,
            devices_of_shard, shard_of_device, widths=SHARDED_WIDTHS)
    else:
        # common (maxed) bucket allocation so every shard shares one
        # program — only computable after the builds here (the residue
        # row_ptr had to come back from each device)
        for *_, rp_host in shard_residues:
            by_w, _, _ = host_bucket_sizes(np.diff(rp_host), SHARDED_WIDTHS)
            for w, nc in by_w.items():
                allocs[w] = max(allocs.get(w, 0), nc)
        ell = _assemble_sharded_residue(
            mesh, axis, g, bounds, shard_residues, allocs, m_shard_pad,
            devices_of_shard, shard_of_device)
        res_nnz = [int(rp[-1]) for *_, rp in shard_residues]

    return ShardedWindowedPlan(
        mesh=mesh, axis=axis, m=g.m, n=g.n, tm=tm, W=W,
        row_bounds=bounds, m_shard_pad=m_shard_pad,
        n_panels_pad=n_panels_pad, A=A_stack, first=first_st,
        out_panel=op_st, win_step=ws_st, row_gather=rg_st, ell=ell,
        coverage=coverage, interpret=interpret, impl=impl,
        res_shard_nnz=tuple(res_nnz),
        shard_sel=tuple(
            (int(s["dense_bytes"]), int(s["min_count_eff"]),
             round(float(s["coverage"]), 4)) for s in sels),
    )


def _assemble_sharded_residue(mesh, axis, g, bounds, shard_residues,
                              allocs, m_shard_pad, devices_of_shard,
                              shard_of_device) -> ShardedEllPlan:
    """Per-shard residue CSR (already resident on each shard's device) →
    one :class:`ShardedEllPlan` with common bucket shapes, assembled from
    single-device arrays — nothing moves through the host."""
    from flex_tpu.ops.ell_spmm import prepare_ell_device
    from flex_tpu.parallel.spmm_sharded import SHARDED_WIDTHS

    plans = []
    for d_idx, (res_col, res_vals, res_rp, rp_host) in \
            enumerate(shard_residues):
        plans.append(prepare_ell_device(
            res_rp, res_col, res_vals, m=bounds[d_idx][1] - bounds[d_idx][0],
            nnz=int(rp_host[-1]), res_row_ptr_host=rp_host,
            widths=SHARDED_WIDTHS, bucket_alloc=allocs))
    return stack_ell_plans(mesh, axis, g.m, bounds, plans, allocs,
                           m_shard_pad, devices_of_shard, shard_of_device,
                           widths=SHARDED_WIDTHS)
