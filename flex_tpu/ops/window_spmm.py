"""Windowed-panel hybrid SpMM — dense MXU blocks + gather-ELL residue.

The TPU re-expression of ASpT's dense/sparse split (reference
``aspt/sspmm_128.cu:1089-1398``: dense-block extraction with a MIN_OCC
occupancy gate, sparse leftovers in a CSR kernel) and of Flex's
tile-densification thesis (``mat.cu:680-942``): after a clustering
ordering (rbdeg/rabbit), community structure concentrates each row
panel's nonzeros into a few column blocks.  Those blocks become *dense*
A tiles fed to the MXU through Pallas blockspec DMA — no gather at all —
and the out-of-window residue rides the proven ELL gather path; the two
outputs sum.

Format (per row panel of ``tm`` rows):
- the panel's ``W``-aligned column blocks are ranked by nnz count; the
  top ``J`` with count ≥ ``min_count`` become windows (break-even on this
  chip: a (256, 256) A tile costs ~384 KB of HBM traffic ≈ the gather
  cost of ~130-170 nnz — docs/measurements.md).
- dense A is one f32 [P, TM, J·W] array built ON DEVICE by a single
  scatter from the resident CSR (`DeviceCSR`); the host ships only the
  O(P·nblk) block→slot lookup table and O(m) residue metadata.
- the residue (entries outside every window) is compacted on device into
  a contiguous CSR-ordered (col, val) pair and handed to
  :func:`flex_tpu.ops.ell_spmm.prepare_ell`.

Kernel: one grid step per panel; J scalar-prefetch-indexed (W, k) B
blocks are concatenated in VMEM and hit with ONE MXU dot
(TM, J·W) x (J·W, k) — the generalisation of ``pallas_band``'s two-dot
scheme to J windows.  Unused window slots point at a zero B block past
the end of B (sentinel), with all-zero A columns.
"""
from __future__ import annotations

import dataclasses
import functools
from types import SimpleNamespace
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR
from flex_tpu.ops.ell_spmm import EllPlan, prepare_ell


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def window_select(
    g: CSRGraph, tm: int = 256, W: int = 256, J: int = 16,
    min_count: int = 128,
) -> dict:
    """Host-side window selection + stats (shared with the autotuner).

    Returns dict with:
      win       int32[P, J]   selected block ids, sentinel = nblk for pads
      slot      int32[P*nblk] 0 = residue, j+1 = window slot j
      coverage  float         fraction of nnz inside windows
      res_deg   int64[m]      residue degree per row
      dense_bytes int
    O(nnz) host work: one repeat, one bincount, one argpartition row-wise,
    one table lookup.
    """
    m, nnz = g.m, g.nnz
    P = max(-(-m // tm), 1)
    nblk = max(-(-g.n // W), 1)
    rows = np.repeat(np.arange(m, dtype=np.int64), g.degrees)
    key = (rows // tm) * nblk + (g.col.astype(np.int64) // W)
    cnt = np.bincount(key, minlength=P * nblk).reshape(P, nblk)

    J_eff = min(J, nblk)
    top = np.argpartition(-cnt, J_eff - 1, axis=1)[:, :J_eff]
    top_cnt = np.take_along_axis(cnt, top, axis=1)
    valid = top_cnt >= min_count
    win = np.where(valid, top, nblk).astype(np.int32)  # sentinel = nblk
    if J_eff < J:
        win = np.concatenate(
            [win, np.full((P, J - J_eff), nblk, np.int32)], axis=1)
        valid = np.concatenate([valid, np.zeros((P, J - J_eff), bool)], axis=1)

    slot = np.zeros(P * nblk, dtype=np.int32)
    pw = np.repeat(np.arange(P, dtype=np.int64), J)
    jw = np.tile(np.arange(J, dtype=np.int64), P)
    vr = valid.ravel()
    slot[pw[vr] * nblk + win.ravel()[vr].astype(np.int64)] = jw[vr] + 1

    j1 = slot[key]
    hit = j1 > 0
    covered = int(hit.sum())
    res_deg = g.degrees - np.bincount(rows[hit], minlength=m)
    return {
        "win": win,
        "slot": slot,
        "coverage": covered / max(nnz, 1),
        "n_res": nnz - covered,
        "res_deg": res_deg,
        "dense_bytes": P * tm * J * W * 4,
        "P": P,
        "nblk": nblk,
    }


@functools.partial(jax.jit, static_argnames=("layout",))
def _build_windowed(dev_row_ptr, dev_col, dev_vals, slot_tab, *, layout):
    """Device format build from the resident CSR + the O(P·nblk) slot table.

    Returns (A [P, TM, J*W], res_col [n_res], res_vals [n_res]); residue
    entries keep CSR order, so the ELL builder's contiguous-slice layout
    stays valid.
    """
    nnz, P, TM, W, J, nblk, n_res = layout
    e = jnp.arange(nnz, dtype=jnp.int32)
    rows = jnp.searchsorted(dev_row_ptr, e, side="right").astype(jnp.int32) - 1
    p = rows // TM
    blk = dev_col // W
    j1 = slot_tab[p * nblk + blk]
    hit = j1 > 0
    j = j1 - 1

    flat = ((p * TM + rows % TM) * (J * W) + j * W + dev_col % W)
    dump = P * TM * J * W
    a = jnp.zeros((dump + 1,), jnp.float32).at[
        jnp.where(hit, flat, dump)
    ].add(jnp.where(hit, dev_vals, 0.0))
    A = a[:dump].reshape(P, TM, J * W)

    res_pos = jnp.cumsum(~hit) - 1  # int32-safe: nnz < 2^31
    pos = jnp.where(hit, n_res, res_pos)
    res_col = jnp.zeros((n_res + 1,), jnp.int32).at[pos].set(dev_col)[:n_res]
    res_vals = jnp.zeros((n_res + 1,), jnp.float32).at[pos].set(dev_vals)[:n_res]
    return A, res_col, res_vals


def _make_window_kernel(J, precision):
    def kernel(win_ref, a_ref, *refs):
        b_refs, o_ref = refs[:-1], refs[-1]
        bcat = jnp.concatenate([b[:] for b in b_refs], axis=0)  # (J*W, k)
        o_ref[:] = jax.lax.dot(
            a_ref[0], bcat, precision=precision,
            preferred_element_type=jnp.float32,
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("m", "n", "W", "J", "precision", "interpret")
)
def _windowed_pallas(A, win_flat, B, *, m, n, W, J, precision, interpret):
    P, TM, JW = A.shape
    k = B.shape[1]
    nblk = max(-(-n // W), 1)
    B_pad = jnp.zeros(((nblk + 1) * W, k), jnp.float32).at[:n].set(B)

    def b_spec(j):
        return pl.BlockSpec(
            (W, k), lambda p, w, j=j: (w[p * J + j], 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, TM, JW), lambda p, w: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            *[b_spec(j) for j in range(J)],
        ],
        out_specs=pl.BlockSpec((TM, k), lambda p, w: (p, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_window_kernel(J, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P * TM, k), jnp.float32),
        interpret=interpret,
    )(win_flat, A, *([B_pad] * J))
    return out[:m]


@functools.partial(jax.jit, static_argnames=("layout", "precision"))
def _windowed_xla(A, win_flat, B, *, layout, precision):
    """XLA fallback formulation (2D-index window take + batched einsum) —
    the baseline the Pallas kernel must beat, same trick as
    pallas_band._band_spmm_xla."""
    m, n, W, J = layout
    P, TM, JW = A.shape
    k = B.shape[1]
    nblk = max(-(-n // W), 1)
    B_pad = jnp.zeros(((nblk + 1) * W, k), jnp.float32).at[:n].set(B)
    idx = (win_flat.reshape(P, J)[:, :, None] * W
           + jnp.arange(W, dtype=jnp.int32)[None, None, :])
    Bw = B_pad[idx.reshape(P, J * W)]  # [P, J*W, k]
    out = jnp.einsum(
        "ptw,pwk->ptk", A, Bw, precision=precision,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(P * TM, k)[:m]


@dataclasses.dataclass
class WindowedPlan:
    """Hybrid plan: dense windowed MXU part + ELL residue part."""
    m: int
    n: int
    tm: int
    W: int
    J: int
    A: Any               # f32 [P, TM, J*W]
    win_flat: Any        # i32 [P*J] block ids (sentinel = nblk)
    ell: EllPlan         # residue
    coverage: float
    interpret: bool
    impl: str = "pallas"
    precision: Any = jax.lax.Precision.HIGHEST

    def __call__(self, B) -> jax.Array:
        if self.impl == "xla":
            dense = _windowed_xla(
                self.A, self.win_flat, B,
                layout=(self.m, self.n, self.W, self.J),
                precision=self.precision,
            )
        else:
            dense = _windowed_pallas(
                self.A, self.win_flat, B, m=self.m, n=self.n, W=self.W,
                J=self.J, precision=self.precision, interpret=self.interpret,
            )
        if self.ell.nnz == 0:
            return dense
        return dense + self.ell(B)

    @property
    def b_dtype(self) -> str:
        return self.ell.b_dtype

    @property
    def stats(self) -> dict:
        return {
            "coverage": round(self.coverage, 4),
            "dense_bytes": int(np.prod(self.A.shape)) * 4,
            "n_res": self.ell.nnz,
            "J": self.J,
            "W": self.W,
            "impl": self.impl,
        }


def prepare_windowed(
    g: CSRGraph,
    dev: DeviceCSR | None = None,
    tm: int = 256,
    W: int = 256,
    J: int = 16,
    min_count: int = 128,
    min_coverage: float = 0.15,
    max_dense_bytes: int = 6 << 30,
    b_dtype: str = "float32",
    interpret: bool | None = None,
    impl: str = "pallas",
    sel: dict | None = None,
) -> WindowedPlan:
    """Build the hybrid plan; refuses (ValueError) when windows would cover
    less than ``min_coverage`` of nnz (pure ELL wins there — the coverage
    model is shared with the autotuner via :func:`window_select`)."""
    if dev is None:
        dev = DeviceCSR.from_graph(g)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if sel is None:
        sel = window_select(g, tm=tm, W=W, J=J, min_count=min_count)
    if sel["dense_bytes"] > max_dense_bytes:
        raise ValueError(
            f"windowed dense array too big: {sel['dense_bytes']/1e9:.2f} GB")
    if sel["coverage"] < min_coverage:
        raise ValueError(
            f"window coverage {sel['coverage']:.3f} < {min_coverage} — "
            f"use 'ell' (or apply a clustering ordering like rbdeg first)")

    P, nblk, n_res = sel["P"], sel["nblk"], sel["n_res"]
    A, res_col, res_vals = _build_windowed(
        dev.row_ptr, dev.col, dev.vals, jnp.asarray(sel["slot"]),
        layout=(g.nnz, P, tm, W, J, nblk, n_res),
    )

    res_deg = sel["res_deg"]
    res_row_ptr = np.zeros(g.m + 1, dtype=np.int64)
    np.cumsum(res_deg, out=res_row_ptr[1:])
    g_res = SimpleNamespace(m=g.m, n=g.n, nnz=n_res, row_ptr=res_row_ptr,
                            degrees=res_deg)
    dev_res = DeviceCSR(row_ptr=dev.row_ptr, col=res_col, vals=res_vals,
                        m=g.m, n=g.n, nnz=n_res)
    ell = prepare_ell(g_res, dev=dev_res, b_dtype=b_dtype)

    # windows sorted so duplicate/unused slots sit behind real ones
    win_flat = jnp.asarray(np.ascontiguousarray(sel["win"].ravel()))
    return WindowedPlan(
        m=g.m, n=g.n, tm=tm, W=W, J=J, A=A, win_flat=win_flat, ell=ell,
        coverage=sel["coverage"], interpret=interpret, impl=impl,
    )


def spmm_windowed(g: CSRGraph, B, **kwargs):
    return prepare_windowed(g, **kwargs)(jnp.asarray(B))


def _win_flatten(p: WindowedPlan):
    return (p.A, p.win_flat, p.ell), (
        p.m, p.n, p.tm, p.W, p.J, p.coverage, p.interpret, p.impl, p.precision)


def _win_unflatten(aux, children):
    m, n, tm, W, J, coverage, interpret, impl, precision = aux
    return WindowedPlan(m=m, n=n, tm=tm, W=W, J=J, A=children[0],
                        win_flat=children[1], ell=children[2],
                        coverage=coverage, interpret=interpret, impl=impl,
                        precision=precision)


jax.tree_util.register_pytree_node(WindowedPlan, _win_flatten, _win_unflatten)
