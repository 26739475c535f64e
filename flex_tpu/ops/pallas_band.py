"""Pallas banded/windowed SpMM — the MXU path for bandwidth-limited matrices.

After RCM, matrices from meshes/PDEs (the SuiteSparse class the reference's
``data/SuiteSparse`` pipeline targets) have all nonzeros of any row panel
inside a narrow column window.  The kernels here exploit that with
*contiguous* B blocks — no gather at all.

Implementations (fastest first; measured on a 262K-row / 16.8M-nnz band,
k=128, docs/measurements.md):

- ``impl="pallas2"`` (default): one grid step per row panel; the panel's
  128-aligned window [s, s+W) always lies inside [W·i, W·i + 2W) for
  i = s // W, so the band is split at format time into a left half (cols
  in [W·i, W·(i+1))) and a right half, and each step runs exactly two MXU
  dots against two W-aligned, scalar-prefetch-indexed B blocks.  Pallas
  pipelines all block DMAs.  **7.3 ms = 585 GF/s eff** — 1.8× faster than
  XLA's best formulation.
- ``impl="xla"``: contiguous-window `jnp.take` + batched einsum (13.1 ms).
- ``impl="pallas"``: the naive v1 grid (P × window-chunks) with output
  revisiting — kept for the record; 33× slower than pallas2 (430 ms).

Band arrays are built **on device** by one scatter from the resident CSR.
Only viable when the window is narrow: density = nnz / (m·W) must clear
``min_density`` or prepare_band refuses (the autotuner checks the same
model via ``panel_window_stats``).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import (
    DeviceCSR, round_up as _round_up, rows_from_row_ptr as _rows_from_ptr,
)


@functools.partial(jax.jit, static_argnames=("layout",))
def _build_band(dev_row_ptr, dev_col, dev_vals, ws_rows, *, layout):
    """Dense band [P, TM, W] (for impl="xla"/"pallas").
    .add (not .set) so duplicate (row, col) entries sum like every other
    kernel / the scipy gold."""
    nnz, m, P, TM, W = layout
    rows = _rows_from_ptr(dev_row_ptr, nnz, m)
    c_loc = dev_col - ws_rows[rows]
    flat = (rows // TM) * (TM * W) + (rows % TM) * W + c_loc
    band = jnp.zeros((P * TM * W,), jnp.float32).at[flat].add(dev_vals)
    return band.reshape(P, TM, W)


@functools.partial(jax.jit, static_argnames=("layout",))
def _build_split_band(dev_row_ptr, dev_col, dev_vals, iW_rows, *, layout):
    """A_left/A_right [P, TM, W] for impl="pallas2": nnz at col c of panel p
    goes left if c < W·(i_p+1) at offset c − W·i_p, else right at
    c − W·(i_p+1)."""
    nnz, m, P, TM, W = layout
    rows = _rows_from_ptr(dev_row_ptr, nnz, m)
    c_loc = dev_col - iW_rows[rows] * W
    is_left = c_loc < W
    flat_panel = (rows // TM) * (TM * W) + (rows % TM) * W
    pos_l = flat_panel + jnp.where(is_left, c_loc, 0)
    pos_r = flat_panel + jnp.where(is_left, 0, c_loc - W)
    left = jnp.zeros((P * TM * W,), jnp.float32).at[pos_l].add(
        jnp.where(is_left, dev_vals, 0.0))
    right = jnp.zeros((P * TM * W,), jnp.float32).at[pos_r].add(
        jnp.where(is_left, 0.0, dev_vals))
    return left.reshape(P, TM, W), right.reshape(P, TM, W)


@functools.partial(
    jax.jit, static_argnames=("m", "n", "w_pad", "precision")
)
def _band_spmm_xla(band, ws128, B, *, m, n, w_pad, precision):
    """Window-band SpMM in plain XLA: contiguous-window take + batched
    einsum."""
    P, TM, W = band.shape
    k = B.shape[1]
    n_pad = _round_up(n, 128) + w_pad
    Bp = jnp.zeros((n_pad, k), jnp.float32).at[:n].set(B)
    idx = ws128[:, None] * 128 + jnp.arange(W, dtype=jnp.int32)[None, :]
    Bw = Bp[idx]  # 2D-index gather (docs/measurements.md)
    out = jnp.einsum(
        "ptw,pwk->ptk", band, Bw, precision=precision,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(P * TM, k)[:m]


def _band_kernel_v1(ws_ref, a_ref, b_ref, o_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jax.lax.dot(
        a_ref[0], b_ref[:],
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit, static_argnames=("m", "n", "precision", "interpret")
)
def _band_spmm_pallas2(a_left, a_right, iW, B, *, m, n, precision, interpret):
    P, TM, W = a_left.shape
    k = B.shape[1]
    n_pad = (-(-n // W) + 2) * W
    B_pad = jnp.zeros((n_pad, k), jnp.float32).at[:n].set(B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, TM, W), lambda p_, iw: (p_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, W), lambda p_, iw: (p_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, k), lambda p_, iw: (iw[p_], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, k), lambda p_, iw: (iw[p_] + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, k), lambda p_, iw: (p_, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_kernel_v2(precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P * TM, k), jnp.float32),
        interpret=interpret,
    )(iW, a_left, a_right, B_pad, B_pad)  # B twice: one per block spec
    return out[:m]


def _make_kernel_v2(precision):
    def kernel(iW_ref, al_ref, ar_ref, b1_ref, b2_ref, o_ref):
        o_ref[:] = jax.lax.dot(
            al_ref[0], b1_ref[:], precision=precision,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot(
            ar_ref[0], b2_ref[:], precision=precision,
            preferred_element_type=jnp.float32,
        )

    return kernel


@dataclasses.dataclass
class BandPlan:
    m: int
    n: int
    tm: int
    w_pad: int           # window width (multiple of 128)
    band: Any            # impl xla/pallas: f32 [P, TM, W]; pallas2: (L, R)
    ws: Any              # impl xla/pallas: ws128 [P]; pallas2: iW [P]
    interpret: bool
    impl: str = "pallas2"
    precision: Any = jax.lax.Precision.HIGHEST

    def __call__(self, B) -> jax.Array:
        from flex_tpu.ops.lanes import pad_k_lanes, unpad_k_lanes

        k = B.shape[1]
        B = pad_k_lanes(B)  # k<128 is MXU/DMA-step-bound like k=128
        if self.impl == "xla":
            out = _band_spmm_xla(
                self.band, self.ws, B, m=self.m, n=self.n,
                w_pad=self.w_pad, precision=self.precision,
            )
        elif self.impl == "pallas2":
            out = self._call_pallas2(B)
        else:
            out = self._call_pallas_v1(B)
        return unpad_k_lanes(out, k)

    def _call_pallas2(self, B) -> jax.Array:
        a_left, a_right = self.band
        return _band_spmm_pallas2(
            a_left, a_right, self.ws, B, m=self.m, n=self.n,
            precision=self.precision, interpret=self.interpret,
        )

    def _call_pallas_v1(self, B) -> jax.Array:
        P = self.band.shape[0]
        J = self.w_pad // 128
        k = B.shape[1]
        n_pad = _round_up(self.n, 128) + self.w_pad
        B_pad = jnp.zeros((n_pad, k), B.dtype).at[: self.n].set(B)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(P, J),
            in_specs=[
                pl.BlockSpec(
                    (1, self.tm, 128), lambda p, j, ws: (p, 0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (128, k), lambda p, j, ws: (ws[p] + j, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (self.tm, k), lambda p, j, ws: (p, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        out = pl.pallas_call(
            _band_kernel_v1,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((P * self.tm, k), jnp.float32),
            interpret=self.interpret,
        )(self.ws, self.band, B_pad)
        return out[: self.m]

    @property
    def stats(self) -> dict:
        shape = (self.band[0].shape if isinstance(self.band, tuple)
                 else self.band.shape)
        mult = 2 if isinstance(self.band, tuple) else 1
        return {
            "n_panels": shape[0],
            "w_pad": self.w_pad,
            "band_bytes": mult * int(np.prod(shape)) * 4,
            "impl": self.impl,
        }

    def traffic_model(self, k: int) -> dict:
        """Byte model: dense band A read once; per panel the kernel DMAs
        its W-aligned B block(s) (upper bound — Pallas skips the DMA when
        consecutive panels index the same block); C written once."""
        st = self.stats
        P = st["n_panels"]
        n_b_blocks = 2 if self.impl == "pallas2" else 1
        by = (st["band_bytes"]
              + P * n_b_blocks * self.w_pad * k * 4
              + self.m * k * 4)
        return {"bytes": int(by)}


def panel_window_stats(g: CSRGraph, tm: int):
    """Per-panel column-window model shared by prepare_band and the
    autotuner (so eligibility and the actual format can't drift).

    Returns (ws int64[P] aligned window starts, w_pad, density, band_bytes).
    O(P) memory via reduceat over the contiguous CSR panel segments.
    """
    m = g.m
    P = max(-(-m // tm), 1)
    seg_starts = g.row_ptr[np.minimum(np.arange(P) * tm, m)].astype(np.int64)
    nnz_per = np.diff(np.append(seg_starts, g.nnz))
    # reduceat only over NONEMPTY panels: their seg_starts are strictly
    # increasing and < nnz, so each segment ends exactly at the next
    # nonempty panel's start (empty panels in between contribute nothing).
    # Clamping seg_starts to nnz-1 instead (the round-1 code) silently
    # dropped the last nonzero from the final nonempty panel's window when
    # trailing panels were empty — corrupting _build_band scatters.
    lo = np.zeros(P, np.int64)
    hi = np.zeros(P, np.int64)
    nonempty = nnz_per > 0
    if g.nnz:
        lo[nonempty] = np.minimum.reduceat(g.col, seg_starts[nonempty])
        hi[nonempty] = np.maximum.reduceat(g.col, seg_starts[nonempty])
    ws = (lo // 128) * 128
    w_pad = max(_round_up(int((hi - ws).max()) + 1, 128), 128)
    band_bytes = P * tm * w_pad * 4
    density = g.nnz / max(P * tm * w_pad, 1)
    return ws, w_pad, density, band_bytes


def prepare_band(
    g: CSRGraph,
    dev: DeviceCSR | None = None,
    tm: int = 256,
    min_density: float = 0.02,
    max_band_bytes: int = 4 << 30,
    interpret: bool | None = None,
    impl: str = "pallas2",
) -> BandPlan:
    """Refuses (ValueError) when the matrix isn't band-friendly."""
    if dev is None:
        dev = DeviceCSR.from_graph(g)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m = g.m
    P = max(-(-m // tm), 1)

    ws, w_pad, density, band_bytes = panel_window_stats(g, tm)
    if band_bytes > max_band_bytes or density < min_density:
        raise ValueError(
            f"matrix not band-friendly: window={w_pad} density={density:.4f} "
            f"band_bytes={band_bytes/1e9:.2f}GB — use 'ell' instead "
            f"(or apply RCM ordering first)"
        )

    row_panel = np.minimum(np.arange(m) // tm, P - 1)
    if impl == "pallas2":
        iW = (ws // w_pad).astype(np.int32)
        iW_rows = jnp.asarray(iW[row_panel].astype(np.int32))
        band = _build_split_band(
            dev.row_ptr, dev.col, dev.vals, iW_rows,
            layout=(g.nnz, g.m, P, tm, w_pad),
        )
        ws_arg = jnp.asarray(iW)
    else:
        ws_rows = ws[row_panel].astype(np.int32)
        band = _build_band(
            dev.row_ptr, dev.col, dev.vals, jnp.asarray(ws_rows),
            layout=(g.nnz, g.m, P, tm, w_pad),
        )
        ws_arg = jnp.asarray((ws // 128).astype(np.int32))
    return BandPlan(
        m=m, n=g.n, tm=tm, w_pad=w_pad, band=band, ws=ws_arg,
        interpret=interpret, impl=impl,
    )


def spmm_band(g: CSRGraph, B, **kwargs):
    return prepare_band(g, **kwargs)(jnp.asarray(B))


def _band_flatten(p: BandPlan):
    return (p.band, p.ws), (p.m, p.n, p.tm, p.w_pad, p.interpret, p.impl,
                            p.precision)


def _band_unflatten(aux, children):
    m, n, tm, w_pad, interpret, impl, precision = aux
    return BandPlan(m=m, n=n, tm=tm, w_pad=w_pad, band=children[0],
                    ws=children[1], interpret=interpret, impl=impl,
                    precision=precision)


jax.tree_util.register_pytree_node(BandPlan, _band_flatten, _band_unflatten)
