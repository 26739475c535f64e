"""Pallas banded/windowed SpMM — the MXU path for bandwidth-limited matrices.

After RCM, matrices from meshes/PDEs (the SuiteSparse class the reference's
``data/SuiteSparse`` pipeline targets) have all nonzeros of any row panel
inside a narrow column window.  This kernel exploits that with *contiguous*
B blocks — no gather at all, the one access pattern where a hand-written
TPU kernel beats XLA's gather machinery (docs/measurements.md: per-row DMA
is 25× slower than `take`, but sequential block DMA runs at stream rate):

  grid (panel p, window-chunk j):
    C[p] += A_band[p, :, j·128:(j+1)·128] @ B[ws[p]+j block]   (MXU)

with the per-panel window start ``ws`` scalar-prefetched into the B
index_map — Pallas pipelines the A/B block DMAs automatically, and the
output block is revisited across j so it accumulates in VMEM.

The dense band array is built **on device** by one scatter from the
resident CSR.  Only viable when the window is narrow: density =
nnz / (m · W) must clear ``min_density`` or prepare_band refuses
(the autotuner checks ``tile_stats.col_span_p99`` first).
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
from flex_tpu.sparse.device import DeviceCSR


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


@functools.partial(jax.jit, static_argnames=("layout",))
def _build_band(dev_row_ptr, dev_col, dev_vals, ws_rows, *, layout):
    """Scatter CSR nnz into the dense band [P, TM, W] on device.
    ws_rows: int32[m] window start of each row's panel (element units).
    .add (not .set) so duplicate (row, col) entries sum like every other
    kernel / the scipy gold."""
    nnz, P, TM, W = layout
    e = jnp.arange(nnz, dtype=jnp.int32)
    rows = jnp.searchsorted(dev_row_ptr, e, side="right").astype(jnp.int32) - 1
    c_loc = dev_col - ws_rows[rows]
    flat = (rows // TM) * (TM * W) + (rows % TM) * W + c_loc
    band = jnp.zeros((P * TM * W,), jnp.float32).at[flat].add(dev_vals)
    return band.reshape(P, TM, W)


def _band_kernel(ws_ref, a_ref, b_ref, o_ref):
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
    jax.jit, static_argnames=("m", "n", "w_pad", "precision")
)
def _band_spmm_xla(band, ws128, B, *, m, n, w_pad, precision):
    """Window-band SpMM in plain XLA: contiguous-window take + batched
    einsum.  Measured 33× faster than the handwritten Pallas grid on this
    stack (12.9 ms vs 430 ms on a 16.8M-nnz band; docs/measurements.md) —
    contiguous `take` + MXU einsum is already optimal here."""
    P, TM, W = band.shape
    k = B.shape[1]
    n_pad = _round_up(n, 128) + w_pad
    Bp = jnp.zeros((n_pad, k), jnp.float32).at[:n].set(B)
    idx = ws128[:, None] * 128 + jnp.arange(W, dtype=jnp.int32)[None, :]
    Bw = jnp.take(Bp, idx.reshape(-1), axis=0).reshape(P, W, k)
    out = jnp.einsum(
        "ptw,pwk->ptk", band, Bw, precision=precision,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(P * TM, k)[:m]


@dataclasses.dataclass
class BandPlan:
    m: int
    n: int
    tm: int
    w_pad: int           # window width (multiple of 128)
    band: Any            # f32 [P, TM, W]
    ws128: Any           # int32 [P] window starts in 128-row block units
    interpret: bool
    impl: str = "xla"    # "xla" (fast) | "pallas" (reference implementation)
    precision: Any = jax.lax.Precision.HIGHEST

    def __call__(self, B) -> jax.Array:
        if self.impl == "xla":
            return _band_spmm_xla(
                self.band, self.ws128, B, m=self.m, n=self.n,
                w_pad=self.w_pad, precision=self.precision,
            )
        P = self.band.shape[0]
        J = self.w_pad // 128
        k = B.shape[1]
        # pad B so any window stays in bounds
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
            _band_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((P * self.tm, k), jnp.float32),
            interpret=self.interpret,
        )(self.ws128, self.band, B_pad)
        return out[: self.m]

    @property
    def stats(self) -> dict:
        P = self.band.shape[0]
        return {
            "n_panels": P,
            "w_pad": self.w_pad,
            "band_bytes": P * self.tm * self.w_pad * 4,
        }


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
    if g.nnz:
        red_idx = np.minimum(seg_starts, g.nnz - 1)
        lo = np.minimum.reduceat(g.col, red_idx).astype(np.int64)
        hi = np.maximum.reduceat(g.col, red_idx).astype(np.int64)
    else:
        lo = np.zeros(P, np.int64)
        hi = np.zeros(P, np.int64)
    lo[nnz_per == 0] = 0
    hi[nnz_per == 0] = 0
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
    impl: str = "xla",
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

    ws_rows = ws[np.minimum(np.arange(m) // tm, P - 1)].astype(np.int32)
    band = _build_band(
        dev.row_ptr, dev.col, dev.vals, jnp.asarray(ws_rows),
        layout=(g.nnz, P, tm, w_pad),
    )
    return BandPlan(
        m=m, n=g.n, tm=tm, w_pad=w_pad, band=band,
        ws128=jnp.asarray((ws // 128).astype(np.int32)),
        interpret=interpret, impl=impl,
    )


def spmm_band(g: CSRGraph, B, **kwargs):
    return prepare_band(g, **kwargs)(jnp.asarray(B))


def _band_flatten(p: BandPlan):
    return (p.band, p.ws128), (p.m, p.n, p.tm, p.w_pad, p.interpret, p.impl,
                               p.precision)


def _band_unflatten(aux, children):
    m, n, tm, w_pad, interpret, impl, precision = aux
    return BandPlan(m=m, n=n, tm=tm, w_pad=w_pad, band=children[0],
                    ws128=children[1], interpret=interpret, impl=impl,
                    precision=precision)


jax.tree_util.register_pytree_node(BandPlan, _band_flatten, _band_unflatten)
