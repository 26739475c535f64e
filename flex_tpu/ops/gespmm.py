"""GE-SpMM-style row-parallel CSR SpMM — the independent second-opinion
baseline (reference ``flex.cu:81-273``, adapted from hgyhungry/ge-spmm).

The GPU original assigns a warp slice per row, stages col/val chunks in
shared memory, and gathers B rows straight from global memory (coalesced
across the warp).  The faithful TPU translation: rows padded into
fixed-width chunks (col/val staged in VMEM — the smem analog), and each
B row fetched by an in-kernel per-row async DMA from HBM, software
pipelined DEPTH deep.

**This formulation is measured DEAD SLOW on TPU and is kept as the
documented negative result** (docs/measurements.md: per-row DMA sustains
~12 M rows/s vs ~255 M rows/s for XLA's gather engine): there is no
per-lane global gather on this hardware, so a GPU-style row-parallel
kernel starves.  It anchors the claim that `jnp.take` is the gather
engine and the width-bucketed ELL design (ops/ell_spmm.py) is the right
re-expression — exactly the role GE-SpMM plays as an in-tree baseline
for the reference.  Not selected by the autotuner; available as
``--method=gespmm``.
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
from flex_tpu.sparse.device import round_up as _round_up

CH = 8       # chunks per grid step (matches the (8, 128) SMEM index block)
DEPTH = 16   # DMA pipeline depth


def _make_kernel(w: int, k: int):
    total = CH * w

    def kernel(cols_smem, vals_ref, b_hbm, out_ref, buf, sems):
        def issue(i, slot):
            r = cols_smem[i // w, i % w]
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(r, 1), :], buf.at[slot], sems.at[slot]
            ).start()

        for s in range(min(DEPTH, total)):
            issue(s, s)

        # static outer loop per chunk (CH=8) keeps all ref indexing
        # static; the DMA pipeline runs DEPTH ahead across chunk bounds.
        for c in range(CH):
            def body(j, acc, c=c):
                i = c * w + j
                slot = i % DEPTH
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(0, 1), :], buf.at[slot], sems.at[slot]
                ).wait()
                acc = acc + vals_ref[c, j] * buf[slot, 0, :]

                @pl.when(i + DEPTH < total)
                def _():
                    issue(i + DEPTH, (i + DEPTH) % DEPTH)

                return acc

            out_ref[c, :] = jax.lax.fori_loop(
                0, w, body, jnp.zeros((k,), jnp.float32)
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("w", "out_rows", "interpret"))
def _gespmm_call(cols, vals, chunk_row, B, *, w, out_rows, interpret):
    N = cols.shape[0]
    k = B.shape[1]
    n_steps = N // CH
    call = pl.pallas_call(
        _make_kernel(w, k),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((CH, w), lambda i: (i, 0), memory_space=pltpu.SMEM),
            # vals also in SMEM: the kernel reads one scalar per DMA'd row
            # and Mosaic only allows arbitrary (non-128-aligned) scalar
            # indexing out of scalar memory.
            pl.BlockSpec((CH, w), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((CH, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, 1, k), jnp.float32),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
        interpret=interpret,
    )
    partial = call(cols, vals, B)
    return jnp.zeros((out_rows, k), jnp.float32).at[chunk_row].add(partial)


@dataclasses.dataclass
class GeSpmmPlan:
    m: int
    w: int
    cols: Any        # i32 [N, w] (N a multiple of CH; pads point at row 0)
    vals: Any        # f32 [N, w] (pads are 0)
    chunk_row: Any   # i32 [N] (pads point at dump row m)
    nnz: int
    padded_nnz: int
    interpret: bool

    def __call__(self, B) -> jax.Array:
        return _gespmm_call(
            self.cols, self.vals, self.chunk_row, B,
            w=self.w, out_rows=self.m + 1, interpret=self.interpret,
        )[: self.m]

    @property
    def stats(self) -> dict:
        return {
            "n_chunks": int(self.cols.shape[0]),
            "w": self.w,
            "padded_nnz": self.padded_nnz,
            "pad_ratio": self.padded_nnz / max(self.nnz, 1),
        }

    def traffic_model(self, k: int) -> dict:
        """Byte model: one (1, k) DMA per padded slot + C scatter.  The
        measured bound is NOT bytes but DMA issue rate (~12 M rows/s)."""
        by = self.padded_nnz * k * 4 + 2 * self.m * k * 4
        return {"bytes": int(by), "gathered_rows": self.padded_nnz}


def prepare_gespmm(
    g: CSRGraph, w: int = 32, dev=None, interpret: bool | None = None,
    **_unused,
) -> GeSpmmPlan:
    """Single fixed chunk width (GE-SpMM processes every row through the
    same code path, flex.cu:82-120); rows longer than ``w`` split into
    multiple chunks, chunk count padded to a CH multiple.  The [N, w]
    layout is built ON DEVICE from the resident CSR via the ELL bucket
    builder (each chunk is a contiguous CSR run) — the host ships only
    O(chunks) metadata (CLAUDE.md upload rule)."""
    from flex_tpu.ops.ell_spmm import _build_buckets
    from flex_tpu.sparse.device import DeviceCSR

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if dev is None:
        dev = DeviceCSR.from_graph(g)
    deg = g.degrees.astype(np.int64)
    n_chunks = np.where(deg > 0, -(-deg // w), 0)
    rows_rep = np.repeat(np.arange(g.m, dtype=np.int64), n_chunks)
    total = len(rows_rep)
    cum0 = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    local = np.arange(total, dtype=np.int64) - np.repeat(cum0, n_chunks)

    N = max(_round_up(total, CH), CH)
    starts = np.full(N, g.nnz, np.int32)  # pads slice the zero pad region
    lengths = np.zeros(N, np.int32)
    chunk_row = np.full(N, g.m, np.int32)  # pads -> dump row
    starts[:total] = (g.row_ptr[rows_rep] + local * w).astype(np.int32)
    lengths[:total] = np.minimum(deg[rows_rep] - local * w, w)
    chunk_row[:total] = rows_rep

    meta_dev = jnp.asarray(np.concatenate([starts, lengths, chunk_row]))
    col_pad = jnp.concatenate([dev.col, jnp.zeros((w,), jnp.int32)])
    val_pad = jnp.concatenate([dev.vals, jnp.zeros((w,), jnp.float32)])
    ((cols, vals),) = _build_buckets(
        col_pad, val_pad, meta_dev, bucket_meta=((w, N),), total=N)

    return GeSpmmPlan(
        m=g.m, w=w, cols=cols, vals=vals,
        chunk_row=meta_dev[2 * N:], nnz=g.nnz, padded_nnz=N * w,
        interpret=interpret,
    )


def spmm_gespmm(g: CSRGraph, B, **kwargs):
    return prepare_gespmm(g, **kwargs)(jnp.asarray(B))


def _ge_flatten(p: GeSpmmPlan):
    return (p.cols, p.vals, p.chunk_row), (
        p.m, p.w, p.nnz, p.padded_nnz, p.interpret)


def _ge_unflatten(aux, children):
    m, w, nnz, padded, interpret = aux
    return GeSpmmPlan(m=m, w=w, cols=children[0], vals=children[1],
                      chunk_row=children[2], nnz=nnz, padded_nnz=padded,
                      interpret=interpret)


jax.tree_util.register_pytree_node(GeSpmmPlan, _ge_flatten, _ge_unflatten)
