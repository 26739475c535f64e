"""ELL SpMM: width-bucketed row chunks — the robust general-purpose kernel.

Each row is padded to the smallest bucket width ≥ its degree; rows longer
than the widest bucket are split into chunks (the reference's row-split
kernels v31-v35, ``flex.cu:3510-3927``, generalised to all rows).  Per
bucket the computation is an exact-f32 VPU multiply-reduce over gathered B
rows — zero FLOP inflation, no MXU precision concerns, no atomics (chunk
partials combine in one scatter-add, replacing the reference's
MSB/atomicAdd protocol ``flex.cu:4107-4117``).

The ELL layout is built **on device** from the resident CSR (`DeviceCSR`)
with batched contiguous dynamic-slices (each chunk's nnz are contiguous in
CSR order); the host computes only O(m)+O(chunks) metadata shipped in a
single packed upload — the host→device path moves only ~35 MB/s with a
~0.5 s per-transfer floor (docs/measurements.md).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR

# Width ladder measured on reddit-scale R-MAT (pow2 ladder pad=1.51 →
# 501 ms; this ~1.2× ladder pad=1.17 → 232 ms): padding rows are gathered
# like real ones, so bucket granularity is a first-order knob.
DEFAULT_WIDTHS = (
    2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 32, 40, 48, 56, 64,
    80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 448, 512, 640, 768,
    896, 1024, 1280, 1536, 1792, 2048,
)


@functools.partial(jax.jit, static_argnames=("bucket_meta", "total"))
def _build_buckets(col_pad, val_pad, meta_dev, *, bucket_meta, total):
    """Build every width bucket's [N, w] arrays on device in one program.

    Each chunk's nnz are *contiguous* in CSR order, so the build is a batched
    w-wide dynamic_slice per bucket (a contiguous-run gather — far faster on
    TPU than an element-scatter) plus a length mask.  One jit for all widths
    keeps remote-compile count (and tPre) down.

    meta_dev layout: [starts..., lengths..., chunk_rows...], bucket-major.
    bucket_meta: static tuple of (w, N).
    """
    buckets = []
    off = 0
    for w, N in bucket_meta:
        starts = jax.lax.dynamic_slice(meta_dev, (off,), (N,))
        lengths = jax.lax.dynamic_slice(meta_dev, (total + off,), (N,))
        sl_c = jax.vmap(
            lambda s: jax.lax.dynamic_slice(col_pad, (s,), (w,))
        )(starts)
        sl_v = jax.vmap(
            lambda s: jax.lax.dynamic_slice(val_pad, (s,), (w,))
        )(starts)
        mask = (
            jax.lax.broadcasted_iota(jnp.int32, (N, w), 1) < lengths[:, None]
        )
        buckets.append((jnp.where(mask, sl_c, 0), jnp.where(mask, sl_v, 0.0)))
        off += N
    return tuple(buckets)


@functools.partial(
    jax.jit,
    static_argnames=("m", "max_gather_rows", "out_rows", "b_dtype"),
)
def _ell_spmm(buckets, chunk_row, B, *, m, max_gather_rows, out_rows,
              b_dtype="float32"):
    """buckets: tuple of (cols [N,w] i32, vals [N,w] f32), one per width.
    chunk_row: int32[total_chunks] output row per chunk (bucket-major order).
    b_dtype: gather-source dtype. "bfloat16" is the fast inference mode —
      bf16 row gathers run ~3x faster on this hardware
      (docs/measurements.md) at ~1e-3 relative error; accumulation stays
      f32 either way.
    """
    k = B.shape[1]
    if not buckets:  # zero-nnz graph
        return jnp.zeros((m, k), jnp.float32)
    if b_dtype != "float32":
        B = B.astype(b_dtype)
    # NB: concat-then-one-scatter measured FASTER than per-sub-batch
    # scatter-adds into C (49.7 vs 60.3 ms on the reddit_posts residue —
    # XLA fuses the multiply-reduce into the concat better than into many
    # small scatters).
    parts = []
    for cols, vals in buckets:
        N, w = cols.shape
        step = max(1, max_gather_rows // w)
        for s in range(0, N, step):
            c = cols[s : s + step]
            v = vals[s : s + step]
            # 2D-index gather: measured ~12% faster than flatten+reshape
            Bg = B[c]
            parts.append(
                (v[:, :, None] * Bg.astype(jnp.float32)).sum(axis=1)
            )
    partial = jnp.concatenate(parts, axis=0)
    return jnp.zeros((out_rows, k), jnp.float32).at[chunk_row].add(partial)[:m]


@dataclasses.dataclass
class EllPlan:
    m: int
    buckets: Any          # tuple of (cols[N,w], vals[N,w]) device arrays
    chunk_row: Any
    padded_nnz: int
    nnz: int
    max_gather_rows: int = 2 * 1024 * 1024
    b_dtype: str = "float32"

    def __call__(self, B) -> jax.Array:
        return _ell_spmm(
            self.buckets, self.chunk_row, B, m=self.m,
            max_gather_rows=self.max_gather_rows,
            out_rows=self.m, b_dtype=self.b_dtype,
        )

    # Registered as a pytree (see bottom of file) so jitted callers can take
    # the plan as an *argument* — closing over it would bake the bucket
    # arrays into the executable as constants.
    def tree_flatten(self):
        children = (self.buckets, self.chunk_row)
        aux = (self.m, self.padded_nnz, self.nnz, self.max_gather_rows,
               self.b_dtype)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        m, padded_nnz, nnz, mgr, b_dtype = aux
        return cls(m=m, buckets=children[0], chunk_row=children[1],
                   padded_nnz=padded_nnz, nnz=nnz, max_gather_rows=mgr,
                   b_dtype=b_dtype)

    def traffic_model(self, k: int) -> dict:
        """Predicted HBM bytes per call (the reference's dataVolume/NPerf
        byte model, ``flex.cu:5505-5540``, joined with measured runs by the
        bench harness).  Structure measured in docs/measurements.md: the
        take→materialise→reduce chain reads B rows, writes the gather
        output, re-reads it for the multiply-reduce, writes chunk partials,
        and scatter-adds them into C."""
        bb = 2 if self.b_dtype == "bfloat16" else 4
        n_chunks = int(self.chunk_row.shape[0])
        by = (3 * self.padded_nnz * k * bb
              + 2 * n_chunks * k * 4
              + self.m * k * 4)
        return {"bytes": int(by), "gathered_rows": self.padded_nnz}

    @property
    def views(self) -> tuple:
        return tuple((0, c.shape[0], c.shape[1]) for c, _ in self.buckets)

    @property
    def stats(self) -> dict:
        return {
            "padded_nnz": self.padded_nnz,
            "pad_ratio": self.padded_nnz / max(self.nnz, 1),
            "n_chunks": int(self.chunk_row.shape[0]),
            "views": self.views,
        }


def ell_padded_nnz(degrees: np.ndarray,
                   widths: tuple[int, ...] = DEFAULT_WIDTHS) -> int:
    """Padded-nnz prediction of the width-bucketed layout — the static
    input to the autotuner's ELL time model (no format build needed)."""
    w_arr = np.asarray(widths, dtype=np.int64)
    deg = degrees[degrees > 0].astype(np.int64)
    if not len(deg):
        return 0
    wor = w_arr[np.minimum(np.searchsorted(w_arr, deg), len(w_arr) - 1)]
    full = deg > w_arr[-1]
    pad = np.where(full, -(-deg // w_arr[-1]) * w_arr[-1], wor)
    return int(pad.sum())


def prepare_ell(
    g: CSRGraph,
    dev: DeviceCSR | None = None,
    widths: tuple[int, ...] = DEFAULT_WIDTHS,
    b_dtype: str = "float32",
) -> EllPlan:
    """Host: O(m)+O(chunks) metadata, one packed upload.
    Device: batched contiguous slices build the buckets."""
    if dev is None:
        dev = DeviceCSR.from_graph(g)
    deg = g.degrees.astype(np.int64)
    m = g.m
    wmax = widths[-1]
    w_arr = np.asarray(widths, dtype=np.int64)

    # bucket width per row; split rows live in the widest bucket
    wor = w_arr[np.minimum(np.searchsorted(w_arr, np.maximum(deg, 1)),
                           len(w_arr) - 1)]
    wor = np.where(deg > wmax, wmax, wor).astype(np.int64)
    n_chunks = np.where(deg > 0, -(-deg // wor), 0)

    # bucket-major chunk layout
    starts_parts, len_parts, row_parts, bucket_meta = [], [], [], []
    padded = 0
    for w in widths:
        sel = np.where((wor == w) & (n_chunks > 0))[0]
        if not len(sel):
            continue
        ch = n_chunks[sel]
        rows_rep = np.repeat(sel, ch)
        cum0 = np.concatenate([[0], np.cumsum(ch)[:-1]])
        local = np.arange(int(ch.sum()), dtype=np.int64) - np.repeat(cum0, ch)
        starts = g.row_ptr[rows_rep] + local * w
        lengths = np.minimum(deg[rows_rep] - local * w, w)
        starts_parts.append(starts.astype(np.int32))
        len_parts.append(lengths.astype(np.int32))
        row_parts.append(rows_rep.astype(np.int32))
        bucket_meta.append((int(w), len(rows_rep)))
        padded += len(rows_rep) * w

    if not bucket_meta:  # empty graph
        return EllPlan(
            m=m, buckets=(), chunk_row=jnp.zeros((0,), jnp.int32),
            padded_nnz=0, nnz=g.nnz, b_dtype=b_dtype,
        )

    # single packed upload: [starts..., lengths..., chunk_rows...]
    all_starts = np.concatenate(starts_parts)
    all_lens = np.concatenate(len_parts)
    all_rows = np.concatenate(row_parts)
    total = len(all_starts)
    meta_dev = jnp.asarray(np.concatenate([all_starts, all_lens, all_rows]))

    # pad the CSR arrays once so w-wide slices never run out of bounds
    col_pad = jnp.concatenate(
        [dev.col, jnp.zeros((wmax,), jnp.int32)]
    )
    val_pad = jnp.concatenate(
        [dev.vals, jnp.zeros((wmax,), jnp.float32)]
    )

    buckets = _build_buckets(
        col_pad, val_pad, meta_dev,
        bucket_meta=tuple(bucket_meta), total=total,
    )
    chunk_row = meta_dev[2 * total :]

    return EllPlan(
        m=m, buckets=tuple(buckets), chunk_row=chunk_row,
        padded_nnz=padded, nnz=g.nnz, b_dtype=b_dtype,
    )


def spmm_ell(g: CSRGraph, B, **kwargs):
    return prepare_ell(g, **kwargs)(jnp.asarray(B))


jax.tree_util.register_pytree_node(
    EllPlan, EllPlan.tree_flatten, EllPlan.tree_unflatten
)
