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
    """Legacy packed-upload bucket builder (host ships
    [starts..., lengths..., chunk_rows...]).  Kept for the GE-SpMM
    baseline, whose pad-chunk scheme (starts=nnz, dump rows) doesn't fit
    the row_ptr-derived builder below; the ELL path itself uses
    :func:`_ell_meta_buckets` (zero uploads)."""
    buckets = []
    off = 0
    for w, N in bucket_meta:
        starts = jax.lax.dynamic_slice(meta_dev, (off,), (N,))
        lengths = jax.lax.dynamic_slice(meta_dev, (total + off,), (N,))
        sl_c = jax.vmap(
            lambda s, w=w: jax.lax.dynamic_slice(col_pad, (s,), (w,))
        )(starts)
        sl_v = jax.vmap(
            lambda s, w=w: jax.lax.dynamic_slice(val_pad, (s,), (w,))
        )(starts)
        mask = (
            jax.lax.broadcasted_iota(jnp.int32, (N, w), 1) < lengths[:, None]
        )
        buckets.append((jnp.where(mask, sl_c, 0), jnp.where(mask, sl_v, 0.0)))
        off += N
    return tuple(buckets)


def _bucket_layouts(row_ptr, deg, order, nnz, meta):
    """Traced helper shared by the static and dynamic-value builders:
    yields per width bucket (w, n_alloc, rows_b, starts, lengths, mask).
    Rows longer than the widest bucket expand to multiple chunks with the
    indicator-cumsum trick; ``n_alloc >= n_real`` pad chunks slice the
    zero region past nnz (length 0, row 0 — a zero-valued scatter
    contribution)."""
    wmax, widths, bucket_meta, n_rows_last = meta
    off = 0
    for w, n_alloc, N in bucket_meta:
        if w == wmax and n_rows_last != N:
            # split bucket: N chunks come from n_rows_last distinct rows
            rl = jax.lax.dynamic_slice(order, (off,), (n_rows_last,))
            c = -(-deg[rl] // wmax)
            ofs_ex = jnp.cumsum(c) - c  # exclusive chunk offset per row
            ind = jnp.zeros((N,), jnp.int32).at[ofs_ex].add(1)
            idx = jnp.cumsum(ind) - 1   # chunk -> row position in rl
            rows_b = rl[idx]
            local = jnp.arange(N, dtype=jnp.int32) - ofs_ex[idx]
            starts = row_ptr[rows_b] + local * wmax
            lengths = jnp.clip(deg[rows_b] - local * wmax, 0, wmax)
            off += n_rows_last
        else:
            rows_b = jax.lax.dynamic_slice(order, (off,), (N,))
            starts = row_ptr[rows_b]
            lengths = jnp.minimum(deg[rows_b], w)
            off += N
        if n_alloc > N:
            pad = n_alloc - N
            rows_b = jnp.concatenate(
                [rows_b, jnp.zeros((pad,), rows_b.dtype)])
            starts = jnp.concatenate(
                [starts, jnp.full((pad,), nnz, starts.dtype)])
            lengths = jnp.concatenate(
                [lengths, jnp.zeros((pad,), lengths.dtype)])
        mask = (
            jax.lax.broadcasted_iota(jnp.int32, (n_alloc, w), 1)
            < lengths[:, None]
        )
        yield w, n_alloc, rows_b, starts, lengths, mask


def _chunk_order(row_ptr, deg, widths):
    """One stable m-sized argsort grouping rows by width bucket (bucket
    sizes are static, from the host's copy of the degrees)."""
    w_arr = jnp.asarray(widths, dtype=jnp.int32)
    wi = jnp.minimum(jnp.searchsorted(w_arr, jnp.maximum(deg, 1)),
                     len(widths) - 1)
    wi = jnp.where(deg > 0, wi, len(widths))  # empty rows sort last
    return jnp.argsort(wi, stable=True).astype(jnp.int32)


def ell_buckets_core(row_ptr, col_dev, vals_dev, *, meta):
    """Traced core of :func:`_ell_meta_buckets` — also inlined by the
    windowed hybrid's fused one-program build
    (``window_spmm._build_windowed_ell``), which saves a program boundary
    in the timed prepare."""
    wmax, widths, bucket_meta, _ = meta
    if not bucket_meta:  # empty residue
        return (), jnp.zeros((0,), jnp.int32)
    nnz = col_dev.shape[0]
    deg = row_ptr[1:] - row_ptr[:-1]
    order = _chunk_order(row_ptr, deg, widths)

    col_pad = jnp.concatenate([col_dev, jnp.zeros((wmax,), col_dev.dtype)])
    val_pad = jnp.concatenate([vals_dev, jnp.zeros((wmax,), vals_dev.dtype)])

    buckets, rows_parts = [], []
    for w, n_alloc, rows_b, starts, lengths, mask in _bucket_layouts(
            row_ptr, deg, order, nnz, meta):
        sl_c = jax.vmap(
            lambda s, w=w: jax.lax.dynamic_slice(col_pad, (s,), (w,))
        )(starts)
        sl_v = jax.vmap(
            lambda s, w=w: jax.lax.dynamic_slice(val_pad, (s,), (w,))
        )(starts)
        buckets.append((jnp.where(mask, sl_c, 0), jnp.where(mask, sl_v, 0.0)))
        rows_parts.append(rows_b)
    return tuple(buckets), jnp.concatenate(rows_parts)


@functools.partial(jax.jit, static_argnames=("meta",))
def _ell_meta_buckets(row_ptr, col_dev, vals_dev, *, meta):
    """Build the ELL chunk metadata AND every width bucket's [N, w] arrays
    on device in ONE program, straight from a resident CSR row_ptr —
    zero host→device transfers (round-3: the packed metadata upload was
    the largest fixed cost of tPre; the tunnel has a ~0.5 s per-transfer
    floor, docs/measurements.md).

    How: rows are grouped by width bucket with one stable m-sized argsort;
    each bucket slices its rows out of the sorted order, recovers chunk
    starts from row_ptr, and gathers its [N, w] arrays with batched w-wide
    dynamic_slices (each chunk's nnz are contiguous in CSR order).

    meta: (wmax, widths, bucket_meta tuple of (w, n_alloc, n_real),
    n_rows_last).  ``n_alloc >= n_real`` lets multi-shard callers pad every
    shard's buckets to common shapes (shard_map's uniform-shape rule).
    """
    return ell_buckets_core(row_ptr, col_dev, vals_dev, meta=meta)


@functools.partial(
    jax.jit,
    static_argnames=("m", "max_gather_rows", "out_rows", "b_dtype"),
)
def _ell_spmm(buckets, chunk_row, B, *, m, max_gather_rows, out_rows,
              b_dtype="float32", into=None, chunk1=None, extras=None):
    """buckets: tuple of (cols [N,w] i32, vals [N,w] f32), one per width.
    chunk_row: int32[total_chunks] output row per chunk (bucket-major order).
    b_dtype: gather-source dtype. "bfloat16" is the fast inference mode —
      bf16 row gathers run ~3x faster on this hardware
      (docs/measurements.md) at ~1e-3 relative error; accumulation stays
      f32 either way.
    into: optional (out_rows, kp) f32 accumulator the chunk partials are
      scatter-added into directly (the hybrid passes its dense half here:
      one scatter into dense replaces scatter-into-zeros + full-m add,
      saving an (m, 128) read+write per call).  CONTRACT ASYMMETRY: with
      ``into=`` the return is the kp-wide UNSLICED accumulator (kp = 128
      when k < 128) — the caller owns the [:m, :k] slice and any
      optimization barrier (``_windowed_call`` pre-pads B so kp == k and
      slices once at the end); the default path returns [m, k].
    chunk1: optional int32[out_rows] row -> its single chunk index
      (n_chunks sentinel = no residue).  When every residue row owns
      exactly one chunk (the common case: only deg > w_max rows split),
      output assembly is a per-row GATHER of the chunk partials instead
      of a scatter-add — row scatters measured 49 M rows/s vs gathers at
      215 M on this chip (round-5 glue itemization: the 170K-chunk
      scatter cost 3.5-4.3 ms of the reddit residue's 32.9 ms).
    """
    k = B.shape[1]
    if not buckets:  # zero-nnz graph
        return into if into is not None \
            else jnp.zeros((m, k), jnp.float32)
    if b_dtype != "float32":
        B = B.astype(b_dtype)
    # Sub-128-lane layouts are pathological on TPU (k=32 measured 19x
    # slower than k=128 on the same graph: last-dim-32 tensors pad 4x in
    # registers and the gather chain loses its vector layout).  Gathers
    # are row-rate-bound, so padding B's feature dim to 128 costs ~zero
    # wall time and restores the measured-fast path; the result is
    # sliced back at the end.
    kp = 128 if k < 128 else k
    if kp != k:
        # the barrier keeps the padded operand opaque: XLA otherwise
        # distributes the gather over the concat (gather(concat(B, 0))
        # -> concat(gather(B), 0)) and recreates the narrow-lane chain
        B = jax.lax.optimization_barrier(jnp.concatenate(
            [B, jnp.zeros((B.shape[0], kp - k), B.dtype)], axis=1))
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
    if into is not None and into.shape != (out_rows, kp):
        raise ValueError(
            f"into shape {into.shape} != ({out_rows}, {kp}); the "
            f"caller must pre-pad its accumulator to the gather "
            f"lane width")
    if chunk1 is not None:
        # gather-assembled output: one partial row gathered per output
        # row (sentinel n_chunks -> masked to zero; the select fuses into
        # the gather's consumer, avoiding the 87 MB sentinel-row concat
        # copy the first cut paid).  Split rows' non-first chunks fold
        # into the first with one tiny scatter-add (n_extras rows,
        # usually 0-tens).
        if extras is not None:
            ei, ef = extras
            partial = partial.at[ef].add(partial[ei])
        n_chunks = partial.shape[0]
        live = chunk1 < n_chunks
        res = jnp.where(live[:, None],
                        partial[jnp.where(live, chunk1, 0)], 0.0)
        if into is not None:
            return into + res
        out = res
    elif into is not None:
        return into.at[chunk_row].add(partial)
    else:
        out = jnp.zeros((out_rows, kp), jnp.float32).at[chunk_row].add(
            partial)
    if kp != k:
        # stop XLA sinking the final slice back through the chain (it
        # would narrow the lanes again and undo the padding)
        out = jax.lax.optimization_barrier(out)
    return out[:m, :k]


@functools.partial(jax.jit, static_argnames=("m", "n_extras"))
def _gather_assembly_tables(chunk_row, *, m, n_extras):
    """Tables for the gather-assembled output: ``chunk1[r]`` = row r's
    FIRST chunk index (scatter-min; sentinel n_chunks = no residue), and
    — when rows longer than w_max split into several chunks — the
    ``n_extras`` non-first chunk indices plus their rows' first-chunk
    targets, so the call can pre-fold them with one tiny scatter-add
    (reddit residue: 3 extras in 170,358 chunks).  ``n_extras`` is
    host-static (total chunks − rows with nnz); everything is built on
    device at prepare time — no host upload."""
    n_chunks = chunk_row.shape[0]
    idx = jnp.arange(n_chunks, dtype=jnp.int32)
    chunk1 = jnp.full((m,), n_chunks, jnp.int32).at[chunk_row].min(idx)
    if n_extras == 0:
        return chunk1, None
    is_extra = chunk1[chunk_row] != idx
    pos = jnp.cumsum(is_extra.astype(jnp.int32)) - 1
    extra_idx = jnp.zeros((n_extras,), jnp.int32).at[
        jnp.where(is_extra, pos, n_extras)].set(idx, mode="drop")
    extra_first = chunk1[chunk_row[extra_idx]]
    return chunk1, (extra_idx, extra_first)


@dataclasses.dataclass
class EllPlan:
    m: int
    buckets: Any          # tuple of (cols[N,w], vals[N,w]) device arrays
    chunk_row: Any
    padded_nnz: int
    nnz: int
    max_gather_rows: int = 2 * 1024 * 1024
    b_dtype: str = "float32"
    chunk1: Any = None    # i32[m] row -> first chunk (gather assembly)
    extras: Any = None    # (extra_idx, extra_first) split-row fold tables
    bwd_plan: Any = None  # transposed-pattern EllPlan (training backward)

    def __call__(self, B, into=None) -> jax.Array:
        if self.bwd_plan is not None:
            return (_ell_apply_cv(self, B, into) if into is not None
                    else _ell_apply_cv0(self, B))
        return _ell_spmm(
            self.buckets, self.chunk_row, B, m=self.m,
            max_gather_rows=self.max_gather_rows,
            out_rows=self.m, b_dtype=self.b_dtype, into=into,
            chunk1=self.chunk1, extras=self.extras,
        )

    # Registered as a pytree (see bottom of file) so jitted callers can take
    # the plan as an *argument* — closing over it would bake the bucket
    # arrays into the executable as constants.
    def tree_flatten(self):
        children = (self.buckets, self.chunk_row, self.chunk1, self.extras,
                    self.bwd_plan)
        aux = (self.m, self.padded_nnz, self.nnz, self.max_gather_rows,
               self.b_dtype)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        m, padded_nnz, nnz, mgr, b_dtype = aux
        return cls(m=m, buckets=children[0], chunk_row=children[1],
                   padded_nnz=padded_nnz, nnz=nnz, max_gather_rows=mgr,
                   b_dtype=b_dtype, chunk1=children[2], extras=children[3],
                   bwd_plan=children[4])

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


def host_bucket_sizes(deg: np.ndarray, widths: tuple[int, ...]):
    """Static bucket sizes from a host degree array: returns
    (chunks_by_width dict, n_rows_last, padded_nnz) — the only host-side
    input the device metadata builder needs."""
    wmax = widths[-1]
    w_arr = np.asarray(widths, dtype=np.int64)
    wor = w_arr[np.minimum(np.searchsorted(w_arr, np.maximum(deg, 1)),
                           len(w_arr) - 1)]
    wor = np.where(deg > wmax, wmax, wor)
    n_chunks = np.where(deg > 0, -(-deg // wor), 0)
    by_w, padded, n_rows_last = {}, 0, 0
    for w in widths:
        mask = (wor == w) & (deg > 0)
        nc = int(n_chunks[mask].sum())
        if nc == 0:
            continue
        if w == wmax:
            n_rows_last = int(mask.sum())
        by_w[int(w)] = nc
        padded += nc * w
    return by_w, n_rows_last, padded


def ell_scatter_layout(deg: np.ndarray, widths: tuple[int, ...]):
    """Host O(m) layout for the scatter-assembled ELL (round-3 stage 2):
    returns (bucket_meta, H, chunk_row, padded_total) where

    - bucket_meta: tuple of (w, n_chunks, n_chunks) per live width,
      ascending — same enumeration as :func:`host_bucket_sizes` /
      the device ``_chunk_order`` (stable by width bucket, row-ascending
      within a bucket, split rows on consecutive chunks);
    - H[r] (int32[m]): row r's first-slot position in the bucket-major
      padded flat array MINUS its exclusive residue-count prefix — so a
      device scatter can place entry i at ``H[row(i)] + miss_rank(i)``
      with no per-row division (chunks of one row are w-contiguous, so
      base + t lands in chunk t//w at offset t%w automatically);
    - chunk_row (int32[total_chunks]): output row per chunk.
    """
    deg = np.asarray(deg, dtype=np.int64)
    m = len(deg)
    wmax = widths[-1]
    w_arr = np.asarray(widths, dtype=np.int64)
    wor = w_arr[np.minimum(np.searchsorted(w_arr, np.maximum(deg, 1)),
                           len(w_arr) - 1)]
    wor = np.where(deg > wmax, wmax, wor)
    live = deg > 0
    bucket_meta = []
    H = np.zeros(m, dtype=np.int64)
    chunk_rows = []
    excl = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(deg, out=excl[1:])  # exclusive residue-count prefix per row
    off = 0
    for w in widths:
        mask = live & (wor == w)
        rows_b = np.nonzero(mask)[0]
        if not len(rows_b):
            continue
        n_chunks_per = -(-deg[rows_b] // w) if w == wmax \
            else np.ones(len(rows_b), dtype=np.int64)
        nc = int(n_chunks_per.sum())
        bucket_meta.append((int(w), nc, nc))
        base = off + (np.cumsum(n_chunks_per) - n_chunks_per) * w
        H[rows_b] = base - excl[rows_b]
        chunk_rows.append(np.repeat(rows_b, n_chunks_per))
        off += nc * w
    chunk_row = (np.concatenate(chunk_rows) if chunk_rows
                 else np.zeros(0, np.int64)).astype(np.int32)
    return tuple(bucket_meta), H.astype(np.int32), chunk_row, off


def prepare_ell_device(
    row_ptr_dev,
    col_dev,
    vals_dev,
    *,
    m: int,
    nnz: int,
    res_row_ptr_host: np.ndarray,
    widths: tuple[int, ...] = DEFAULT_WIDTHS,
    b_dtype: str = "float32",
    bucket_alloc: dict | None = None,
) -> EllPlan:
    """Build an :class:`EllPlan` from device-resident CSR arrays with zero
    host→device transfers: the host computes only the static bucket sizes
    from its copy of the row_ptr; all chunk metadata and bucket arrays are
    derived on device by :func:`_ell_meta_buckets`.

    Used directly by the windowed hybrid's residue path (the residue CSR
    is born on device; one m-sized D2H of its row_ptr is the only
    transfer) and by :func:`prepare_ell`.  ``bucket_alloc`` (width →
    allocated chunk count ≥ the real count) lets the sharded path pad
    every shard's buckets to common shapes.
    """
    deg = np.diff(res_row_ptr_host).astype(np.int64)
    by_w, n_rows_last, padded = host_bucket_sizes(deg, widths)

    if bucket_alloc is not None:
        live = [w for w in widths if bucket_alloc.get(int(w), 0) > 0]
        bucket_meta = [(int(w), int(bucket_alloc[int(w)]), by_w.get(int(w), 0))
                       for w in live]
        padded = sum(a * w for w, a, _ in bucket_meta)
    else:
        bucket_meta = [(w, nc, nc) for w, nc in by_w.items()]

    if not bucket_meta:  # empty graph
        return EllPlan(
            m=m, buckets=(), chunk_row=jnp.zeros((0,), jnp.int32),
            padded_nnz=0, nnz=nnz, b_dtype=b_dtype,
        )

    buckets, chunk_row = _ell_meta_buckets(
        row_ptr_dev, col_dev, vals_dev,
        meta=(widths[-1], tuple(widths), tuple(bucket_meta), n_rows_last),
    )
    # Gather-assembled output (round-5 glue itemization: replaces the
    # 49 M rows/s chunk scatter-add with a 215 M rows/s per-row gather);
    # split rows' extra chunks fold in via a tiny static-count scatter.
    # Disabled under bucket_alloc padding (pad chunks carry chunk_row=0
    # and would shadow row 0's real first chunk in the min).
    chunk1 = extras = None
    if bucket_alloc is None and len(deg):
        n_extras = int(chunk_row.shape[0]) - int((deg > 0).sum())
        chunk1, extras = _gather_assembly_tables(chunk_row, m=m,
                                                 n_extras=n_extras)
    return EllPlan(
        m=m, buckets=buckets, chunk_row=chunk_row,
        padded_nnz=padded, nnz=nnz, b_dtype=b_dtype, chunk1=chunk1,
        extras=extras,
    )


def prepare_ell(
    g: CSRGraph,
    dev: DeviceCSR | None = None,
    widths: tuple[int, ...] = DEFAULT_WIDTHS,
    b_dtype: str = "float32",
) -> EllPlan:
    """Host: O(m) static bucket sizes.  Device: metadata + batched
    contiguous slices build the buckets — no upload at all (round-3; the
    previous packed-metadata upload paid the tunnel's ~0.5 s floor)."""
    if dev is None:
        dev = DeviceCSR.from_graph(g)
    return prepare_ell_device(
        dev.row_ptr, dev.col, dev.vals, m=g.m, nnz=g.nnz,
        res_row_ptr_host=np.asarray(g.row_ptr, dtype=np.int64),
        widths=widths, b_dtype=b_dtype,
    )


def spmm_ell(g: CSRGraph, B, **kwargs):
    return prepare_ell(g, **kwargs)(jnp.asarray(B))


# --------------------------------------------------------------------------
# Training backward: transposed-pattern gather instead of autodiff's scatter
# --------------------------------------------------------------------------

def _ell_raw_call(plan: "EllPlan", B, into):
    return _ell_spmm(
        plan.buckets, plan.chunk_row, B, m=plan.m,
        max_gather_rows=plan.max_gather_rows, out_rows=plan.m,
        b_dtype=plan.b_dtype, into=into, chunk1=plan.chunk1,
        extras=plan.extras)


def _zero_cotangents(tree):
    """Zero cotangents for a pytree of primal arrays: float0 for integer
    leaves (JAX's required tangent dtype for ints), zeros otherwise.  All
    dead in practice (training never differentiates wrt the plan), so
    XLA DCEs them."""
    def z(x):
        aval = jax.core.get_aval(x)
        if jnp.issubdtype(aval.dtype, jnp.inexact):
            return jnp.zeros(aval.shape, aval.dtype)
        return np.zeros(aval.shape, jax.dtypes.float0)
    return jax.tree.map(z, tree)


@jax.custom_vjp
def _ell_apply_cv(plan, B, into):
    return _ell_raw_call(plan, B, into)


def _cv_fwd(plan, B, into):
    # the full plan rides as residual: its arrays are the forward's own
    # inputs (no extra memory) and its pytree structure is needed to
    # shape the zero cotangents
    return _ell_raw_call(plan, B, into), plan


def _cv_bwd(plan, g):
    # d/dB (A_res @ B + into) contracted with g: g_B = A_resᵀ @ g — the
    # transposed-pattern ELL runs it through the 215 M rows/s gather
    # engine instead of autodiff's transpose-of-gather, a scatter-add
    # over the padded gathered rows (49 M rows/s; 60-90 ms at reddit
    # scale — the round-5 training-step fat).  The plan's cotangents are
    # structural zeros: gradients wrt the A values are NOT propagated on
    # this path (attach bwd_plan only when A is a constant, e.g. a graph
    # adjacency in GNN training).
    return _zero_cotangents(plan), plan.bwd_plan(g), g


_ell_apply_cv.defvjp(_cv_fwd, _cv_bwd)


@jax.custom_vjp
def _ell_apply_cv0(plan, B):
    return _ell_raw_call(plan, B, None)


def _cv0_fwd(plan, B):
    return _ell_raw_call(plan, B, None), plan


def _cv0_bwd(plan, g):
    return _zero_cotangents(plan), plan.bwd_plan(g)


_ell_apply_cv0.defvjp(_cv0_fwd, _cv0_bwd)


def prepare_ell_transpose(plan: "EllPlan", n: int) -> "EllPlan":
    """Transposed-pattern EllPlan built ON DEVICE from ``plan``'s own
    buckets (works for any ELL plan, including the windowed hybrid's
    fused-build residue, whose CSR never exists as standalone arrays):
    flatten the padded (col, val, row) triples, argsort by col, and feed
    the transposed CSR to :func:`prepare_ell_device`.  Padding entries
    ride along as (col 0, val 0) no-ops.  One O(n) D2H (the transposed
    degrees) is the only transfer.  Training-only: built lazily, never in
    the timed tPre path."""
    if not plan.buckets:
        return EllPlan(m=n, buckets=(), chunk_row=jnp.zeros((0,), jnp.int32),
                       padded_nnz=0, nnz=0, b_dtype=plan.b_dtype)
    cols = jnp.concatenate([c.reshape(-1) for c, _ in plan.buckets])
    vals = jnp.concatenate([v.reshape(-1) for _, v in plan.buckets])
    offs, rows_parts = 0, []
    for c, _ in plan.buckets:
        N, w = c.shape
        rows_parts.append(jnp.repeat(
            jax.lax.dynamic_slice(plan.chunk_row, (offs,), (N,)), w))
        offs += N
    rows = jnp.concatenate(rows_parts)
    t_deg = jnp.zeros((n,), jnp.int32).at[cols].add(1)
    t_row_ptr = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(t_deg, dtype=jnp.int32)])
    order = jnp.argsort(cols, stable=True)
    t_col = rows[order]
    t_val = vals[order]
    t_row_ptr_host = np.asarray(t_row_ptr, dtype=np.int64)  # O(n) D2H
    return prepare_ell_device(
        t_row_ptr, t_col, t_val, m=n, nnz=int(cols.shape[0]),
        res_row_ptr_host=t_row_ptr_host, b_dtype=plan.b_dtype)


def with_bwd_plan(plan: "EllPlan", n: int) -> "EllPlan":
    """Copy of ``plan`` carrying the transposed-pattern backward plan
    (``n`` = B's row count).  __call__ then routes through the custom
    VJP.  Only valid when the A values are constants (GNN adjacency)."""
    return dataclasses.replace(plan, bwd_plan=prepare_ell_transpose(plan, n))


jax.tree_util.register_pytree_node(
    EllPlan, EllPlan.tree_flatten, EllPlan.tree_unflatten
)
