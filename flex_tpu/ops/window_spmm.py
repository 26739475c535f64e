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

Round-2 design (v2, "step-major compact"): the per-panel window-count
distribution on community graphs is heavily skewed (p50 ≈ 10, p99 ≈ 250
on the reddit_posts proxy), so any fixed per-panel J either truncates
the fat tail (coverage loss) or pads the thin majority (A-byte waste —
measured 2-4x).  Instead the format is a flat list of *steps*, G=4
windows each; a panel with nb windows owns ceil(nb/G) consecutive steps
(≤ 1 + (G-1)/nb padding):

- ONE Pallas program, grid = (total_steps,): per step one
  (TM, G·W) x (G·W, k) MXU dot, accumulated into the step's panel
  output block.  Scalar-prefetched arrays drive everything: per-step
  B-block ids (G of them), the output-panel index map, and a
  first-step-of-panel flag that zero-initialises the accumulator —
  consecutive steps of one panel revisit the same output block, the
  supported Pallas accumulation pattern (cf. ``pallas_band``).
- per-panel kept windows are sorted ascending by block id (neighbouring
  panels in one community share hub blocks, so B-block DMAs often
  repeat and get skipped).
- dense A is ONE flat f32 buffer [total_steps·TM·G·W] built on device
  by a single scatter from the resident CSR (`DeviceCSR`); the host
  ships only O(P) layout tables + the O(P·nblk) block→slot lookup.
- the residue (entries outside every kept window) is compacted on
  device into contiguous CSR-ordered (col, val) arrays and handed to
  :func:`flex_tpu.ops.ell_spmm.prepare_ell`.

Measured (docs/measurements.md): the dense part is MXU-HIGHEST-bound at
~8.9 TF/s (HIGH/DEFAULT precision fail the reference tolerance), i.e.
~1 µs per (256,128) window ≈ the residue-path cost of ~130 nnz — which
sets the default ``min_count``.
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

from flex_tpu.sparse.csr import CSRGraph, indicator_cumsum
from flex_tpu.sparse.device import (
    DeviceCSR, round_up as _round_up, rows_from_row_ptr,
)
from flex_tpu.ops.ell_spmm import EllPlan, prepare_ell_device

G = 4  # default windows per grid step (per-step dot: (TM, G*W) x (G*W, k))

# Eligibility thresholds shared with the autotuner's time model
# (bench/autotune.suggest) so the model never proposes plans the builder
# refuses (round-2 advisor finding).
MIN_COVERAGE = 0.15
# capacity frontier (round-4 sweep + A/B, docs/measurements.md): the
# 7.45 GiB mc=48 selection measures 125.9 GF/s (chain) vs 106.7 for the
# 6.99 GiB mc_eff=52 one (its residue runs 34 vs 25 ms), and ~9.9 GiB
# OOMs always — the chip-usable working set is ~10 GB.  8 GiB cap +
# 512 MB build chunks keeps build peak ≈ dense + 1.3 GB ≈ 8.8 GB
MAX_DENSE_BYTES = 8 << 30

# Above this histogram size the device-hist D2H (~15 MB/s relay) loses
# to the O(nnz) host bincount when a host CSR exists (_panel_block_hist)
_HIST_D2H_MAX_BYTES = 32 << 20

# Chunked dense-A assembly (round 4): XLA's 1D scatter is in-place, but
# the (a_elems,) -> (S, TM, G·W) reshape is a physical tile-relayout that
# doubles peak HBM (measured: temp == a_elems·4 for every multi-dim or
# reshaped scatter; the 6.38 GB reddit build peaked at 13 GB and OOM'd
# the 16 GB chip after the r3 outage).  Above the trigger the build
# scatters per ~1 GB step-range chunk and dynamic-update-slices into one
# 3D A (XLA performs single-use DUS chains in place), so peak becomes
# dense + 2·chunk instead of 2·dense.
_A_CHUNK_TRIGGER_BYTES = 2 << 30
_A_CHUNK_TARGET_BYTES = 256 << 20


def _plan_build_chunks(used, pstep0, total_steps, tm, W, g_step,
                       row_ptr_h, m, a_elems):
    """Host chunk plan for the dense-A build: tuple of
    ``(nnz_lo, nnz_hi, s_lo, s_hi)`` spans, each covering whole used
    panels whose steps fill ~_A_CHUNK_TARGET_BYTES.  Requires row-order
    steps (ascending ``used``) so each chunk's nnz is one contiguous CSR
    slice; returns None (single-scatter build) otherwise or when the
    dense array is small enough that the relayout copy fits."""
    if (total_steps == 0 or a_elems * 4 <= _A_CHUNK_TRIGGER_BYTES
            or row_ptr_h is None or len(used) == 0):
        return None
    if not np.all(np.diff(used) > 0):
        return None  # lex step order permutes panels: slices not contiguous
    starts = pstep0[used]
    if not np.all(np.diff(starts) > 0):
        return None
    blk_bytes = tm * g_step * W * 4
    steps_per_chunk = max(int(_A_CHUNK_TARGET_BYTES // blk_bytes), 1)
    ends = np.append(starts[1:], total_steps)
    bounds = []
    i, n_used = 0, len(used)
    while i < n_used:
        s_lo = int(starts[i])
        j = i
        while j + 1 < n_used and int(ends[j + 1]) - s_lo <= steps_per_chunk:
            j += 1
        bounds.append((
            int(row_ptr_h[min(int(used[i]) * tm, m)]),
            int(row_ptr_h[min((int(used[j]) + 1) * tm, m)]),
            s_lo, int(ends[j]),
        ))
        i = j + 1
    return tuple(bounds)


def _panel_block_hist(g: CSRGraph, dev, tm: int, W: int, P: int,
                      nblk: int, key_h: np.ndarray | None = None
                      ) -> np.ndarray:
    """nnz count per (row panel, column block) — the only O(nnz) pass of
    window selection.  Runs on device when the CSR is already resident
    (one cumsum + one scatter-add ≈ 0.3 s at reddit scale vs ~1 s of
    host bincount traffic; searchsorted is 200x slower than the
    indicator-cumsum row recovery — docs/measurements.md).

    The device path ends in a P·nblk int32 D2H; through the ~15 MB/s
    relay that dominates past a few-MB histogram (amazon: 75M cells =
    301 MB ≈ 20 min), where the O(nnz) host bincount (~60 s at 264M)
    wins — so prefer the host CSR when it exists and the histogram is
    large.

    ``key_h`` is the precomputed host (panel, block) key per nnz —
    window_select passes its own so the host path costs ONE extra
    bincount, not a second O(nnz) key construction."""
    have_host = key_h is not None or (
        getattr(g, "col", None) is not None
        and getattr(g, "degrees", None) is not None)
    if dev is not None and (not have_host
                            or P * nblk * 4 <= _HIST_D2H_MAX_BYTES):
        return np.asarray(_device_hist(dev.row_ptr, dev.col,
                                       shape=(g.nnz, g.m, tm, W, P, nblk))
                          ).astype(np.int64).reshape(P, nblk)
    if key_h is None:
        key_h, _ = _host_panel_key(g, tm, W, P, nblk)
    return np.bincount(key_h, minlength=P * nblk).reshape(P, nblk)


@functools.partial(jax.jit, static_argnames=("shape",))
def _device_hist(row_ptr, col, *, shape):
    """Panel x block nnz histogram on device (module-scope jit so repeat
    selections across configs hit the compile cache — a def-inside-call
    jit keyed on a fresh function object re-traced every time)."""
    nnz, m_, tm_, W_, P_, nblk_ = shape
    rows = rows_from_row_ptr(row_ptr, nnz, m_)
    key = (rows // tm_) * nblk_ + col // W_
    return jnp.zeros((P_ * nblk_,), jnp.int32).at[key].add(1)


def _host_row_ptr(g) -> np.ndarray:
    rp = getattr(g, "row_ptr", None)
    if rp is None:
        rp = np.concatenate([np.zeros(1, np.int64),
                             np.cumsum(g.degrees, dtype=np.int64)])
    return rp


def _host_panel_key(g, tm: int, W: int, P: int, nblk: int,
                    row_ptr_h: np.ndarray | None = None):
    """Host (panel, block) key per nnz, int32 (P·nblk < 2^31 is guarded
    by the caller).  Built WITHOUT np.repeat and without per-nnz int64
    division — both run ~100x below memory bandwidth on this host
    (175 s + 165 s for one 264M-nnz key, measured in
    experiments/profile_select_host.py); panel ids come from the
    indicator-cumsum over the P panel start offsets and the block id is
    a shift (or one int32 divide) on the int32 col."""
    if row_ptr_h is None:
        row_ptr_h = _host_row_ptr(g)
    m, nnz = g.m, g.nnz
    pstarts = row_ptr_h[np.minimum(
        np.arange(1, P, dtype=np.int64) * tm, m)]
    panel = indicator_cumsum(pstarts, nnz, dtype=np.int32)
    col32 = np.asarray(g.col, dtype=np.int32)
    block = (col32 >> (W.bit_length() - 1)) if W & (W - 1) == 0 \
        else col32 // np.int32(W)
    # fuse key = panel*nblk + block in place: a fresh 1 GB ufunc output
    # costs 1-30 s on this host vs 0.4 s reusing pages (utils/hostmem.py)
    np.multiply(panel, np.int32(nblk), out=panel)
    np.add(panel, block, out=panel)
    return panel, row_ptr_h


def window_select(
    g: CSRGraph, tm: int = 256, W: int = 128, J: int = 1024,
    min_count: int = 128, dev=None, g_step: int = G,
    step_order: str = "row", max_dense_bytes: int | None = None,
) -> dict:
    """Window selection + step layout (shared with the autotuner so
    eligibility and the built format can't drift).

    Per panel: every W-aligned column block with ≥ ``min_count`` nnz is a
    window; a panel with more than ``J`` keeps the top ones by count.
    Kept windows are sorted ascending by block id and packed into
    G-window steps.

    ``max_dense_bytes`` turns on *budgeted* selection (the
    HBM-capacity-aware analog of ASpT's MIN_OCC gate): when the step-major
    dense array at ``min_count`` would exceed the budget, the count gate is
    raised to the smallest threshold that fits.  Every window costs the
    same tm·W f32 tile, so thresholding on count IS the greedy-optimal
    pick of covered-nnz per dense byte; this is what makes the windowed
    hybrid eligible at amazon scale (264M nnz) on one 16 GB chip, where
    the unbudgeted format needs 72 GB (experiments/amazon_budget_study.py).
    The realized gate is returned as ``min_count_eff``.

    Returns dict with:
      win_step   int32[total_steps*G] block ids (sentinel = nblk pads)
      out_panel  int32[total_steps]   dense output-panel index per step
      first      int32[total_steps]   1 on a panel's first step
      pstep0     int64[P]             panel -> first step (-1 if none)
      slot       int16[P*nblk]        0 = residue, j+1 = window slot j
      coverage   float                fraction of nnz inside kept windows
      a_elems, dense_bytes, total_steps, n_used_panels, P, nblk, n_res
    One O(nnz) pass (device-side when ``dev`` is given); everything else
    operates on the (P, nblk) count matrix.  Per-row residue degrees are
    computed by the device build, not here.
    """
    m, nnz = g.m, g.nnz
    J = min(J, 32000)  # slot table is int16 (values ≤ J+1)
    P = max(-(-m // tm), 1)
    nblk = max(-(-g.n // W), 1)
    if P * nblk >= 2**31:
        # the (panel, block) key and the slot table are indexed in int32 on
        # device (round-2 advisor: silent overflow at ~7x amazon scale)
        raise ValueError(
            f"P*nblk = {P}*{nblk} exceeds int32 — raise tm/W or shard rows")
    # one O(nnz) host key pass, shared by the histogram fallback and the
    # res_deg/duplicate passes below — never build it twice, and never
    # via np.repeat (see _host_panel_key)
    key_h = row_ptr_h = None
    if getattr(g, "col", None) is not None and getattr(
            g, "degrees", None) is not None:
        key_h, row_ptr_h = _host_panel_key(g, tm, W, P, nblk)
    cnt = _panel_block_hist(g, dev, tm, W, P, nblk, key_h=key_h)

    min_count_eff = max(min_count, 1)
    if max_dense_bytes is not None:
        step_bytes = tm * g_step * W * 4

        def _bytes_at(t: int) -> int:
            nb = np.minimum((cnt >= t).sum(axis=1), J)
            return int((-(-nb[nb > 0] // g_step)).sum()) * step_bytes

        if _bytes_at(min_count_eff) > max_dense_bytes:
            lo, hi = min_count_eff, int(cnt.max()) + 1  # hi always fits (0 B)
            while lo + 1 < hi:
                mid = (lo + hi) // 2
                if _bytes_at(mid) > max_dense_bytes:
                    lo = mid
                else:
                    hi = mid
            min_count_eff = hi

    valid = cnt >= min_count_eff
    nb_per = valid.sum(axis=1)
    over = np.where(nb_per > J)[0]
    for p in over:  # cap fat panels: keep the top-J blocks by count
        ids = np.where(valid[p])[0]
        keep = ids[np.argpartition(-cnt[p, ids], J - 1)[:J]]
        valid[p] = False
        valid[p, keep] = True
    nb_per = np.minimum(nb_per, J)

    used = np.where(nb_per > 0)[0]
    if step_order == "lex" and len(used):
        # Step-order pass — the TPU analog of the reference's tile-segment
        # reordering for cache reuse (``mat.cu:311-678`` dfsSegs /
        # sliWinSegs): order panels lexicographically by their first-step
        # block ids so that consecutive grid steps repeat slot-aligned
        # block ids and the Pallas B-block DMA is skipped (the index map
        # returns the same block).  Panel permutation is free: the output
        # row_gather absorbs it.
        pw0, bw0 = np.nonzero(valid)
        pf = np.r_[True, np.diff(pw0) != 0]
        seg_start = np.where(pf)[0]  # one per used panel, in `used` order
        keys = np.full((len(used), g_step), nblk, dtype=np.int64)
        for j in range(g_step):
            has = nb_per[used] > j
            keys[has, j] = bw0[seg_start[has] + j]
        order = np.lexsort(tuple(keys[:, j] for j in range(g_step - 1, -1, -1)))
        used = used[order]
    from flex_tpu.sparse.csr import repeat_arange

    S_per = -(-nb_per[used] // g_step)
    total_steps = int(S_per.sum())
    step_of = repeat_arange(S_per, total=total_steps)
    first = np.zeros(total_steps, dtype=np.int32)
    step_starts = np.concatenate([[0], np.cumsum(S_per)[:-1]]) \
        if total_steps else np.zeros(0, dtype=np.int64)
    if total_steps:
        first[step_starts] = 1
    pstep0 = np.full(P, -1, dtype=np.int64)
    pstep0[used] = step_starts

    # per-used-panel sorted window ids -> flat win_step with sentinel pads.
    # np.nonzero walks `valid` row-major, so the (panel, block) pairs come
    # out grouped by panel with blocks ascending — no sort needed (the
    # previous per-panel sort over the full (P, nblk) matrix cost ~8 min
    # at amazon scale).
    win_step = np.full(total_steps * g_step, nblk, dtype=np.int32)
    slot = np.zeros(P * nblk, dtype=np.int16)  # slot values ≤ J+1 ≤ 2^15
    if len(used):
        from flex_tpu.sparse.csr import repeat_values

        pw, bw = np.nonzero(valid)
        # within-panel window index for each pair
        panel_first = np.r_[True, np.diff(pw) != 0]
        jj = np.arange(len(pw), dtype=np.int64) - repeat_values(
            np.arange(len(pw), dtype=np.int64)[panel_first],
            nb_per[pw[panel_first]], total=len(pw))
        dense_of_panel = np.full(P, -1, dtype=np.int64)
        dense_of_panel[used] = np.arange(len(used))
        flat_slot = step_starts[dense_of_panel[pw]] * g_step + jj
        win_step[flat_slot] = bw.astype(np.int32)
        slot[pw * nblk + bw] = (jj + 1).astype(np.int16)

    covered = int(cnt[valid].sum())
    a_elems = total_steps * tm * g_step * W

    # Output-assembly permutation: graph row r of panel p lives at concat
    # row dense_index(p)*tm + r%tm; panels with no windows point at the
    # appended zero row.  Computed HERE (and uploaded once via
    # sel_device_tables) so the timed prepare ships nothing — this ~1 MB
    # jnp.asarray used to ride inside prepare_windowed on every rebuild.
    row_src = np.full(P, -1, dtype=np.int64)
    row_src[used] = np.arange(len(used))
    total_rows = len(used) * tm
    rg = np.full(P * tm, total_rows, dtype=np.int64)
    if len(used):
        blockrows = (row_src[used][:, None] * tm
                     + np.arange(tm, dtype=np.int64)[None, :])
        rg[(used[:, None] * tm + np.arange(tm)[None, :]).ravel()] = \
            blockrows.ravel()

    # Per-row residue degrees are fully determined by the selection; when
    # the host CSR is available, compute them here so the timed prepare
    # needs NO device→host round trip (its whole device program chain
    # stays async until the final sync).  Costs one O(nnz) host pass at
    # selection time.
    res_deg = None
    unique_rc = False
    if key_h is not None:
        # residue degree per row = windowed-sum of the residue mask:
        # exclusive cumsum sampled at the row bounds (no per-nnz row ids).
        # cumsum runs in place — cumsum-into-fresh hit an 83 s pathological
        # path at 264M on this host (docs/measurements.md, round-3 host)
        mask32 = (slot[key_h] == 0).astype(np.int32)
        cs = np.empty(g.nnz + 1, np.int32)
        cs[0] = 0
        np.cumsum(mask32, out=cs[1:])
        res_deg = (cs[row_ptr_h[1:]] - cs[row_ptr_h[:-1]]).astype(np.int64)
        unique_rc = pattern_is_unique(g, row_ptr_h=row_ptr_h)

    return {
        "G": g_step,
        "W": W,
        "min_count_eff": min_count_eff,
        "build_chunks": _plan_build_chunks(
            used, pstep0, total_steps, tm, W, g_step, row_ptr_h, m,
            a_elems),
        "res_deg": res_deg,
        "unique_rc": unique_rc,
        "win_step": win_step,
        "out_panel": step_of.astype(np.int32),
        "first": first,
        "pstep0": pstep0,
        "slot": slot,
        "used": used,
        "row_gather": rg.astype(np.int32),
        "coverage": covered / max(nnz, 1),
        "n_res": nnz - covered,
        "a_elems": a_elems,
        "dense_bytes": a_elems * 4,
        "total_steps": total_steps,
        "n_used_panels": len(used),
        "P": P,
        "nblk": nblk,
    }


def pattern_is_unique(g, row_ptr_h: np.ndarray | None = None) -> bool:
    """Host duplicate-(row, col) detection: when columns are sorted within
    rows (every loader/generator emits that) a duplicate is an adjacent
    equal pair.  Unsorted rows return the conservative False (the build
    scatter then uses the duplicate-summing .add) — one fused pass, since
    both unsorted and duplicated adjacency mean col[i+1] <= col[i].  Row
    slices of a duplicate-free graph are duplicate-free — the sharded
    builder reuses the full-graph verdict.  The same-row mask comes from
    the row bounds, not per-nnz row ids (np.repeat is ~100x below memory
    bandwidth on this host)."""
    if getattr(g, "col", None) is None or getattr(g, "degrees", None) is None:
        return False
    nnz = g.nnz
    if nnz <= 1:
        return True
    if row_ptr_h is None:
        row_ptr_h = _host_row_ptr(g)
    same_row = np.ones(nnz - 1, dtype=bool)
    b = np.asarray(row_ptr_h[1:-1], dtype=np.int64)
    b = b[(b > 0) & (b < nnz)]
    same_row[b - 1] = False  # position i compares entries i and i+1
    return not np.any(same_row & (g.col[1:] <= g.col[:-1]))


def sel_device_tables(sel: dict) -> dict:
    """Upload the selection tables (slot lookup, per-step layout) once and
    cache the device arrays inside ``sel``.  The autotuner computes the
    selection anyway (shared time model); reusing its tables keeps the
    timed prepare free of H2D transfers — the tunnel moves ~35 MB/s with a
    ~0.5 s per-transfer floor (docs/measurements.md)."""
    if "dev_tables" not in sel:
        sel["dev_tables"] = {
            # ships int16 (halves the P·nblk upload) but lands int32: the
            # build's nnz-sized slot gather runs 157 vs 200 ms from an
            # int32 table (experiments/tpre_breakdown.py) — the cast is a
            # one-time O(P·nblk) op outside the timed prepare
            "slot": jnp.asarray(sel["slot"]).astype(jnp.int32),
            "pstep0": jnp.asarray(sel["pstep0"].astype(np.int32)),
            # pstep0-packed slot table (round-5 tpre_trace: saves the
            # second nnz-sized gather, −131 ms): entry = ps·(nblk+1)+j1.
            # Built on device at upload time; None when the packed range
            # would overflow int32 (callers then keep the two-gather
            # path).
            "slotps": None,
            "first": jnp.asarray(sel["first"]),
            "out_panel": jnp.asarray(sel["out_panel"]),
            "win_step": jnp.asarray(sel["win_step"]),
            "row_gather": jnp.asarray(sel["row_gather"]),
        }
        t = sel["dev_tables"]
        P, nblk = int(sel["P"]), int(sel["nblk"])
        if (int(sel["total_steps"]) + 1) * (nblk + 1) < 2**31:
            ps = t["pstep0"][:P].astype(jnp.int32)
            t["slotps"] = (t["slot"]
                           + jnp.repeat(ps * (nblk + 1), nblk))
        # Backward-slot tables for the Pallas training backward
        # (one packed upload + one rows upload; ~0.6 MB at reddit scale).
        # Uploaded HERE so the timed prepare ships nothing, like the
        # forward tables above.
        tabs, n_blk = _bwd_tables(sel["win_step"], sel["out_panel"],
                                  sel["nblk"], sel["G"],
                                  sel.get("W", 128))
        if tabs is None:
            sel["bwd_tabs"], sel["n_blk_used"] = None, 0
        else:
            slot_s, slot_g, panel_of, rank, bfirst, rows = tabs
            pack = jnp.asarray(np.stack(
                [slot_s, slot_g, panel_of, rank, bfirst]))
            sel["bwd_tabs"] = (pack[0], pack[1], pack[2], pack[3],
                               pack[4], jnp.asarray(rows))
            sel["n_blk_used"] = n_blk
    return sel["dev_tables"]


def _dense_core(dev_row_ptr, dev_col, dev_vals, slot_tab, pstep0,
                *, layout, chunks=None):
    """Traced dense-A build + per-nnz hit mask / miss-rank cumsum —
    shared by the residue-compaction core and the scatter-assembled
    residue variant.

    ``layout[9]`` (transposed, default False) selects the Aᵀ step layout
    [total_steps, G·W, TM] used by the k<128-specialized kernel
    (:func:`_window_pallas_t_raw`) — same scatter, swapped in-step index
    terms, zero extra cost."""
    nnz, m, TM, W, nblk, n_res, total_steps, g_step, unique_rc = layout[:9]
    transposed = layout[9] if len(layout) > 9 else False
    ps_packed = layout[10] if len(layout) > 10 else False
    a_elems = total_steps * TM * g_step * W
    rows = rows_from_row_ptr(dev_row_ptr, nnz, m)
    p = rows // TM
    blk = dev_col // W
    lut = slot_tab[p * nblk + blk].astype(jnp.int32)
    if ps_packed:
        # slot table carries pstep0[p]·(nblk+1) + j1 (sel_device_tables
        # "slotps"): one nnz-sized gather yields BOTH the slot and the
        # panel's first step — the separate pstep0[p] lookup was a second
        # full nnz gather costing 131 ms at reddit scale (round-5
        # tpre_trace itemization).  j1 <= nblk (a panel cannot keep more
        # windows than blocks), so divmod by nblk+1 unpacks exactly.
        j1 = lut % (nblk + 1)
        ps = lut // (nblk + 1)
    else:
        j1 = lut
        ps = pstep0[p]
    hit = j1 > 0
    j = j1 - 1

    # int32-safe: a_elems is capped below 2^31 by prepare_windowed.
    # Misses scatter to an out-of-bounds index and get dropped — no dump
    # slot, no post-slice copy of the multi-GB buffer (the copy doubled
    # transient HBM and OOM'd near the 6 GB dense cap).
    if transposed:
        flat = ((ps + j // g_step) * (TM * g_step * W)
                + ((j % g_step) * W + dev_col % W) * TM + rows % TM)
    else:
        flat = ((ps + j // g_step) * (TM * g_step * W)
                + (rows % TM) * (g_step * W) + (j % g_step) * W
                + dev_col % W)
    # A set-scatter runs 200 vs 268 ms at 23M updates
    # (experiments/tpre_breakdown.py) but keeps only one of duplicate
    # (row, col) entries, whose values must SUM (test_duplicates.py) —
    # window_select detects duplicate-freeness on the host (adjacent
    # equal pairs in the sorted-within-row CSR) and only then unlocks it.
    idx = jnp.where(hit, flat, a_elems)
    blk_shape = (g_step * W, TM) if transposed else (TM, g_step * W)
    blk_elems = TM * g_step * W
    if chunks:
        # chunked assembly (see _A_CHUNK_TRIGGER_BYTES): per chunk one
        # in-place 1D scatter + one chunk-sized relayout, DUS'd into the
        # single 3D A — peak HBM = dense + 2·chunk instead of 2·dense.
        # Misses (idx == a_elems) and other-chunk hits shift out of
        # [0, n_c) after the base subtraction and drop.
        A = jnp.zeros((total_steps,) + blk_shape, jnp.float32)
        for (lo, hi, s_lo, s_hi) in chunks:
            n_c = (s_hi - s_lo) * blk_elems
            ci = jax.lax.slice(idx, (lo,), (hi,)) - s_lo * blk_elems
            cv = jax.lax.slice(dev_vals, (lo,), (hi,))
            sc = jnp.zeros((n_c,), jnp.float32).at[ci]
            buf = (sc.set(cv, mode="drop") if unique_rc
                   else sc.add(cv, mode="drop"))
            A = jax.lax.dynamic_update_slice(
                A, buf.reshape((s_hi - s_lo,) + blk_shape), (s_lo, 0, 0))
    else:
        scat = jnp.zeros((a_elems,), jnp.float32).at[idx]
        A = (scat.set(dev_vals, mode="drop") if unique_rc
             else scat.add(dev_vals, mode="drop"))
        A = A.reshape((total_steps,) + blk_shape)

    miss_cum = jnp.cumsum((~hit).astype(jnp.int32))  # int32-safe: nnz < 2^31
    return A, hit, miss_cum


def _build_core(dev_row_ptr, dev_col, dev_vals, slot_tab, pstep0,
                *, layout, chunks=None):
    """Traced core of the device format build from the resident CSR +
    O(P)+O(P·nblk) tables (jit wrappers: :func:`_build_windowed`, and
    :func:`_build_windowed_ell` which fuses the residue ELL build into
    the same program).

    A layout is step-major: window j of panel p lives in step
    pstep0[p] + j//G at in-step slot j%G, i.e. flat element
    (pstep0[p] + j//G)·(TM·G·W) + (row%TM)·(G·W) + (j%G)·W + col%W.

    Rows are recovered from row_ptr with the indicator-cumsum trick
    (searchsorted over nnz is ~200x slower on this chip —
    docs/measurements.md).

    Round-3 build: exactly TWO nnz-sized scatters (the dominant cost at
    ~268 ms / 23M updates each) — vals into the dense A buffer, and the
    residue source-index compaction; residue (col, val) then come from two
    cheap n_res gathers, and the residue row_ptr falls out of the
    miss-cumsum with one (m+1)-gather instead of a third scatter.

    Returns (A [total_steps, TM, G*W], res_col, res_vals, res_row_ptr);
    residue entries keep CSR order, so the ELL builder's
    contiguous-slice layout stays valid.
    """
    A, hit, miss_cum = _dense_core(dev_row_ptr, dev_col, dev_vals,
                                   slot_tab, pstep0, layout=layout,
                                   chunks=chunks)
    nnz, m, TM, W, nblk, n_res, total_steps, g_step, unique_rc = layout[:9]
    # residue source indices = stable argsort on the hit flag (misses
    # first, CSR order preserved within) — measured 137 ms/iter cheaper
    # than the rank scatter at reddit scale (round-5 /tmp/compact_ab:
    # XLA's 1-bit-key sort beats the 87 M elem/s scatter wall)
    res_src = jax.lax.slice(
        jnp.argsort(hit.astype(jnp.int32), stable=True).astype(jnp.int32),
        (0,), (n_res,))
    # (col, val) come back through ONE 2-wide row gather of a packed
    # [nnz, 2] view — row gathers beat two element gathers of n_res on
    # this chip.  The pack rides the INT32 side: bitcasting col ints to
    # f32 makes denormals (col < 2^23 ⇒ |x| < 2^-126) and the TPU
    # flushes them to zero in the f32 lowering — measured err_frac 0.73
    # the other way round.  f32 val bit patterns are safe as ints.
    packed = jnp.stack(
        [dev_col, jax.lax.bitcast_convert_type(dev_vals, jnp.int32)],
        axis=1)
    res_pack = packed[res_src]
    res_col = res_pack[:, 0]
    res_vals = jax.lax.bitcast_convert_type(res_pack[:, 1], jnp.float32)
    # residue row_ptr = exclusive miss count at each row boundary
    miss_cum0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), miss_cum])
    res_row_ptr = miss_cum0[dev_row_ptr]
    return A, res_col, res_vals, res_row_ptr


@functools.partial(jax.jit, static_argnames=("layout", "chunks"))
def _build_windowed(dev_row_ptr, dev_col, dev_vals, slot_tab, pstep0,
                    *, layout, chunks=None):
    """Jitted :func:`_build_core` — the two-program path (this + a
    separate :func:`flex_tpu.ops.ell_spmm._ell_meta_buckets` dispatch),
    used by the sharded builder and as the fallback when the selection
    carries no host residue degrees."""
    return _build_core(dev_row_ptr, dev_col, dev_vals, slot_tab, pstep0,
                       layout=layout, chunks=chunks)


@functools.partial(jax.jit,
                   static_argnames=("layout", "ell_meta", "chunks"))
def _build_windowed_ell(dev_row_ptr, dev_col, dev_vals, slot_tab, pstep0,
                        *, layout, ell_meta, chunks=None):
    """Fused one-program build: dense A + residue compaction + residue
    ELL buckets in a single XLA executable (one dispatch, one sync).

    The round-3 on-chip stage breakdown (experiments/profile_prepare.py)
    measured build=0.85 s + ell=0.33 s while the serial-chain component
    costs sum to ~0.67 s — the gap is program-boundary overhead the
    fusion removes, and XLA can overlap the independent sub-chains
    (dense scatter vs residue chain).  Requires the residue ELL layout
    statically (``ell_meta``), which window_select's host ``res_deg``
    pass provides for free."""
    A, res_col, res_vals, res_row_ptr = _build_core(
        dev_row_ptr, dev_col, dev_vals, slot_tab, pstep0, layout=layout,
        chunks=chunks)
    from flex_tpu.ops.ell_spmm import ell_buckets_core

    buckets, chunk_row = ell_buckets_core(
        res_row_ptr, res_col, res_vals, meta=ell_meta)
    return A, buckets, chunk_row


@functools.partial(jax.jit,
                   static_argnames=("layout", "bucket_meta", "padded_total",
                                    "chunks"))
def _build_windowed_ell_scatter(dev_row_ptr, dev_col, dev_vals, slot_tab,
                                pstep0, h_tab, *, layout, bucket_meta,
                                padded_total, chunks=None):
    """Round-3 stage-2 variant: the residue is scattered DIRECTLY into
    the padded bucket-major ELL layout, replacing the compaction scatter
    + pack gather + per-bucket dynamic-slice assembly with one packed
    [nnz, 2] scatter (plus an O(m)-update delta scatter and one nnz
    cumsum).  Worth it only if the 2-wide scatter runs near the 1-wide
    element rate — measured by experiments/scatter_modes.py before this
    becomes a default.

    ``h_tab[r] = row_flat_base[r] - residue_excl_prefix[r]`` (host,
    :func:`flex_tpu.ops.ell_spmm.ell_scatter_layout`), so entry i lands
    at ``h_tab[row(i)] + miss_rank(i)``; a row's chunks are consecutive
    and w-contiguous, so base + t crosses chunk boundaries correctly.
    h_tab is expanded per-nnz by the boundary-delta cumsum trick, not an
    nnz-sized gather.  Duplicate (row, col) entries occupy distinct
    residue slots, so the scatter is always a set.
    """
    A, hit, miss_cum = _dense_core(dev_row_ptr, dev_col, dev_vals,
                                   slot_tab, pstep0, layout=layout,
                                   chunks=chunks)
    nnz = layout[0]
    dH = jnp.concatenate([h_tab[:1], jnp.diff(h_tab)])
    delta = jnp.zeros((nnz,), jnp.int32).at[dev_row_ptr[:-1]].add(
        dH, mode="drop")  # empty trailing rows drop (no positions follow)
    Hx = jnp.cumsum(delta)
    dest = jnp.where(hit, padded_total, Hx + miss_cum - 1)
    # packed on the INT side (f32 bit patterns as int32 are safe; the
    # reverse bitcast of small ints makes denormals the TPU flushes)
    packed = jnp.stack(
        [dev_col, jax.lax.bitcast_convert_type(dev_vals, jnp.int32)],
        axis=1)
    flat2 = jnp.zeros((padded_total, 2), jnp.int32).at[dest].set(
        packed, mode="drop")
    buckets = []
    off = 0
    for w, n_alloc, _ in bucket_meta:
        blk = jax.lax.slice(flat2, (off, 0), (off + n_alloc * w, 2))
        buckets.append((
            blk[:, 0].reshape(n_alloc, w),
            jax.lax.bitcast_convert_type(blk[:, 1],
                                         jnp.float32).reshape(n_alloc, w),
        ))
        off += n_alloc * w
    return A, tuple(buckets)


@functools.partial(jax.jit,
                   static_argnames=("layout", "bucket_meta", "padded_total"))
def _build_windowed_ell_scatter2(dev_row_ptr, dev_col, dev_vals, slot_tab,
                                 pstep0, h_tab, *, layout, bucket_meta,
                                 padded_total):
    """Combined-value variant of the scatter-assembled build: ONE no-drop
    scatter places every value — hits into the dense A prefix, misses
    into the residue suffix — of a [a_elems + padded_total] buffer, plus
    one dropped col scatter for the residue columns.  Two nnz scatters
    total for the whole format (vs three if the packed 2-wide scatter of
    :func:`_build_windowed_ell_scatter` runs at 2x the element rate).
    Cost: slicing A back out of the combined buffer copies the multi-GB
    prefix once (~11 ms at 6 GB) and transiently doubles its HBM —
    prepare_windowed guards a_elems + padded_total < 2^31.
    """
    nnz, m, TM, W, nblk, n_res, total_steps, g_step, unique_rc = layout[:9]
    transposed = layout[9] if len(layout) > 9 else False
    ps_packed = layout[10] if len(layout) > 10 else False
    a_elems = total_steps * TM * g_step * W
    rows = rows_from_row_ptr(dev_row_ptr, nnz, m)
    p = rows // TM
    blk = dev_col // W
    lut = slot_tab[p * nblk + blk].astype(jnp.int32)
    if ps_packed:  # see _dense_core: slot carries pstep0·(nblk+1) + j1
        j1 = lut % (nblk + 1)
        ps = lut // (nblk + 1)
    else:
        j1 = lut
        ps = pstep0[p]
    hit = j1 > 0
    j = j1 - 1
    if transposed:
        flat = ((ps + j // g_step) * (TM * g_step * W)
                + ((j % g_step) * W + dev_col % W) * TM + rows % TM)
    else:
        flat = ((ps + j // g_step) * (TM * g_step * W)
                + (rows % TM) * (g_step * W) + (j % g_step) * W
                + dev_col % W)
    miss_cum = jnp.cumsum((~hit).astype(jnp.int32))
    dH = jnp.concatenate([h_tab[:1], jnp.diff(h_tab)])
    delta = jnp.zeros((nnz,), jnp.int32).at[dev_row_ptr[:-1]].add(
        dH, mode="drop")
    ell_dest = jnp.cumsum(delta) + miss_cum - 1
    dest = jnp.where(hit, flat, a_elems + ell_dest)
    scat = jnp.zeros((a_elems + padded_total,), jnp.float32).at[dest]
    # duplicates only collide inside the dense prefix (each residue entry
    # owns a distinct slot), so the unique_rc set-unlock carries over
    combined = scat.set(dev_vals, mode="promise_in_bounds") if unique_rc \
        else scat.add(dev_vals, mode="promise_in_bounds")
    A = combined[:a_elems].reshape(total_steps, g_step * W, TM) \
        if transposed else \
        combined[:a_elems].reshape(total_steps, TM, g_step * W)
    val_flat = combined[a_elems:]
    col_flat = jnp.zeros((padded_total,), jnp.int32).at[
        jnp.where(hit, padded_total, ell_dest)].set(dev_col, mode="drop")
    buckets = []
    off = 0
    for w, n_alloc, _ in bucket_meta:
        buckets.append((
            jax.lax.slice(col_flat, (off,),
                          (off + n_alloc * w,)).reshape(n_alloc, w),
            jax.lax.slice(val_flat, (off,),
                          (off + n_alloc * w,)).reshape(n_alloc, w),
        ))
        off += n_alloc * w
    return A, tuple(buckets)


def _make_window_kernel(precision):
    def kernel(first_ref, panel_ref, win_ref, a_ref, *refs):
        b_refs, o_ref = refs[:-1], refs[-1]
        s = pl.program_id(0)

        @pl.when(first_ref[s] == 1)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        bcat = jnp.concatenate([b[:] for b in b_refs], axis=0)  # (G*W, k)
        o_ref[:] += jax.lax.dot(
            a_ref[0], bcat, precision=precision,
            preferred_element_type=jnp.float32,
        )

    return kernel


@functools.lru_cache(maxsize=64)
def _window_pallas_vjp(n_panels, W, k, precision, interpret, n_blk_used=0):
    """custom_vjp wrapper around the Pallas forward: Pallas kernels have
    no automatic transpose.  With backward tables (``bwd`` =
    (slot_s, slot_g, panel_of_slot, rank, bfirst, rows);
    :func:`_bwd_tables`), both gradients run as Pallas MXU kernels:

    - g_A[s] = g_panel(s) · Bw(s)ᵀ rides the SAME scalar-prefetch B-block
      DMA pattern as the forward (:func:`_window_bwd_gA_raw`) — no
      B_pad[rows_idx] gather at all (the old XLA backward materialised
      S·G·W rows ≈ 1.9 GB per step at reddit scale);
    - g_B = Σ_slots A(slot)ᵀ · g_panel(slot), with slots SORTED BY BLOCK
      ID so revisits of one output block are consecutive grid steps —
      the supported Pallas accumulation pattern
      (:func:`_window_bwd_gB_raw`) — then ONE set-scatter of the
      n_blk_used·W block rows into B_pad shape (≤ n rows, vs the old
      S·G·W-row scatter-add).

    Without tables (``n_blk_used == 0``, e.g. a sharded builder that
    didn't thread them) the old XLA formulation is used.  This is what
    lets GCN training run on the windowed plan (autodiff w.r.t. B and A
    values; integer tables get no cotangent)."""

    @jax.custom_vjp
    def f(first, out_panel, win_step, bwd, A, B_pad):
        return _window_pallas_raw(first, out_panel, win_step, A, B_pad,
                                  n_panels=n_panels, W=W, k=k,
                                  precision=precision, interpret=interpret)

    def fwd(first, out_panel, win_step, bwd, A, B_pad):
        return f(first, out_panel, win_step, bwd, A, B_pad), (
            first, out_panel, win_step, bwd, A, B_pad)

    def bwd_fn(resid, g):
        first, out_panel, win_step, bwd, A, B_pad = resid
        S, TM, GW = A.shape
        if n_blk_used and bwd is not None:
            slot_s, slot_g, panel_of, rank, bfirst, rows = bwd
            g_A = _window_bwd_gA_raw(
                first, out_panel, win_step, g, B_pad,
                S=S, TM=TM, GW=GW, W=W, k=k, n_panels=n_panels,
                precision=precision, interpret=interpret)
            blk = _window_bwd_gB_raw(
                slot_s, slot_g, panel_of, rank, bfirst, A, g,
                TM=TM, W=W, k=k, n_panels=n_panels,
                n_blk_used=n_blk_used, precision=precision,
                interpret=interpret)
            g_B_pad = jnp.zeros_like(B_pad).at[rows].set(blk)
            return (None, None, None, None, g_A, g_B_pad)
        g_p = g.reshape(n_panels, TM, k)[out_panel]        # [S, TM, k]
        rows_idx = (win_step[:, None] * W
                    + jnp.arange(W, dtype=jnp.int32)[None, :]).reshape(-1)
        Bw = B_pad[rows_idx].reshape(S, GW, k)
        g_A = jnp.einsum("stk,swk->stw", g_p, Bw, precision=precision,
                         preferred_element_type=jnp.float32)
        gw = jnp.einsum("stw,stk->swk", A, g_p, precision=precision,
                        preferred_element_type=jnp.float32)
        g_B_pad = jnp.zeros_like(B_pad).at[rows_idx].add(
            gw.reshape(S * GW, k))
        return (None, None, None, None, g_A, g_B_pad)

    f.defvjp(fwd, bwd_fn)
    return f


def _window_bwd_gA_raw(first, out_panel, win_step, g, B_pad, *, S, TM, GW,
                       W, k, n_panels, precision, interpret):
    """g_A[s] = g_panel(s) · Bw(s)ᵀ: grid = (S,), per step one
    (TM, k)x(k, G·W) MXU dot — B window blocks arrive through the same
    prefetched-blockspec DMA as the forward, the incoming cotangent
    panel through the out_panel map.  Each A block is written once (no
    accumulation)."""
    g_step = GW // W

    def kernel(first_ref, panel_ref, win_ref, g_ref, *refs):
        b_refs, o_ref = refs[:-1], refs[-1]
        bcat = jnp.concatenate([b[:] for b in b_refs], axis=0)  # (GW, k)
        o_ref[0] = jax.lax.dot_general(
            g_ref[:], bcat, (((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)

    def b_spec(gi):
        return pl.BlockSpec(
            (W, k), lambda s, f, op, ws, gi=gi: (ws[s * g_step + gi], 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((TM, k), lambda s, f, op, ws: (op[s], 0),
                         memory_space=pltpu.VMEM),
            *[b_spec(gi) for gi in range(g_step)],
        ],
        out_specs=pl.BlockSpec((1, TM, GW), lambda s, f, op, ws: (s, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, TM, GW), jnp.float32),
        interpret=interpret,
    )(first, out_panel, win_step, g, *([B_pad] * g_step))


def _window_bwd_gB_raw(slot_s, slot_g, panel_of, rank, bfirst, A, g, *,
                       TM, W, k, n_panels, n_blk_used, precision,
                       interpret):
    """g_B blocks: grid = (n_windows,) over real window slots sorted by
    block id; per slot one (W, TM)x(TM, k) MXU dot of the slot's A tile
    (transposed in-dot) against its panel's cotangent, accumulated into
    the block's (W, k) output tile — consecutive slots of one block share
    the tile (``bfirst`` re-initialises), the same revisit pattern as the
    forward's panel accumulation.  Output is RANK-indexed (compact
    [n_blk_used·W, k]); the caller set-scatters it into B_pad rows."""
    def kernel(ss_ref, sg_ref, po_ref, rk_ref, bf_ref, a_ref, g_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(bf_ref[t] == 1)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jax.lax.dot_general(
            a_ref[0], g_ref[:], (((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)

    n_windows = slot_s.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_windows,),
        in_specs=[
            pl.BlockSpec((1, TM, W),
                         lambda t, ss, sg, po, rk, bf: (ss[t], 0, sg[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, k),
                         lambda t, ss, sg, po, rk, bf: (po[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, k),
                               lambda t, ss, sg, po, rk, bf: (rk[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blk_used * W, k), jnp.float32),
        interpret=interpret,
    )(slot_s, slot_g, panel_of, rank, bfirst, A, g)


def _bwd_tables(win_step_h: np.ndarray, out_panel_h: np.ndarray,
                nblk: int, g_step: int, W: int):
    """Host backward-slot tables from the selection's flat window list:
    real slots sorted ascending by block id, so the g_B kernel's output
    revisits are consecutive.  Returns (slot_s, slot_g, panel_of, rank,
    bfirst, rows, n_blk_used) — all O(n_windows) int32; ``rows`` are the
    B_pad row indices of the compact rank-indexed output."""
    idx = np.flatnonzero(win_step_h != nblk)
    if not len(idx):
        return None, 0
    order = idx[np.argsort(win_step_h[idx], kind="stable")]
    blk_sorted = win_step_h[order].astype(np.int64)
    bfirst = np.r_[True, np.diff(blk_sorted) != 0]
    rank = (np.cumsum(bfirst) - 1).astype(np.int32)
    n_blk_used = int(rank[-1]) + 1
    uniq = blk_sorted[bfirst]
    rows = (uniq[:, None] * W + np.arange(W, dtype=np.int64)[None, :]
            ).ravel().astype(np.int32)
    slot_s = (order // g_step).astype(np.int32)
    return (slot_s, (order % g_step).astype(np.int32),
            out_panel_h[slot_s].astype(np.int32), rank,
            bfirst.astype(np.int32), rows), n_blk_used


def _window_pallas(first, out_panel, win_step, A, B_pad, *, n_panels, W, k,
                   precision, interpret, bwd=None, n_blk_used=0):
    return _window_pallas_vjp(n_panels, W, k, precision, interpret,
                              n_blk_used)(
        first, out_panel, win_step, bwd, A, B_pad)


def _window_pallas_raw(first, out_panel, win_step, A, B_pad, *, n_panels,
                       W, k, precision, interpret):
    """grid = (total_steps,); per step one (TM, G·W)x(G·W, k) MXU dot
    accumulated into the panel's output block (consecutive steps share
    the block; `first` re-initialises it)."""
    total_steps, TM, GW = A.shape
    g_step = GW // W

    def b_spec(gi):
        return pl.BlockSpec(
            (W, k), lambda s, f, op, ws, gi=gi: (ws[s * g_step + gi], 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec((1, TM, GW), lambda s, f, op, ws: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            *[b_spec(gi) for gi in range(g_step)],
        ],
        out_specs=pl.BlockSpec((TM, k), lambda s, f, op, ws: (op[s], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_window_kernel(precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_panels * TM, k), jnp.float32),
        interpret=interpret,
    )(first, out_panel, win_step, A, *([B_pad] * g_step))


def _make_window_kernel_t(precision):
    def kernel(first_ref, panel_ref, win_ref, a_ref, *refs):
        b_refs, o_ref = refs[:-1], refs[-1]
        s = pl.program_id(0)

        @pl.when(first_ref[s] == 1)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        bcat = jnp.concatenate([b[:] for b in b_refs], axis=1)  # (k, G*W)
        o_ref[:] += jax.lax.dot(
            bcat, a_ref[0], precision=precision,
            preferred_element_type=jnp.float32,
        )

    return kernel


@functools.lru_cache(maxsize=64)
def _window_pallas_t_vjp(n_panels, W, k, precision, interpret):
    """custom_vjp around the TRANSPOSED Pallas forward (Cᵀ = Bᵀ·Aᵀ per
    step); backward in plain XLA, mirroring :func:`_window_pallas_vjp`:
    g_Aᵀ(s) = Bᵀw(s)ᵀ · g_panelᵀ(s), g_Bᵀ = Σ g_panelᵀ(s) · Aᵀ(s)ᵀ
    scatter-added into the gathered window columns."""

    @jax.custom_vjp
    def f(first, out_panel, win_step, A_T, B_T):
        return _window_pallas_t_raw(first, out_panel, win_step, A_T, B_T,
                                    n_panels=n_panels, W=W, k=k,
                                    precision=precision, interpret=interpret)

    def fwd(first, out_panel, win_step, A_T, B_T):
        return f(first, out_panel, win_step, A_T, B_T), (
            first, out_panel, win_step, A_T, B_T)

    def bwd(resid, g):
        first, out_panel, win_step, A_T, B_T = resid
        S, GW, TM = A_T.shape
        g_p = g.reshape(k, n_panels, TM).transpose(1, 0, 2)[out_panel]
        cols_idx = (win_step[:, None] * W
                    + jnp.arange(W, dtype=jnp.int32)[None, :]).reshape(-1)
        Bw = B_T[:, cols_idx].reshape(k, S, GW)          # (k, S, GW)
        g_AT = jnp.einsum("csw,scm->swm", Bw, g_p, precision=precision,
                          preferred_element_type=jnp.float32)
        gw = jnp.einsum("scm,swm->csw", g_p, A_T, precision=precision,
                        preferred_element_type=jnp.float32)
        g_BT = jnp.zeros_like(B_T).at[:, cols_idx].add(
            gw.reshape(k, S * GW))
        return (None, None, None, g_AT, g_BT)

    f.defvjp(fwd, bwd)
    return f


def _window_pallas_t(first, out_panel, win_step, A_T, B_T, *, n_panels, W,
                     k, precision, interpret):
    return _window_pallas_t_vjp(n_panels, W, k, precision, interpret)(
        first, out_panel, win_step, A_T, B_T)


def _window_pallas_t_raw(first, out_panel, win_step, A_T, B_T, *, n_panels,
                         W, k, precision, interpret):
    """k<128-specialized transposed kernel: grid = (total_steps,); per
    step one (k, G·W) x (G·W, TM) MXU dot accumulated into the panel's
    (k, TM) output block.  The MXU lane dimension is TM (=128-multiple)
    instead of k, so a narrow k wastes no lanes: at k=32 each step costs
    ~¼ the MXU passes of the row-major kernel, whose (TM, G·W)x(G·W, k)
    dot pads k to 128 (the reference k-specializes its kernels the same
    way — v31–v35, flex.cu:4752-4759).  Bᵀ is (k, (nblk+1)·W) with the
    sentinel zero block last; A comes in the Aᵀ step layout
    [S, G·W, TM] built by :func:`_dense_core` with ``transposed=True``."""
    total_steps, GW, TM = A_T.shape
    g_step = GW // W

    def b_spec(gi):
        return pl.BlockSpec(
            (k, W), lambda s, f, op, ws, gi=gi: (0, ws[s * g_step + gi]),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(total_steps,),
        in_specs=[
            pl.BlockSpec((1, GW, TM), lambda s, f, op, ws: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            *[b_spec(gi) for gi in range(g_step)],
        ],
        out_specs=pl.BlockSpec((k, TM), lambda s, f, op, ws: (0, op[s]),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_window_kernel_t(precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, n_panels * TM), jnp.float32),
        interpret=interpret,
    )(first, out_panel, win_step, A_T, *([B_T] * g_step))


def _window_xla(win_step, A, B_pad, out_panel_np, *, n_panels, W, k,
                precision):
    """XLA fallback formulation (2D-index window take + batched einsum,
    then a segment-style accumulation over each panel's steps) — the
    baseline the Pallas path must beat."""
    total_steps, TM, GW = A.shape
    idx = (win_step.reshape(total_steps, GW // W)[:, :, None] * W
           + jnp.arange(W, dtype=jnp.int32)[None, None, :])
    Bw = B_pad[idx.reshape(total_steps, GW)]  # [S, G*W, k]
    out = jnp.einsum("stw,swk->stk", A, Bw, precision=precision,
                     preferred_element_type=jnp.float32)
    return jax.ops.segment_sum(out, out_panel_np, num_segments=n_panels
                               ).reshape(n_panels * TM, k)


@jax.jit
def _windowed_call(plan: "WindowedPlan", B):
    """Whole hybrid call under ONE jit (plan is a registered pytree passed
    as an argument — never closed over, per docs/measurements.md).

    k < 128 is padded to the 128-lane layout ONCE here, for both halves:
    sub-128-lane tensors are pathological on TPU (k=32 measured 21%
    slower than k=128 through the dense Pallas path before this, and
    3-19x slower through gather chains — docs/measurements.md).  The
    barrier keeps XLA from distributing the pad over the downstream
    gathers and recreating the narrow-lane chain (cf. ``_ell_spmm``)."""
    k = kp = B.shape[1]
    B_raw = B
    if k < 128:
        kp = 128
        B = jax.lax.optimization_barrier(jnp.concatenate(
            [B, jnp.zeros((B.shape[0], kp - k), B.dtype)], axis=1))
    W = plan.W
    nblk = max(-(-plan.n // W), 1)
    n_panels = plan.n_used_panels
    if plan.A.shape[0]:
        if plan.transposed:
            # k<128-specialized path: the dense half runs at the ORIGINAL
            # k (sublane-aligned to 8) through the transposed kernel — no
            # 128-lane padding, so k=32 does ~¼ the MXU passes.  Only the
            # gather/residue chain keeps the 128-lane layout (narrow-lane
            # gathers are 3-19x slower — docs/measurements.md).
            kt = -(-k // 8) * 8
            B_T = jnp.zeros((kt, (nblk + 1) * W), jnp.float32).at[
                :k, : plan.n].set(B_raw.T.astype(jnp.float32))
            outT = _window_pallas_t(plan.first, plan.out_panel,
                                    plan.win_step, plan.A, B_T,
                                    n_panels=n_panels, W=W, k=kt,
                                    precision=plan.precision,
                                    interpret=plan.interpret)
            out = outT.T[:, :k]                       # (R, k)
            if kp != k:
                out = jax.lax.optimization_barrier(jnp.concatenate(
                    [out, jnp.zeros((out.shape[0], kp - k), jnp.float32)],
                    axis=1))
        else:
            B_pad = jnp.zeros(((nblk + 1) * W, kp), jnp.float32).at[
                : plan.n].set(B)
            if plan.impl == "xla":
                out = _window_xla(plan.win_step, plan.A, B_pad,
                                  plan.out_panel, n_panels=n_panels, W=W,
                                  k=kp, precision=plan.precision)
            else:
                out = _window_pallas(plan.first, plan.out_panel,
                                     plan.win_step, plan.A, B_pad,
                                     n_panels=n_panels, W=W, k=kp,
                                     precision=plan.precision,
                                     interpret=plan.interpret,
                                     bwd=plan.bwd_tabs,
                                     n_blk_used=plan.n_blk_used)
        cat = jnp.concatenate([out, jnp.zeros((1, kp), jnp.float32)], axis=0)
        dense = cat[plan.row_gather][: plan.m]
    else:
        dense = jnp.zeros((plan.m, kp), jnp.float32)
    # residue partials scatter-add straight into the dense half (saves
    # the scatter-into-zeros + full-m add round trip, one (m, 128)
    # HBM read+write per call)
    full = dense if plan.ell.nnz == 0 else plan.ell(B, into=dense)
    if kp != k:
        # stop XLA sinking the slice back through the chain (it would
        # narrow the lanes again and undo the padding)
        full = jax.lax.optimization_barrier(full)[:, :k]
    return full


@dataclasses.dataclass
class WindowedPlan:
    """Hybrid plan: dense windowed MXU part + ELL residue part."""
    m: int
    n: int
    tm: int
    W: int
    n_used_panels: int
    A: Any               # f32 [total_steps, TM, G*W]
    first: Any           # i32 [total_steps]
    out_panel: Any       # i32 [total_steps]
    win_step: Any        # i32 [total_steps*G] block ids (sentinel = nblk)
    row_gather: Any      # i32 [P*TM] output-assembly permutation
    ell: EllPlan         # residue
    coverage: float
    interpret: bool
    impl: str = "pallas"
    precision: Any = jax.lax.Precision.HIGHEST
    min_count_eff: int = 0   # realized count gate (≠ min_count when budgeted)
    transposed: bool = False  # Aᵀ layout + k<128-specialized kernel
    n_windows: int = 0       # real (non-sentinel) window slots
    covered_nnz: int = 0     # nnz inside kept windows
    bwd_tabs: Any = None     # block-sorted slot tables (Pallas backward)
    n_blk_used: int = 0      # distinct window blocks (g_B output ranks)

    def __call__(self, B) -> jax.Array:
        return _windowed_call(self, B)

    @property
    def b_dtype(self) -> str:
        return self.ell.b_dtype

    @property
    def stats(self) -> dict:
        """Standing format-inflation counters (VERDICT r04 item 8): on TPU
        load imbalance is paid at FORMAT BUILD time — step-count and
        pad-ratio inflation — not as idle lanes at run time (the executed
        program is uniform per step; round-4 trace study).  These are the
        measured Imb% counter's counterpart (``flex.cu:5087-5132``):
        ``pad_ratio`` = residue gathered rows / real residue nnz,
        ``step_fill`` = real window slots / (steps·G) (per-panel step
        padding), ``dense_occ`` = covered nnz / dense elements (the A-byte
        inflation the MXU pays to avoid gathers)."""
        a_elems = int(np.prod(self.A.shape))
        s = {
            "coverage": round(self.coverage, 4),
            "dense_bytes": a_elems * 4,
            "n_steps": int(self.A.shape[0]),
            "n_res": self.ell.nnz,
            "W": self.W,
            "impl": self.impl,
            "min_count_eff": self.min_count_eff,
            "transposed": self.transposed,
            "pad_ratio": round(self.ell.padded_nnz / self.ell.nnz, 4)
            if self.ell.nnz else 1.0,  # empty residue: no inflation
        }
        if self.n_windows and self.A.ndim == 3:
            gw_axis = 1 if self.transposed else 2
            g_step = int(self.A.shape[gw_axis]) // self.W
            s["step_fill"] = round(
                self.n_windows / max(int(self.A.shape[0]) * g_step, 1), 4)
        if self.covered_nnz:
            s["dense_occ"] = round(self.covered_nnz / max(a_elems, 1), 6)
        return s

    def traffic_model(self, k: int) -> dict:
        """Byte model: dense windowed A read once; per window slot one
        (W, k) B block DMA (upper bound — ascending-sorted windows let
        Pallas skip the DMA when a slot's block id repeats); output
        assembled by one m-row take; plus the ELL residue chain.  NB: on
        this chip the dense part is usually MXU-HIGHEST-bound, not
        byte-bound (docs/measurements.md)."""
        st = self.stats
        gw_axis = 1 if self.transposed else 2
        g_step = (int(self.A.shape[gw_axis]) // self.W) \
            if self.A.ndim == 3 else G
        by = (st["dense_bytes"]
              + st["n_steps"] * g_step * self.W * k * 4
              + 3 * self.m * k * 4)
        res = self.ell.traffic_model(k) if self.ell.nnz else {"bytes": 0}
        return {"bytes": int(by) + res["bytes"]}


def prepare_windowed(
    g: CSRGraph,
    dev: DeviceCSR | None = None,
    tm: int = 256,
    W: int = 128,
    J: int = 1024,
    min_count: int = 128,
    min_coverage: float = MIN_COVERAGE,
    max_dense_bytes: int = MAX_DENSE_BYTES,
    b_dtype: str = "float32",
    interpret: bool | None = None,
    impl: str = "pallas",
    sel: dict | None = None,
    g_step: int = G,
    step_order: str = "row",
    fused: bool | str = True,
    transposed: bool = False,
) -> WindowedPlan:
    """Build the hybrid plan; refuses (ValueError) when windows would cover
    less than ``min_coverage`` of nnz (pure ELL wins there — the coverage
    model is shared with the autotuner via :func:`window_select`).  When
    the dense array at ``min_count`` would exceed ``max_dense_bytes`` the
    selection is *budgeted*: the count gate auto-raises to the smallest
    threshold that fits (see :func:`window_select`), so the build never
    refuses on bytes unless a caller-supplied ``sel`` itself is over.

    When ``sel`` comes from the autotuner (``bench.autotune.suggest``), its
    selection tables are reused — including their device copies
    (:func:`sel_device_tables`) — so the timed prepare does the O(nnz)
    device build and the residue ELL build with zero host→device uploads."""
    if dev is None:
        dev = DeviceCSR.from_graph(g)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if transposed and W % 128 != 0:
        # the transposed kernel's B-block is (k, W): Pallas requires the
        # lane (last) dim divisible by 128 (lowering error otherwise)
        raise ValueError(
            f"transposed windowed requires W % 128 == 0, got W={W} — "
            f"use W=128 or transposed=False")
    if sel is None:
        sel = window_select(g, tm=tm, W=W, J=J, min_count=min_count,
                            dev=dev, g_step=g_step, step_order=step_order,
                            max_dense_bytes=min(max_dense_bytes,
                                                (2**31 - 2) * 4))
    g_step = sel.get("G", g_step)
    if sel["dense_bytes"] > min(max_dense_bytes, (2**31 - 2) * 4):
        # only reachable with a caller-supplied (unbudgeted) selection
        raise ValueError(
            f"windowed dense array too big: {sel['dense_bytes']/1e9:.2f} GB")
    if sel["coverage"] < min_coverage:
        raise ValueError(
            f"window coverage {sel['coverage']:.3f} < {min_coverage} — "
            f"use 'ell' (or apply a clustering ordering like rbdeg first)")

    P, nblk, n_res = sel["P"], sel["nblk"], sel["n_res"]
    tabs = sel_device_tables(sel)
    # pstep0-packed slot table when the range fits int32 (round-5: one
    # nnz gather instead of two, −131 ms of tPre at reddit scale)
    ps_packed = tabs.get("slotps") is not None
    slot_tab = tabs["slotps"] if ps_packed else tabs["slot"]
    layout = (g.nnz, g.m, tm, W, nblk, n_res, sel["total_steps"], g_step,
              sel.get("unique_rc", False), bool(transposed), ps_packed)
    res_deg = sel.get("res_deg")
    if fused and res_deg is not None:
        from flex_tpu.ops.ell_spmm import _gather_assembly_tables

        # gather-assembled residue combine (see ell_spmm._ell_spmm
        # chunk1/extras): n_extras = chunks beyond each row's first,
        # host-static from the selection's residue degrees
        _n_live = int((np.asarray(res_deg) > 0).sum())

        def _assembly(chunk_row_dev):
            n_extras = int(chunk_row_dev.shape[0]) - _n_live
            return _gather_assembly_tables(chunk_row_dev, m=g.m,
                                           n_extras=n_extras)
        # Fused one-program build: the residue ELL layout is static from
        # the selection's host res_deg, so dense A, residue compaction,
        # and the ELL buckets compile into ONE executable — one dispatch,
        # one sync, zero transfers in the timed prepare.
        from flex_tpu.ops.ell_spmm import (
            DEFAULT_WIDTHS, ell_scatter_layout, host_bucket_sizes,
        )

        if fused in ("scatter", "scatter2"):
            # stage-2 variants: residue scattered directly into the padded
            # ELL layout (one packed [nnz, 2] scatter, or a combined-value
            # no-drop scatter + col scatter); layout tables are
            # selection-derived, cached like the other device tables
            if "ell_scatter_tables" not in sel:
                bucket_meta, H, chunk_row_h, padded = ell_scatter_layout(
                    res_deg, DEFAULT_WIDTHS)
                sel["ell_scatter_tables"] = {
                    "h": jnp.asarray(H),
                    "chunk_row": jnp.asarray(chunk_row_h),
                    "bucket_meta": bucket_meta, "padded": padded,
                }
            st = sel["ell_scatter_tables"]
            if fused == "scatter2":
                if sel["a_elems"] + st["padded"] >= 2**31:
                    raise ValueError(
                        "scatter2 combined buffer exceeds int32 indexing")
                builder = _build_windowed_ell_scatter2
            else:
                builder = _build_windowed_ell_scatter
            bkw = {} if fused == "scatter2" else {
                "chunks": sel.get("build_chunks")}
            A, buckets = builder(
                dev.row_ptr, dev.col, dev.vals, slot_tab,
                tabs["pstep0"], st["h"], layout=layout,
                bucket_meta=st["bucket_meta"], padded_total=st["padded"],
                **bkw)
            c1, ex = _assembly(st["chunk_row"])
            ell = EllPlan(m=g.m, buckets=buckets,
                          chunk_row=st["chunk_row"],
                          padded_nnz=st["padded"], nnz=n_res,
                          b_dtype=b_dtype, chunk1=c1, extras=ex)
        else:
            by_w, n_rows_last, padded = host_bucket_sizes(
                np.asarray(res_deg, dtype=np.int64), DEFAULT_WIDTHS)
            ell_meta = (DEFAULT_WIDTHS[-1], DEFAULT_WIDTHS,
                        tuple((w, nc, nc) for w, nc in by_w.items()),
                        n_rows_last)
            A, buckets, chunk_row = _build_windowed_ell(
                dev.row_ptr, dev.col, dev.vals, slot_tab,
                tabs["pstep0"], layout=layout, ell_meta=ell_meta,
                chunks=sel.get("build_chunks"))
            c1, ex = _assembly(chunk_row)
            ell = EllPlan(m=g.m, buckets=buckets, chunk_row=chunk_row,
                          padded_nnz=padded, nnz=n_res, b_dtype=b_dtype,
                          chunk1=c1, extras=ex)
    else:
        A, res_col, res_vals, res_row_ptr_dev = _build_windowed(
            dev.row_ptr, dev.col, dev.vals, slot_tab, tabs["pstep0"],
            layout=layout, chunks=sel.get("build_chunks"))
        # The ELL metadata is built on device from the device res_row_ptr;
        # the host copy comes from the selection's res_deg when available
        # (zero transfers, fully async chain) and from one m-sized D2H
        # otherwise.
        if res_deg is not None:
            res_row_ptr = np.zeros(g.m + 1, dtype=np.int64)
            np.cumsum(res_deg, out=res_row_ptr[1:])
            assert res_row_ptr[-1] == n_res
        else:
            res_row_ptr = np.asarray(res_row_ptr_dev).astype(np.int64)
        ell = prepare_ell_device(res_row_ptr_dev, res_col, res_vals,
                                 m=g.m, nnz=n_res,
                                 res_row_ptr_host=res_row_ptr,
                                 b_dtype=b_dtype)

    return WindowedPlan(
        m=g.m, n=g.n, tm=tm, W=W, n_used_panels=len(sel["used"]), A=A,
        first=tabs["first"],
        out_panel=tabs["out_panel"],
        win_step=tabs["win_step"],
        row_gather=tabs["row_gather"],
        ell=ell, coverage=sel["coverage"], interpret=interpret, impl=impl,
        min_count_eff=int(sel.get("min_count_eff", 0)),
        transposed=bool(transposed),
        n_windows=int(np.count_nonzero(sel["win_step"] != sel["nblk"])),
        covered_nnz=int(g.nnz - n_res),
        # Pallas backward tables (row-major kernel only; the transposed
        # k<128 kernel keeps the XLA backward — training runs at k=128)
        bwd_tabs=None if transposed else sel.get("bwd_tabs"),
        n_blk_used=0 if transposed else int(sel.get("n_blk_used", 0)),
    )


def spmm_windowed(g: CSRGraph, B, **kwargs):
    return prepare_windowed(g, **kwargs)(jnp.asarray(B))


def with_training_bwd(plan: WindowedPlan) -> WindowedPlan:
    """Copy of ``plan`` whose residue ELL carries a transposed-pattern
    backward plan (``ell_spmm.with_bwd_plan``): the residue's g_B then
    runs as A_resᵀ·g through the gather engine instead of autodiff's
    scatter-add over the padded gathered rows.  Training-only — the
    transpose build (device argsort over the residue triples + one O(n)
    D2H) never touches the timed tPre path.  Valid only when the A
    values are constants (GNN adjacency); gradients wrt A values are not
    propagated through the residue."""
    if plan.ell.nnz == 0 or not plan.ell.buckets:
        return plan
    from flex_tpu.ops.ell_spmm import with_bwd_plan
    return dataclasses.replace(plan, ell=with_bwd_plan(plan.ell, plan.n))


def _win_flatten(p: WindowedPlan):
    return (p.A, p.first, p.out_panel, p.win_step, p.row_gather, p.ell,
            p.bwd_tabs), (
        p.m, p.n, p.tm, p.W, p.n_used_panels, p.coverage, p.interpret,
        p.impl, p.precision, p.min_count_eff, p.transposed, p.n_windows,
        p.covered_nnz, p.n_blk_used)


def _win_unflatten(aux, children):
    (m, n, tm, W, n_used, coverage, interpret, impl, precision, mc_eff,
     transposed, n_windows, covered_nnz, n_blk_used) = aux
    return WindowedPlan(m=m, n=n, tm=tm, W=W, n_used_panels=n_used,
                        A=children[0], first=children[1],
                        out_panel=children[2], win_step=children[3],
                        row_gather=children[4], ell=children[5],
                        coverage=coverage, interpret=interpret, impl=impl,
                        precision=precision, min_count_eff=mc_eff,
                        transposed=transposed, n_windows=n_windows,
                        covered_nnz=covered_nnz, bwd_tabs=children[6],
                        n_blk_used=n_blk_used)


jax.tree_util.register_pytree_node(WindowedPlan, _win_flatten, _win_unflatten)
