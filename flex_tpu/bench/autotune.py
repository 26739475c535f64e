"""Autotuner: pick the SpMM strategy per matrix.

The reference hand-sweeps 4 orderings × 4 tile shapes × 36 kernels and a
human reads the table (``flex.cu:4560-5716``).  Here a static *time
model* built from the format statistics and measured per-primitive rates
picks the strategy (BASELINE.json: "tile-occupancy stats from reordering
drive an auto-tuner"), and an optional measured search refines it on
device.

Measured rate constants (docs/measurements.md, reddit-scale, k=128):
- ELL chain: ~7.3 ns per *padded* nnz (take→materialise→reduce at the
  ~140 GB/s effective stream the chain achieves).
- windowed dense part: ~0.6 µs per kept (256,128) window (2.26 µs per
  G=4 step measured on reddit_posts: MXU-HIGHEST dot + A/B block DMA,
  pipelined).
- dense-A einsum (panel tail path): MXU HIGHEST ≈ 8.9 TF/s; HBM stream
  ≈ 250 GB/s.
These are per-chip calibrations, not universal truths; the measured
`autotune()` search is the ground truth when it matters.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.tiling.stats import tile_stats

ELL_NS_PER_PAD = 7.3e-9     # at k=128; the chain is byte-bound, so ∝ k
WIN_US_PER_WINDOW = 0.4e-6  # at k=128; MXU-bound, so ∝ k (r3 sweep:
                            # 16.5 ms / 48.7K windows = 0.34 µs at scale)
MXU_HIGHEST = 8.9e12
HBM = 250e9
FIXED_OVERHEAD = 4e-3  # dispatch + output assembly floor
_CAL_K = 128  # k at which the constants above were measured


@dataclasses.dataclass
class Suggestion:
    method: str
    reason: str
    prep_kwargs: dict
    model: dict | None = None  # predicted seconds per candidate


def _k_factor(k: int) -> float:
    """Below k=128 the chains run at k=128 cost (the ELL path pads B to
    the 128-lane layout — sub-128 lanes measured 3-19x slower — and the
    windowed path is step-overhead-bound: k=32 measured ≈ k=128)."""
    return max(k, _CAL_K) / _CAL_K


def _t_ell(degrees, k: int = 128) -> float:
    from flex_tpu.ops.ell_spmm import ell_padded_nnz

    return ell_padded_nnz(degrees) * ELL_NS_PER_PAD * _k_factor(k)


def suggest(
    g: CSRGraph, k: int = 128, tm: int = 128, hub_threshold: int = 512,
    win_tm: int = 256, win_W: int = 128, win_min_count: int = 48,
    dev=None, max_dense_bytes: int | None = None,
) -> Suggestion:
    """Static time-model decision from format statistics (no device
    needed).  Candidates: xla (tiny graphs), band (contiguous windows),
    windowed (community blocks + residue), panel (deduplicated-gather
    dense tail, needs a hub-prefix ordering), ell (robust default).
    gespmm is never suggested (documented-negative baseline,
    ops/gespmm.py)."""
    if g.nnz < 50_000:
        return Suggestion("xla", "tiny graph: dispatch-bound", {})

    # band: all panels' columns inside one narrow window — the big winner
    # when it applies (616 GF/s measured).  Uses prepare_band's own
    # worst-case window model so eligibility and the format can't drift.
    from flex_tpu.ops.pallas_band import panel_window_stats

    band_tm = max(tm, 256)
    _, w_pad, band_density, band_bytes = panel_window_stats(g, band_tm)
    if band_density >= 0.02 and band_bytes < (4 << 30):
        return Suggestion(
            "band",
            f"window={w_pad} density={band_density:.3f}: contiguous MXU path",
            {"tm": band_tm},
        )

    model: dict[str, float] = {"ell": _t_ell(g.degrees, k) + FIXED_OVERHEAD}

    # windowed: share the builder's own selection (window_select) so the
    # model and the built format agree — including the eligibility
    # thresholds (module constants, round-2 advisor finding).
    win_kwargs = {"tm": win_tm, "W": win_W, "min_count": win_min_count}
    from flex_tpu.ops.window_spmm import (
        MAX_DENSE_BYTES, MIN_COVERAGE, window_select,
    )

    # budgeted selection: when the dense array at min_count would blow the
    # HBM cap, window_select raises the count gate to the smallest value
    # that fits (greedy-optimal covered-nnz per byte) — this is what makes
    # windowed eligible at amazon scale on one chip
    if max_dense_bytes is None:
        max_dense_bytes = MAX_DENSE_BYTES
    sel = window_select(g, dev=dev, max_dense_bytes=max_dense_bytes,
                        **win_kwargs)
    if sel["coverage"] >= MIN_COVERAGE:
        n_win = sel["total_steps"] * sel["G"]
        # residue padded-nnz ≈ n_res x the fine ladder's measured ~1.12
        # pad ratio (exact per-row degrees are only computed on device)
        model["windowed"] = ((n_win * WIN_US_PER_WINDOW
                              + sel["n_res"] * 1.12 * ELL_NS_PER_PAD)
                             * _k_factor(k)
                             + FIXED_OVERHEAD)

    # panel: dense-A over per-panel deduplicated columns + hub row-split.
    # Pays only when B-reuse is high AND the dense tail stays small —
    # hub-concentrated column skew (see io/synth.hub_graph), not plain
    # community structure.  Requires a hub-prefix ordering (deg).
    st = tile_stats(g, bm=tm)
    deg = g.degrees
    hub_prefix_ok = bool(
        (np.diff((deg >= hub_threshold).astype(np.int8)) <= 0).all()
    )
    if hub_prefix_ok:
        u_avg = st.unique_cols_per_panel_avg
        n_p = st.n_row_panels
        gathered = n_p * u_avg
        a_bytes = n_p * tm * (1.3 * u_avg) * 4  # ~bucket padding
        t_panel = ((a_bytes + 3 * gathered * k * 4) / HBM
                   + n_p * tm * u_avg * k * 2 / MXU_HIGHEST
                   + FIXED_OVERHEAD)
        reuse = g.nnz / max(gathered, 1)
        # Eligibility is gated to the regime the model is VALIDATED in
        # (experiments/panel_regime.py, on chip): at m=50K hub graphs the
        # model is accurate and panel genuinely wins (5.3 ms vs windowed
        # 7.4 ms, 176.7 GF/s); at m=200K it measured 5-10x its model
        # (288-358 ms vs predicted 28-69 ms) while windowed landed near
        # its own prediction — trusting the model there risks an 11x
        # mis-route (case 0: panel 28 vs windowed 27 ms predicted, 288
        # vs 26 ms measured).
        if reuse >= 2.0 and g.m <= 100_000:
            model["panel"] = t_panel

    method = min(model, key=model.get)
    kw = {}
    if method == "windowed":
        kw = dict(win_kwargs, sel=sel)
        if k < 128 and win_W % 128 == 0:
            # k<128-specialized transposed kernel: measured 46.7 vs
            # 53.7 ms at k=32 on the headline graph (r4 sweep); at k=128
            # the row-major kernel is ~3% faster, so it stays default
            kw["transposed"] = True
    elif method == "panel":
        kw = {"tm": tm, "hub_threshold": hub_threshold}
    pretty = ", ".join(f"{m}={t*1e3:.0f}ms" for m, t in sorted(model.items()))
    return Suggestion(method, f"time model: {pretty}", kw, model=model)


def autotune(
    g: CSRGraph,
    k: int = 128,
    methods: Sequence[str] = ("ell", "windowed", "panel", "xla", "bcoo"),
    iters: int = 3,
    check: bool = False,
):
    """Measured search: benchmark each candidate on device, return the
    list of BenchResults sorted fastest-first."""
    from flex_tpu.bench.harness import bench_spmm
    from flex_tpu.sparse.device import DeviceCSR

    # one CSR upload shared by every candidate (the loader's one-time
    # job, reference cuda_alloc_cpy) — per-method re-uploads cost ~5 s
    # each through the ~35 MB/s tunnel at reddit scale
    dev = DeviceCSR.from_graph(g)
    results = []
    for method in methods:
        kw = {"dev": dev} if method in ("ell", "band", "windowed",
                                        "gespmm", "bcoo") else {}
        try:
            results.append(bench_spmm(g, k, method=method, iters=iters,
                                      check=check, **kw))
        except Exception as e:  # candidate failed (e.g. OOM); skip it
            import sys

            print(f"autotune: {method} failed: {e}", file=sys.stderr)
    results.sort(key=lambda r: r.t_elap)
    return results
