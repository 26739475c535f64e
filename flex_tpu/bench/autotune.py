"""Autotuner: pick the SpMM strategy per matrix.

The reference hand-sweeps 4 orderings × 4 tile shapes × 36 kernels and a
human reads the table (``flex.cu:4560-5716``).  Here the tile-occupancy
statistics drive a cheap static *suggestion*, and an optional measured
search refines it on device (BASELINE.json: "tile-occupancy stats from
reordering drive an auto-tuner").
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.tiling.stats import tile_stats


@dataclasses.dataclass
class Suggestion:
    method: str
    reason: str
    prep_kwargs: dict


def suggest(
    g: CSRGraph, k: int = 128, tm: int = 128, hub_threshold: int = 512
) -> Suggestion:
    """Static heuristic from format statistics (no device needed).

    Decision model (docs/measurements.md):
    - panel (dense-A MXU) pays off only when per-panel B-reuse
      nnz/unique-cols ≥ ~2 — otherwise its dense-A traffic ≥ the gather it
      saves;
    - ell is the robust default (zero inflation, exact f32);
    - xla take+segment_sum only wins for tiny graphs where kernel count
      overhead dominates.
    """
    if g.nnz < 50_000:
        return Suggestion("xla", "tiny graph: dispatch-bound", {})
    import numpy as np

    st = tile_stats(g, bm=tm)
    # band: all panels' columns inside a narrow window -> contiguous MXU path
    # (the big winner when it applies: 334 GF/s vs 12 for gather-based).
    # Uses prepare_band's own worst-case window model so eligibility and the
    # actual format build can't drift.
    from flex_tpu.ops.pallas_band import panel_window_stats

    band_tm = max(tm, 256)
    _, w_pad, band_density, band_bytes = panel_window_stats(g, band_tm)
    if band_density >= 0.02 and band_bytes < (4 << 30):
        return Suggestion(
            "band",
            f"window={w_pad} density={band_density:.3f}: contiguous MXU path",
            {"tm": band_tm},
        )
    reuse = g.nnz / max(st.unique_cols_per_panel_avg * st.n_row_panels, 1)
    deg = g.degrees
    hub_prefix_ok = bool(
        (np.diff((deg >= hub_threshold).astype(np.int8)) <= 0).all()
    )
    if reuse >= 2.0 and hub_prefix_ok:
        return Suggestion(
            "panel",
            f"panel B-reuse {reuse:.2f} ≥ 2 at tm={tm}",
            {"tm": tm, "hub_threshold": hub_threshold},
        )
    return Suggestion("ell", f"panel B-reuse {reuse:.2f} < 2: gather-bound", {})


def autotune(
    g: CSRGraph,
    k: int = 128,
    methods: Sequence[str] = ("ell", "panel", "xla"),
    iters: int = 3,
    check: bool = False,
):
    """Measured search: benchmark each candidate on device, return the
    list of BenchResults sorted fastest-first."""
    from flex_tpu.bench.harness import bench_spmm

    results = []
    for method in methods:
        try:
            results.append(bench_spmm(g, k, method=method, iters=iters, check=check))
        except Exception as e:  # candidate failed (e.g. OOM); skip it
            import sys

            print(f"autotune: {method} failed: {e}", file=sys.stderr)
    results.sort(key=lambda r: r.t_elap)
    return results
