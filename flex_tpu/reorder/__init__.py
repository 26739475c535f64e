"""Vertex reordering passes.

Re-designs of the reference's five orderings (``DataLoader.cu:324-857``,
``order_*.cu``), which densify sparse tiles so the tiling layer produces
near-dense MXU blocks.  All functions return a permutation ``perm`` with
``perm[new_id] = old_id`` (the reference's ``vo_mp`` convention).

Orderings:
  - ``ovo``    — original vertex order (identity).
  - ``deg``    — degree sort (reference ``DataLoaderDeg`` / ``order_deg.cu``).
  - ``rcm``    — reverse Cuthill–McKee (reference ``order_rcm.cu``).
  - ``dfs``    — DFS preorder renumbering (reference ``DataLoader.cu:324-453``).
  - ``gorder`` — SIGMOD'16 Gorder sliding-window locality ordering
                 (reference ``order_gorder.cu``).
  - ``rabbit`` — modularity clustering (Shiokawa'13/Arai'16)
                 (reference ``DataLoader.cu:455-655``).

Heavy passes (gorder, rabbit) auto-dispatch to the C++ native implementation
when built (:mod:`flex_tpu.reorder.native`), falling back to pure Python.
"""
from __future__ import annotations

import numpy as np

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.perm import apply_vertex_order

ORDER_ABBR = {
    "ovo": "OVO",
    "deg": "DEG",
    "rcm": "RCM",
    "dfs": "DFS",
    "gorder": "GOR",
    "rabbit": "RBT",
    "rbdeg": "RBD",
}


def compute_order(g: CSRGraph, method: str, **kwargs) -> np.ndarray:
    """Return perm[new] = old for the requested ordering."""
    method = method.lower()
    if method == "ovo":
        return np.arange(g.m, dtype=np.int64)
    if method == "deg":
        from flex_tpu.reorder.deg import order_deg

        return order_deg(g, **kwargs)
    if method == "rcm":
        from flex_tpu.reorder.rcm import order_rcm

        return order_rcm(g, **kwargs)
    if method == "dfs":
        from flex_tpu.reorder.dfs import order_dfs

        return order_dfs(g, **kwargs)
    if method == "gorder":
        from flex_tpu.reorder.gorder import order_gorder

        return order_gorder(g, **kwargs)
    if method == "rabbit":
        from flex_tpu.reorder.rabbit import order_rabbit

        return order_rabbit(g, **kwargs)
    if method == "rbdeg":
        from flex_tpu.reorder.rabbit import order_rabbit

        # Composite: rabbit clusters contiguous (in emission order), vertices
        # degree-DESCENDING inside each cluster.  Concentrates every
        # cluster's high-degree columns into a contiguous prefix, which the
        # windowed MXU kernel captures with a handful of aligned B blocks —
        # the TPU analog of the reference rabbit's hub-grouping options
        # (DataLoader.cu:455-655 keeps them off; we make them a first-class
        # ordering because block-DMA eligibility, not cache reuse, is what
        # ordering buys on TPU — docs/measurements.md).
        _, labels = order_rabbit(g, want_labels=True, **kwargs)
        return np.lexsort((-g.degrees, labels)).astype(np.int64)
    raise ValueError(f"unknown ordering {method!r}; have {sorted(ORDER_ABBR)}")


def reorder(g: CSRGraph, method: str, check: bool = True, **kwargs) -> CSRGraph:
    """Compute an ordering and apply it (rows+cols permuted, rows re-sorted)."""
    perm = compute_order(g, method, **kwargs)
    return apply_vertex_order(g, perm, ORDER_ABBR[method.lower()], check=check)
