"""Reverse Cuthill–McKee ordering.

The reference composes degree-ASC relabeling → BFS → reverse
(``order_rcm.cu:15-33``, ``algo_bfs.cu:11-39``); SciPy's
``reverse_cuthill_mckee`` implements exactly Cuthill–McKee with
degree-ordered neighbor visits in C, so we use it (on the symmetrised
pattern, matching the reference's undirected ``Uadjlist``).
"""
from __future__ import annotations

import numpy as np

from flex_tpu.sparse.csr import CSRGraph


def order_rcm(g: CSRGraph) -> np.ndarray:
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    A = g.to_scipy()
    # symmetric_mode=False tells scipy to work on A + A.T, i.e. treat the
    # graph as undirected like the reference's Uadjlist.
    perm = reverse_cuthill_mckee(A, symmetric_mode=False)
    return perm.astype(np.int64)  # perm[new] = old, scipy's convention too
