"""Golden references for SpMM.

Replaces the reference's cuSPARSE gold (``DataLoader.cu:221-227``,
``flex.cu:5737-5790``) with SciPy on host and a dense-JAX variant for
device-side cross checks.
"""
from __future__ import annotations

import numpy as np

from flex_tpu.sparse.csr import CSRGraph


def spmm_scipy(g: CSRGraph, B: np.ndarray) -> np.ndarray:
    return np.asarray(g.to_scipy() @ np.asarray(B), dtype=np.float32)


def spmm_dense_numpy(g: CSRGraph, B: np.ndarray) -> np.ndarray:
    """O(m·n·k) dense check for tiny matrices only."""
    A = g.to_scipy().toarray()
    return (A @ np.asarray(B)).astype(np.float32)
