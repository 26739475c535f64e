"""Degree ordering (reference ``order_deg.cu:19-45``, ``DataLoaderDeg``).

Stable sort by degree — descending by default like the reference's
``DataLoaderDeg`` — with node-id-ascending tie-break.
"""
from __future__ import annotations

import numpy as np

from flex_tpu.sparse.csr import CSRGraph


def order_deg(g: CSRGraph, desc: bool = True) -> np.ndarray:
    d = g.degrees
    key = -d if desc else d
    return np.argsort(key, kind="stable").astype(np.int64)
