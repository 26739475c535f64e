"""Synthetic graph generators.

The reference benchmarks six SNAP/GNN graphs (``README.md:13-20``) of which
only Pubmed ships in-tree; the rest are fetched externally.  With no network
egress we approximate the missing graphs with generators matched on
(n, nnz, structure):

- :func:`rmat_graph` — R-MAT / Kronecker power-law graphs (community structure,
  Reddit/Amazon-like).
- :func:`uniform_graph` — Erdős–Rényi-style uniform sparsity (worst case for
  tiling).
- :func:`banded_graph` — diagonal-band sparsity (best case; what RCM produces
  on mesh-like graphs).
"""
from __future__ import annotations

import numpy as np

from flex_tpu.sparse.csr import CSRGraph


def _dedupe_coo(rows, cols, m):
    keys = rows.astype(np.int64) * m + cols
    keys = np.unique(keys)
    return keys // m, keys % m


def rmat_graph(
    m: int,
    nnz_target: int,
    a: float = 0.45,
    b: float = 0.22,
    c: float = 0.22,
    seed: int = 0,
    name: str = "rmat",
) -> CSRGraph:
    """R-MAT (Chakrabarti et al., SDM'04) generator.  Defaults are softened
    from Graph500's (0.57/0.19/0.19): at Graph500 skew a Reddit-sized
    instance puts >95% of nnz in degree≥512 rows, far more extreme than the
    real GNN benchmark graphs (Reddit max-degree ≈ 21K at avg 100)."""
    rng = np.random.default_rng(seed)
    scale = int(np.ceil(np.log2(max(m, 2))))
    n_samples = int(nnz_target * 1.15) + 16  # oversample to survive dedupe

    rows = np.zeros(n_samples, dtype=np.int64)
    cols = np.zeros(n_samples, dtype=np.int64)
    p_ab = a + b
    p_abc = a + b + c
    for _ in range(scale):
        r = rng.random(n_samples)
        # Standard R-MAT quadrants: a=[0,a) top-left, b=[a,a+b) top-right
        # (sets the COLUMN bit), c=[a+b,a+b+c) bottom-left (sets the ROW
        # bit), d=rest bottom-right (sets both).  Round 1 had b/c swapped
        # (invisible at the b==c defaults; round-1 advisor, low).
        right = ((r >= a) & (r < p_ab)) | (r >= p_abc)
        down = r >= p_ab
        rows = rows * 2 + down
        cols = cols * 2 + right

    size = 1 << scale
    keep = (rows < m) & (cols < m)
    rows, cols = rows[keep], cols[keep]
    del size
    rows, cols = _dedupe_coo(rows, cols, m)
    if len(rows) > nnz_target:
        sel = rng.choice(len(rows), nnz_target, replace=False)
        sel.sort()
        rows, cols = rows[sel], cols[sel]
    vals = (2.0 * rng.random(len(rows)) - 1.0).astype(np.float32)
    return CSRGraph.from_coo(rows, cols, vals, m, name=name)


def uniform_graph(m: int, nnz_target: int, seed: int = 0, name: str = "uniform") -> CSRGraph:
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, m, int(nnz_target * 1.1) + 16)
    cols = rng.integers(0, m, len(rows))
    rows, cols = _dedupe_coo(rows, cols, m)
    if len(rows) > nnz_target:
        sel = rng.choice(len(rows), nnz_target, replace=False)
        sel.sort()
        rows, cols = rows[sel], cols[sel]
    vals = (2.0 * rng.random(len(rows)) - 1.0).astype(np.float32)
    return CSRGraph.from_coo(rows, cols, vals, m, name=name)


def banded_graph(
    m: int, bandwidth: int, avg_degree: float, seed: int = 0, name: str = "banded"
) -> CSRGraph:
    """Edges concentrated within ±bandwidth of the diagonal."""
    rng = np.random.default_rng(seed)
    nnz_target = int(m * avg_degree)
    rows = rng.integers(0, m, int(nnz_target * 1.2) + 16)
    off = rng.integers(-bandwidth, bandwidth + 1, len(rows))
    cols = np.clip(rows + off, 0, m - 1)
    rows, cols = _dedupe_coo(rows, cols, m)
    if len(rows) > nnz_target:
        sel = rng.choice(len(rows), nnz_target, replace=False)
        sel.sort()
        rows, cols = rows[sel], cols[sel]
    vals = (2.0 * rng.random(len(rows)) - 1.0).astype(np.float32)
    return CSRGraph.from_coo(rows, cols, vals, m, name=name)


# (n, nnz) matched to README.md:13-20 dataset table.
def reddit_like(seed: int = 0) -> CSRGraph:
    """Reddit-scale R-MAT stand-in: 232,965 rows, ~23.4M nnz."""
    return rmat_graph(232_965, 23_446_803, seed=seed, name="reddit_like")


def yelp_like(seed: int = 0) -> CSRGraph:
    return rmat_graph(716_847, 13_954_819, seed=seed, name="yelp_like")


def flickr_like(seed: int = 0) -> CSRGraph:
    return rmat_graph(89_250, 989_006, seed=seed, name="flickr_like")


def ppi_like(seed: int = 0) -> CSRGraph:
    return rmat_graph(14_755, 458_973, seed=seed, name="ppi_like")


def amazon_like(seed: int = 0) -> CSRGraph:
    return rmat_graph(1_569_960, 264_339_468, seed=seed, name="amazon_like")
