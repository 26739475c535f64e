"""MatrixMarket (.mtx) → CSRGraph converter.

Replaces the reference's SuiteSparse tooling (``data/SuiteSparse/mtx2csr.cc``
+ ``mmio.h``, derived from TileSpGEMM): reads an MTX file (coordinate or
array, general or symmetric), drops explicit zeros, and produces the same
3-line-CSV-compatible CSR container the rest of the framework consumes.
"""
from __future__ import annotations

import numpy as np

from flex_tpu.sparse.csr import CSRGraph


def load_mtx(path: str, name: str | None = None) -> CSRGraph:
    import scipy.io
    import scipy.sparse as sp

    mat = scipy.io.mmread(path)  # handles symmetric/skew/pattern storage
    if not sp.issparse(mat):
        mat = sp.coo_matrix(mat)
    mat = mat.tocoo()
    n = max(mat.shape)
    vals = np.asarray(mat.data, dtype=np.float32)
    if vals.size == 0:
        vals = np.zeros(0, np.float32)
    # pattern matrices come back as 1s already; drop explicit zeros
    keep = vals != 0
    if name is None:
        import os

        name = os.path.basename(path).split(".")[0]
    return CSRGraph.from_coo(
        mat.row[keep], mat.col[keep], vals[keep], n, name=name
    )


def mtx_to_csv(mtx_path: str, csv_path: str) -> CSRGraph:
    """The mtx2csr.cc pipeline: MTX → 3-line CSV CSR on disk."""
    from flex_tpu.io.csv_loader import save_csv

    g = load_mtx(mtx_path)
    save_csv(g, csv_path)
    return g
