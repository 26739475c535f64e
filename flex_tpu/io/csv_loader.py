"""3-line CSV ⇄ CSR loader.

File format (reference ``DataLoader.cu:19-54``): a CSR matrix stored as three
comma-separated lines — row_ptr, col, vals.  Quirk reproduced from the
reference: ``amazon.csv`` ships only the first two lines; its values are drawn
uniformly from [-1, 1) (``DataLoader.cu:36-46``).
"""
from __future__ import annotations

import os

import numpy as np

from flex_tpu.io.native import parse_number_line
from flex_tpu.sparse.csr import CSRGraph


def load_csv(path: str, seed: int = 0) -> CSRGraph:
    """Load a 3-line CSV CSR file; values are synthesised for amazon.csv.

    Line parsing rides the C++ native (``io/_native/fastcsv.cc`` — the
    analog of the reference's native DataLoader parse,
    ``DataLoader.cu:19-54``) with a NumPy fallback; at amazon scale the
    native parses 264M numbers in seconds vs ~17 s for np.loadtxt.
    """
    name = os.path.basename(path).split(".")[0]
    with open(path, "rb") as f:
        row_ptr = parse_number_line(f.readline().strip(), np.int64)
        col = parse_number_line(f.readline().strip(), np.int64)
        vals_line = f.readline().strip()

    if name == "amazon" or not vals_line:
        # amazon.csv carries no values; reference draws U[-1, 1).
        rng = np.random.default_rng(seed)
        vals = (2.0 * rng.random(len(col)) - 1.0).astype(np.float32)
    else:
        vals = parse_number_line(vals_line, np.float32)

    if len(col) != len(vals):
        raise ValueError(f"{path}: col/vals length mismatch {len(col)} vs {len(vals)}")
    return CSRGraph.from_arrays(row_ptr, col, vals, name=name)


def save_csv(g: CSRGraph, path: str) -> None:
    with open(path, "w") as f:
        f.write(",".join(map(str, g.row_ptr.tolist())) + "\n")
        f.write(",".join(map(str, g.col.tolist())) + "\n")
        f.write(",".join(f"{v:g}" for v in g.vals.tolist()) + "\n")


def make_features(g: CSRGraph, k: int, seed: int = 1, debug: bool = False) -> np.ndarray:
    """The dense operand B (a.k.a. X): n×k random U[-1,1) features.

    Reference ``DataLoader.cu:198-209`` (``opt_debug`` switches to row-index
    features for hand-checking, reproduced via ``debug=True``).
    """
    if debug:
        return np.broadcast_to(
            np.arange(g.n, dtype=np.float32)[:, None], (g.n, k)
        ).copy()
    rng = np.random.default_rng(seed)
    return (2.0 * rng.random((g.n, k)) - 1.0).astype(np.float32)
