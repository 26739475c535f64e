"""Vertex-permutation application with invariant checks.

Re-implements the semantics of the reference's ``DataLoader::perm_apply``
(``DataLoader.cu:244-321``): given a vertex order ``perm`` with
``perm[new_id] = old_id``, symmetrically permute rows and columns of the CSR
matrix, sort each row's destinations ascending (the tiling passes require
sorted columns), and run a checksum-based "rough test that the two graphs
match" (``DataLoader.cu:291-320``).
"""
from __future__ import annotations

import numpy as np

from flex_tpu.sparse.csr import CSRGraph, repeat_arange, repeat_values


def invert_permutation(perm: np.ndarray) -> np.ndarray:
    """old→new map from a new→old map (asserts a bijection,
    reference ``DataLoader.cu:251-258``)."""
    n = len(perm)
    # explicit range check: numpy fancy indexing would silently wrap
    # negative entries, making a corrupt permutation look bijective
    if n and (int(perm.min()) < 0 or int(perm.max()) >= n):
        raise ValueError("perm entries out of range [0, n)")
    inv = np.full(n, -1, dtype=np.int64)
    inv[perm] = np.arange(n, dtype=np.int64)
    if (inv < 0).any():
        raise ValueError("perm is not a bijection")
    return inv


def apply_vertex_order(
    g: CSRGraph, perm: np.ndarray, order_abbr: str, check: bool = True
) -> CSRGraph:
    """Return ``P A P^T`` with per-row sorted columns.

    Args:
      g: input graph.
      perm: int[n] with ``perm[new] = old`` (the reference's ``vo_mp``).
      order_abbr: ordering tag for the result (e.g. "RCM").
      check: run the graph-match invariants (cheap, vectorised).
    """
    perm = np.asarray(perm, dtype=np.int64)
    n = g.m
    assert len(perm) == n
    old_to_new = invert_permutation(perm)

    deg = g.degrees
    new_deg = deg[perm]
    row_ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(new_deg, out=row_ptr[1:])

    # Gather each new row's edges from the old row, relabel cols, sort.
    # Build a gather index: for new row r, old edges g.row_ptr[perm[r]] .. +deg.
    src_start = g.row_ptr[perm]
    gather = repeat_values(src_start - row_ptr[:-1], new_deg, total=g.nnz
                           ) + np.arange(g.nnz, dtype=np.int64)
    col_new = old_to_new[g.col[gather]]
    vals_new = g.vals[gather]

    # Sort columns ascending within each row: stable argsort of the fused
    # row*n+col key (lexsort on two separate keys measured 13.8 s at 23M
    # on this host vs 3.0 s fused; n*n < 2^63 for any graph that fits RAM)
    key = repeat_arange(new_deg, total=g.nnz)
    np.multiply(key, n, out=key)
    np.add(key, col_new, out=key)
    sort_idx = np.argsort(key, kind="stable")
    del key
    col_new = col_new[sort_idx].astype(np.int32)
    vals_new = vals_new[sort_idx]

    out = CSRGraph(
        row_ptr=row_ptr, col=col_new, vals=vals_new, name=g.name, order=order_abbr
    )
    if check:
        check_permutation_invariants(g, out, old_to_new)
    return out


def check_permutation_invariants(
    old: CSRGraph, new: CSRGraph, old_to_new: np.ndarray
) -> None:
    """Vectorised version of the reference's checksum test
    (``DataLoader.cu:291-320``): per-destination weighted edge-multiplicity
    checksums must match under the relabeling."""
    assert old.nnz == new.nnz and old.m == new.m
    n = old.m

    old_rows = repeat_arange(old.degrees, total=old.nnz)
    new_rows = repeat_arange(new.degrees, total=new.nnz)

    inc_old = old_rows & 0xF  # same per-source weight as the reference
    # In the new graph, row r corresponds to old row perm[r]; the reference
    # weights by the *old* row id.
    new_to_old = np.empty(n, dtype=np.int64)
    new_to_old[old_to_new] = np.arange(n, dtype=np.int64)
    inc_new = new_to_old[new_rows] & 0xF

    chk_old = np.bincount(old.col, weights=inc_old, minlength=n)
    chk_new = np.bincount(new.col, weights=inc_new, minlength=n)
    if not np.array_equal(chk_old, chk_new[old_to_new]):
        raise AssertionError("permutation edge-multiplicity checksum mismatch")

    chkw_old = np.bincount(old.col, weights=old.vals.astype(np.float64), minlength=n)
    chkw_new = np.bincount(new.col, weights=new.vals.astype(np.float64), minlength=n)
    if not np.allclose(chkw_old, chkw_new[old_to_new], rtol=1e-10, atol=1e-9):
        raise AssertionError("permutation weight checksum mismatch")
