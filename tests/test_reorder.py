import numpy as np
import pytest

from flex_tpu.io import make_features
from flex_tpu.io.synth import rmat_graph
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.reorder import ORDER_ABBR, compute_order, reorder
from flex_tpu.sparse.perm import invert_permutation
from flex_tpu.utils.check import res_check

ALL_ORDERINGS = sorted(ORDER_ABBR)


@pytest.mark.parametrize("method", ALL_ORDERINGS)
def test_order_is_bijection(a_mat, method):
    perm = compute_order(a_mat, method)
    assert len(perm) == a_mat.m
    invert_permutation(perm)  # raises if not a bijection


@pytest.mark.parametrize("method", ALL_ORDERINGS)
def test_reorder_preserves_spmm(a_mat, method):
    """C' = P·A·Pᵀ·(P·B) must equal P·(A·B) — the property the reference's
    B-permutation kernel (flexspmm_v9_permuteX) relies on."""
    g2 = reorder(a_mat, method)
    perm = compute_order(a_mat, method)
    B = make_features(a_mat, 8)
    gold = spmm_scipy(a_mat, B)
    got = spmm_scipy(g2, B[perm])  # B rows permuted into new vertex order
    chk = res_check(gold[perm], got, g2.degrees)
    assert chk.ok, f"{method}: {chk}"


@pytest.mark.parametrize("method", ALL_ORDERINGS)
def test_reorder_sorted_columns(a_mat, method):
    g2 = reorder(a_mat, method)
    rows = np.repeat(np.arange(g2.m), g2.degrees)
    order = np.lexsort((g2.col, rows))
    np.testing.assert_array_equal(order, np.arange(g2.nnz))


def test_deg_descending(a_mat):
    g2 = reorder(a_mat, "deg")
    d = g2.degrees
    assert np.all(d[:-1] >= d[1:])


def test_rcm_reduces_bandwidth():
    g = rmat_graph(1024, 8192, seed=7)

    def bandwidth(gg):
        rows = np.repeat(np.arange(gg.m), gg.degrees)
        return int(np.abs(rows - gg.col).max()) if gg.nnz else 0

    g2 = reorder(g, "rcm")
    assert bandwidth(g2) <= bandwidth(g)


def test_rabbit_improves_modularity():
    from flex_tpu.reorder.rabbit import modularity, order_rabbit

    # Planted-partition graph: 8 dense communities of 64.
    rng = np.random.default_rng(0)
    n, k = 512, 64
    rows, cols = [], []
    for c in range(n // k):
        r = rng.integers(c * k, (c + 1) * k, 2000)
        s = rng.integers(c * k, (c + 1) * k, 2000)
        rows.append(r)
        cols.append(s)
    rows.append(rng.integers(0, n, 300))
    cols.append(rng.integers(0, n, 300))
    rows, cols = np.concatenate(rows), np.concatenate(cols)
    keys = np.unique(rows * n + cols)
    rows, cols = keys // n, keys % n
    from flex_tpu.sparse.csr import CSRGraph

    g = CSRGraph.from_coo(rows, cols, np.ones(len(rows), np.float32), n)
    perm = order_rabbit(g)
    # Vertices of the same planted block should end up contiguous-ish:
    # community of a new index = planted block of the old vertex.
    planted = perm // k
    # Compare modularity of contiguous 64-chunks under rabbit order vs random.
    chunks = np.arange(n) // k
    inv = invert_permutation(perm)
    q_rabbit = modularity(g, chunks[inv])  # community by rabbit position
    q_random = modularity(g, (np.arange(n) * 7919 % (n // k)))
    assert q_rabbit > q_random + 0.2, (q_rabbit, q_random)
    del planted


def test_pubmed_orderings_smoke(pubmed):
    # Gorder/rabbit are Python fallbacks; pubmed-scale must stay tractable.
    for method in ("deg", "rcm", "dfs"):
        perm = compute_order(pubmed, method)
        invert_permutation(perm)
