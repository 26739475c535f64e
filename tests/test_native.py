import numpy as np
import pytest

from flex_tpu.io.synth import rmat_graph
from flex_tpu.reorder import native
from flex_tpu.reorder.dfs import order_dfs
from flex_tpu.reorder.gorder import order_gorder
from flex_tpu.reorder.rabbit import order_rabbit
from flex_tpu.sparse.perm import invert_permutation

needs_native = pytest.mark.skipif(not native.available(), reason="no g++ toolchain")


@needs_native
def test_dfs_native_matches_python(a_mat, small_rmat):
    for g in (a_mat, small_rmat):
        np.testing.assert_array_equal(
            order_dfs(g, use_native=True), order_dfs(g, use_native=False)
        )


@needs_native
def test_gorder_native_matches_python(a_mat):
    # The greedy loop breaks priority ties by heap order, which differs
    # between the two lazy-heap implementations only when keys tie; on the
    # small hand-check matrix require identical results.
    got_n = order_gorder(a_mat, use_native=True)
    got_p = order_gorder(a_mat, use_native=False)
    invert_permutation(got_n)
    invert_permutation(got_p)
    np.testing.assert_array_equal(got_n, got_p)


@needs_native
def test_gorder_native_bijection(small_rmat):
    invert_permutation(order_gorder(small_rmat, use_native=True))


@needs_native
def test_rabbit_native_matches_python(a_mat, small_rmat):
    for g in (a_mat, small_rmat):
        got_n = order_rabbit(g, use_native=True)
        got_p = order_rabbit(g, use_native=False)
        np.testing.assert_array_equal(got_n, got_p)


def test_gorder_native_matches_python_multigraph():
    """Duplicate (row, col) edges: the relabeled adjacency is deduped so
    the native sorted-list merges and the Python set() semantics see the
    identical simple graph (they diverged on multigraphs before)."""
    import numpy as np

    from flex_tpu.sparse.csr import CSRGraph

    rng = np.random.default_rng(11)
    m = 120
    rows = rng.integers(0, m, 1200)
    cols = rng.integers(0, m, 1200)
    rows = np.concatenate([rows, rows[:400]])  # forced duplicates
    cols = np.concatenate([cols, cols[:400]])
    vals = np.ones(len(rows), np.float32)
    g = CSRGraph.from_coo(rows, cols, vals, m, name="multi")
    got_n = order_gorder(g, use_native=True)
    got_p = order_gorder(g, use_native=False)
    np.testing.assert_array_equal(got_n, got_p)
