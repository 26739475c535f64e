"""Duplicate (row, col) entries must SUM consistently in every kernel
(the reference's perm_apply keeps duplicates and cuSPARSE sums them;
scipy csr_matrix sums them on construction)."""
import numpy as np
import jax.numpy as jnp
import pytest

import flex_tpu
from flex_tpu.io import make_features
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.utils.check import res_check


@pytest.fixture(scope="module")
def dup_graph():
    rng = np.random.default_rng(0)
    m = 700
    rows = rng.integers(0, m, 8_000)
    cols = rng.integers(0, m, 8_000)
    # force duplicates: repeat a third of the entries (CSR keeps both)
    rows = np.concatenate([rows, rows[:3000]])
    cols = np.concatenate([cols, cols[:3000]])
    vals = (2 * rng.random(len(rows)) - 1).astype(np.float32)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    row_ptr = np.zeros(m + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=m), out=row_ptr[1:])
    return CSRGraph.from_arrays(row_ptr, cols, vals, name="dups")


@pytest.mark.parametrize("method,kw", [
    ("xla", {}),
    ("ell", {}),
    ("gespmm", {"w": 8}),
    ("windowed", {"tm": 256, "W": 128, "J": 8, "min_count": 1,
                  "min_coverage": 0.0}),
])
def test_duplicate_entries_sum(dup_graph, method, kw):
    g = dup_graph
    B = make_features(g, 8)
    C = np.asarray(flex_tpu.spmm(g, jnp.asarray(B), method=method, **kw))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, f"{method}: {chk}"


def test_unique_rc_detection(dup_graph, small_rmat):
    """window_select's host pass must flag duplicate patterns (keeps the
    summing .add scatter) and prove uniqueness otherwise (unlocks .set)."""
    from flex_tpu.ops.window_spmm import window_select

    sel_dup = window_select(dup_graph, tm=256, W=128, min_count=1)
    assert sel_dup["unique_rc"] is False

    sel_uni = window_select(small_rmat, tm=256, W=128, min_count=1)
    assert sel_uni["unique_rc"] is True

    # unsorted columns within a row -> conservative False even if unique
    rp = np.full(17, 3, np.int64)  # 16 rows; all 3 nnz in row 0
    rp[0] = 0
    g = CSRGraph.from_arrays(
        rp, np.array([5, 2, 9], np.int64), np.ones(3, np.float32),
        name="unsorted")
    assert g.m == 16
    assert window_select(g, tm=8, W=8, min_count=1)["unique_rc"] is False
