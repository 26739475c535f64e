"""Regression tests for code-review findings (round 1)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flex_tpu.io import make_features
from flex_tpu.ops.ell_spmm import prepare_ell
from flex_tpu.ops.panel_spmm import prepare_panel
from flex_tpu.ops.pallas_band import prepare_band
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.utils.check import res_check


def test_band_sums_duplicate_entries():
    # duplicate (row, col) CSR entries must sum, like scipy / every kernel
    row_ptr = np.array([0, 2, 3, 4, 4])
    col = np.array([1, 1, 0, 2])
    vals = np.array([1.0, 2.0, 5.0, 7.0], np.float32)
    g = CSRGraph.from_arrays(row_ptr, col, vals)
    B = make_features(g, 8)
    plan = prepare_band(g, tm=8, min_density=0.0)
    C = np.asarray(plan(jnp.asarray(B)))
    np.testing.assert_allclose(C, spmm_scipy(g, B), rtol=1e-5, atol=1e-5)


def test_panel_zero_nnz_tail_shape():
    # hub rows hold all nnz; trailing zero-degree rows must still be emitted
    row_ptr = np.array([0, 4, 8, 8, 8, 8])
    col = np.array([0, 1, 2, 3, 0, 1, 2, 4])
    vals = np.arange(1, 9, dtype=np.float32)
    g = CSRGraph.from_arrays(row_ptr, col, vals)
    B = make_features(g, 4)
    plan = prepare_panel(g, tm=8, hub_threshold=2)
    C = np.asarray(plan(jnp.asarray(B)))
    assert C.shape == (5, 4)
    np.testing.assert_allclose(C, spmm_scipy(g, B), rtol=1e-5, atol=1e-5)


def test_ell_zero_nnz_graph():
    g = CSRGraph.from_arrays(np.zeros(5, np.int64), np.zeros(0), np.zeros(0))
    plan = prepare_ell(g)
    C = np.asarray(plan(jnp.ones((4, 8), jnp.float32)))
    assert C.shape == (4, 8)
    assert np.all(C == 0)


def test_panel_validate_detects_corruption(a_mat):
    from flex_tpu.tiling.panels import build_panels

    pf = build_panels(a_mat, tm=16)
    pf.validate(a_mat)  # clean passes
    pf.e_val[0, 0] += 99.0
    with pytest.raises(AssertionError):
        pf.validate(a_mat)


def test_suggest_band_respects_max_span():
    # one wide-span row must disqualify the band format
    from flex_tpu.bench.autotune import suggest
    from flex_tpu.io.synth import banded_graph

    g = banded_graph(20000, 64, 16.0, seed=1)
    rows = np.repeat(np.arange(g.m, dtype=np.int64), g.degrees)
    # splice an edge to the last column into row 0
    col = g.col.copy()
    col[0] = g.n - 1
    g2 = CSRGraph.from_coo(rows, col, g.vals, g.m)
    s = suggest(g2)
    assert s.method != "band", s


def test_spmm_unknown_method_bsr_removed(a_mat):
    import flex_tpu

    with pytest.raises(ValueError):
        flex_tpu.spmm(a_mat, jnp.ones((a_mat.n, 4)), method="bsr")


def test_plan_as_jit_argument(small_rmat):
    # plans are pytrees: jit must accept them as arguments
    plan = prepare_ell(small_rmat)
    B = jnp.asarray(make_features(small_rmat, 8))

    @jax.jit
    def f(pl, b):
        return pl(b)

    C = np.asarray(f(plan, B))
    chk = res_check(spmm_scipy(small_rmat, make_features(small_rmat, 8)), C,
                    small_rmat.degrees)
    assert chk.ok, chk
