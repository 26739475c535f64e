"""Dynamic-value SpMM (ops/dyn_ell.py) + GAT model (models/gat.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from flex_tpu.io import make_features
from flex_tpu.models import GAT, make_gat_train_step, prepare_attention
from flex_tpu.models.gat import edge_softmax, gat_head
from flex_tpu.ops.dyn_ell import prepare_dyn_ell, spmm_dyn


def test_dyn_ell_matches_scipy(small_rmat):
    g = small_rmat
    rng = np.random.default_rng(0)
    vals = rng.standard_normal(g.nnz).astype(np.float32)
    B = make_features(g, 24)
    got = np.asarray(spmm_dyn(g, vals, B))
    A = g.to_scipy().copy()
    A.data = vals.astype(np.float64)
    want = A @ B.astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_dyn_ell_split_rows(a_mat):
    """Rows wider than the last bucket must split into chunks; use a tiny
    width ladder to force splitting on the hand-check matrix."""
    g = a_mat
    plan = prepare_dyn_ell(g, widths=(2, 4))
    rng = np.random.default_rng(1)
    vals = rng.standard_normal(g.nnz).astype(np.float32)
    B = make_features(g, 8)
    got = np.asarray(plan(jnp.asarray(vals), jnp.asarray(B)))
    A = g.to_scipy().copy()
    A.data = vals.astype(np.float64)
    np.testing.assert_allclose(got, A @ B.astype(np.float64),
                               rtol=2e-5, atol=2e-5)


def test_dyn_ell_vals_gradient(small_rmat):
    """d/d vals of sum(A(vals)·B ⊙ G) is analytically B[col_e]·G[row_e]
    per edge — the gather chain must transpose correctly."""
    g = small_rmat
    plan = prepare_dyn_ell(g)
    rng = np.random.default_rng(2)
    vals = jnp.asarray(rng.standard_normal(g.nnz).astype(np.float32))
    B = jnp.asarray(make_features(g, 8))
    Gw = jnp.asarray(rng.standard_normal((g.m, 8)).astype(np.float32))

    grad = jax.grad(lambda v: (plan(v, B) * Gw).sum())(vals)
    rows = np.repeat(np.arange(g.m), g.degrees)
    want = (np.asarray(B)[g.col] * np.asarray(Gw)[rows]).sum(axis=1)
    np.testing.assert_allclose(np.asarray(grad), want, rtol=2e-4, atol=2e-4)


def test_edge_softmax_rows_sum_to_one(small_rmat):
    g = small_rmat
    ag = prepare_attention(g)
    rng = np.random.default_rng(3)
    e = jnp.asarray(rng.standard_normal(g.nnz).astype(np.float32) * 5)
    alpha = np.asarray(edge_softmax(ag, e))
    assert (alpha > 0).all()
    rows = np.repeat(np.arange(g.m), g.degrees)
    sums = np.bincount(rows, weights=alpha.astype(np.float64), minlength=g.m)
    nonempty = g.degrees > 0
    np.testing.assert_allclose(sums[nonempty], 1.0, rtol=1e-5)


def test_gat_head_matches_numpy(small_rmat):
    g = small_rmat
    ag = prepare_attention(g)
    rng = np.random.default_rng(4)
    H = rng.standard_normal((g.m, 12)).astype(np.float32)
    W = rng.standard_normal((12, 6)).astype(np.float32) * 0.3
    a_s = rng.standard_normal(6).astype(np.float32)
    a_d = rng.standard_normal(6).astype(np.float32)
    got = np.asarray(gat_head(ag, jnp.asarray(H), jnp.asarray(W),
                              jnp.asarray(a_s), jnp.asarray(a_d)))

    Hw = (H @ W).astype(np.float64)
    rows = np.repeat(np.arange(g.m), g.degrees)
    e = Hw[rows] @ a_s + Hw[g.col] @ a_d
    e = np.where(e > 0, e, 0.2 * e)  # leaky_relu
    alpha = np.zeros(g.nnz)
    for r in np.unique(rows):
        sel = rows == r
        ex = np.exp(e[sel] - e[sel].max())
        alpha[sel] = ex / ex.sum()
    A = g.to_scipy().copy()
    A.data = alpha
    want = A @ Hw
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gat_training_reduces_loss(small_rmat):
    # GAT attends over N(i) ∪ {i} (paper convention): add self-loops so a
    # node's own features reach its prediction through alpha_ii
    import scipy.sparse as sp

    from flex_tpu.sparse.csr import CSRGraph

    A = (small_rmat.to_scipy() + sp.eye(small_rmat.m, format="csr")).tocsr()
    A.sort_indices()
    g = CSRGraph.from_arrays(A.indptr.astype(np.int64),
                             A.indices.astype(np.int64),
                             A.data.astype(np.float32), name="rmat_sl")
    ag = prepare_attention(g)
    rng = np.random.default_rng(5)
    model = GAT(d_in=16, d_hidden=16, n_classes=4, n_heads=2)
    params = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(make_features(g, 16))
    y = jnp.asarray(rng.integers(0, 4, g.m).astype(np.int32))
    # semi-supervised convention: a small labelled set (memorizing all
    # 2048 random labels with a tiny model is out of its capacity)
    mask = jnp.zeros((g.m,), jnp.float32).at[:256].set(1.0)

    opt = optax.adam(5e-2)
    state = opt.init(params)
    step = make_gat_train_step(model, ag, opt)
    losses = []
    for _ in range(40):
        params, state, loss = step(params, state, X, y, mask)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.85, losses


def test_gat_apply_shape(a_mat):
    g = a_mat
    ag = prepare_attention(g)
    model = GAT(d_in=8, d_hidden=4, n_classes=3, n_heads=3)
    params = model.init(jax.random.PRNGKey(1))
    out = model.apply(params, ag, jnp.asarray(make_features(g, 8)))
    assert out.shape == (g.m, 3)
    assert np.isfinite(np.asarray(out)).all()
