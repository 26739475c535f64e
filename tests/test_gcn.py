import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from flex_tpu.io import make_features
from flex_tpu.models import GCN, gcn_loss, make_train_step
from flex_tpu.ops.ell_spmm import prepare_ell
from flex_tpu.ops.gcn import gcn_layer, pick_association


def test_pick_association():
    # c << d: A(XW) cheaper; d << c: (AX)W cheaper
    assert pick_association(m=1000, nnz=50_000, d=512, c=8) == "axw"
    assert pick_association(m=1000, nnz=50_000, d=8, c=512) == "ax_w"


def test_gcn_layer_associations_agree(small_rmat):
    plan = prepare_ell(small_rmat)
    X = jnp.asarray(make_features(small_rmat, 16))
    W = jnp.asarray(np.random.default_rng(0).standard_normal((16, 8)), jnp.float32)
    h1 = gcn_layer(plan, X, W, association="axw")
    h2 = gcn_layer(plan, X, W, association="ax_w")
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=5e-4, atol=5e-4)


def test_gcn_layer_matches_scipy(small_rmat):
    plan = prepare_ell(small_rmat)
    X = make_features(small_rmat, 16)
    W = np.random.default_rng(1).standard_normal((16, 8)).astype(np.float32)
    got = np.asarray(gcn_layer(plan, jnp.asarray(X), jnp.asarray(W),
                               association="ax_w"))
    A = small_rmat.to_scipy()
    want = np.maximum(A @ X @ W, 0.0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gcn_training_reduces_loss(small_rmat):
    g = small_rmat
    plan = prepare_ell(g)
    rng = np.random.default_rng(0)
    model = GCN(d_in=16, d_hidden=32, n_classes=4, nnz=g.nnz)
    params = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(make_features(g, 16))
    y = jnp.asarray(rng.integers(0, 4, g.m).astype(np.int32))
    mask = jnp.ones((g.m,), jnp.float32)

    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = make_train_step(model, plan, opt)
    loss0 = float(gcn_loss(model, params, plan, X, y, mask))
    for _ in range(20):
        params, state, loss = step(params, state, X, y, mask)
    assert float(loss) < loss0, (float(loss), loss0)


def test_gcn_training_on_windowed_plan():
    """The headline windowed plan trains a GCN end-to-end: the Pallas
    forward's custom VJP makes Â differentiable w.r.t. features."""
    from flex_tpu.io.synth import community_graph
    from flex_tpu.ops.window_spmm import prepare_windowed
    from flex_tpu.reorder import reorder

    g = reorder(community_graph(1500, 100_000, n_comm=3, seed=4), "rbdeg",
                check=False)
    plan = prepare_windowed(g, tm=256, W=128, J=8, min_count=8)
    rng = np.random.default_rng(0)
    model = GCN(d_in=8, d_hidden=16, n_classes=3, nnz=g.nnz)
    params = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(make_features(g, 8))
    y = jnp.asarray(rng.integers(0, 3, g.m).astype(np.int32))
    mask = jnp.ones((g.m,), jnp.float32)

    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = make_train_step(model, plan, opt)
    loss0 = float(gcn_loss(model, params, plan, X, y, mask))
    for _ in range(10):
        params, state, loss = step(params, state, X, y, mask)
    assert float(loss) < loss0, (float(loss), loss0)


def test_gcn_sharded_plan(small_rmat):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from flex_tpu.parallel import make_mesh, prepare_ell_sharded

    mesh = make_mesh(4)
    plan_s = prepare_ell_sharded(small_rmat, mesh)
    plan_l = prepare_ell(small_rmat)
    model = GCN(d_in=8, d_hidden=8, n_classes=3, nnz=small_rmat.nnz)
    params = model.init(jax.random.PRNGKey(1))
    X = jnp.asarray(make_features(small_rmat, 8))
    z_s = np.asarray(model.apply(params, plan_s, X))
    z_l = np.asarray(model.apply(params, plan_l, X))
    np.testing.assert_allclose(z_s, z_l, rtol=5e-4, atol=5e-4)
