import numpy as np
import jax
import jax.numpy as jnp
import optax

from flex_tpu.io import make_features
from flex_tpu.models import GraphSAGE, make_sage_train_step
from flex_tpu.ops.ell_spmm import prepare_ell


def test_sage_forward_matches_scipy(small_rmat):
    g = small_rmat
    plan = prepare_ell(g)
    model = GraphSAGE(d_in=16, d_hidden=8, n_classes=4, nnz=g.nnz)
    params = model.init(jax.random.PRNGKey(0))
    X = make_features(g, 16)
    got = np.asarray(model.apply(params, plan, jnp.asarray(X)))

    A = g.to_scipy()
    p = {k: np.asarray(v) for k, v in params.items()}
    h = np.maximum(X @ p["Ws1"] + (A @ X) @ p["Wn1"] + p["b1"], 0.0)
    want = h @ p["Ws2"] + (A @ h) @ p["Wn2"] + p["b2"]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sage_training_reduces_loss(small_rmat):
    g = small_rmat
    plan = prepare_ell(g)
    rng = np.random.default_rng(0)
    model = GraphSAGE(d_in=16, d_hidden=32, n_classes=4, nnz=g.nnz)
    params = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(make_features(g, 16))
    y = jnp.asarray(rng.integers(0, 4, g.m).astype(np.int32))
    mask = jnp.ones((g.m,), jnp.float32)

    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = make_sage_train_step(model, plan, opt)
    losses = []
    for _ in range(8):
        params, state, loss = step(params, state, X, y, mask)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
