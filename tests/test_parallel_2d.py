import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import Mesh

from flex_tpu.io import make_features
from flex_tpu.models import GCN, gcn_loss
from flex_tpu.ops.ell_spmm import prepare_ell
from flex_tpu.parallel import prepare_ell_sharded
from flex_tpu.parallel.gcn_sharded import make_train_step_2d, shard_params_2d

needs_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_8dev
def test_2d_train_step_matches_local(small_rmat):
    g = small_rmat
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("x", "y"))
    plan2d = prepare_ell_sharded(g, mesh, axis="x")
    plan_local = prepare_ell(g)

    model = GCN(d_in=16, d_hidden=8, n_classes=4, nnz=g.nnz)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    X = jnp.asarray(make_features(g, 16))
    y = jnp.asarray(rng.integers(0, 4, g.m).astype(np.int32))
    mask = jnp.ones((g.m,), jnp.float32)

    opt = optax.sgd(1e-2)
    step = make_train_step_2d(model, plan2d, opt, mesh)
    p1, _, loss_2d = step(params, opt.init(params), X, y, mask)

    # reference: plain local loss/grad step
    loss_ref = float(gcn_loss(model, params, plan_local, X, y, mask))
    assert np.isclose(float(loss_2d), loss_ref, rtol=1e-4), (loss_2d, loss_ref)
    # one step moved the params
    assert not np.allclose(np.asarray(p1["W1"]), np.asarray(params["W1"]))


@needs_8dev
def test_shard_params_2d(small_rmat):
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("x", "y"))
    model = GCN(d_in=8, d_hidden=8, n_classes=4, nnz=small_rmat.nnz)
    params = shard_params_2d(model.init(jax.random.PRNGKey(0)), mesh)
    shard_shapes = {
        k: v.sharding.shard_shape(v.shape) for k, v in params.items()
    }
    assert shard_shapes["W1"][1] == 4  # 8 cols over y=2
