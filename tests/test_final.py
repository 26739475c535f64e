import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_cli_sweep_smoke(capsys, tmp_path):
    from flex_tpu.cli import main

    csv = tmp_path / "sweep.csv"
    rc = main(["/root/reference/data/a_mat.csv", "8", "--method=sweep",
               "--iters=1", f"--csv={csv}"])
    assert rc == 0
    out = capsys.readouterr().out
    # 4 orders x 3 methods attempted; ovo rows must really be OVO
    assert " OVO " in out and " DEG " in out
    assert csv.exists()


def test_autotune_measured(small_rmat):
    from flex_tpu.bench.autotune import autotune

    results = autotune(small_rmat, k=8, methods=("ell", "xla"), iters=1)
    assert len(results) == 2
    assert results[0].t_elap <= results[1].t_elap


def test_cli_order_file(capsys, tmp_path):
    """--order-file persists the ordering on first run and reloads it on
    the second (reference inout.cu:20-37)."""
    from flex_tpu.cli import main

    of = tmp_path / "ord.npy"
    rc = main(["/root/reference/data/a_mat.csv", "8", "--order=rcm",
               "--method=ell", "--iters=1", f"--order-file={of}"])
    assert rc == 0
    assert of.exists()
    out1 = capsys.readouterr().out
    assert "saved ordering" in out1
    rc = main(["/root/reference/data/a_mat.csv", "8", "--order=rcm",
               "--method=ell", "--iters=1", f"--order-file={of}"])
    assert rc == 0
    assert "loading ordering" in capsys.readouterr().out


def test_order_io_roundtrip(tmp_path, a_mat):
    from flex_tpu.reorder import compute_order
    from flex_tpu.reorder.inout import load_order, save_order

    perm = compute_order(a_mat, "rcm")
    save_order(perm, str(tmp_path / "ord"))
    got = load_order(str(tmp_path / "ord"))
    np.testing.assert_array_equal(got, perm)

    # corrupted (negative) order must be rejected on load
    bad = perm.copy()
    bad[0] = -2
    save_order(bad, str(tmp_path / "bad"))
    with pytest.raises(ValueError):
        load_order(str(tmp_path / "bad"))


def test_2d_train_odd_classes(small_rmat):
    """pubmed-style odd class count with a 2D mesh (bias can't shard)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    import optax
    from jax.sharding import Mesh

    from flex_tpu.io import make_features
    from flex_tpu.models import GCN
    from flex_tpu.parallel import prepare_ell_sharded
    from flex_tpu.parallel.gcn_sharded import make_train_step_2d, shard_params_2d

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    plan = prepare_ell_sharded(small_rmat, mesh, axis="x")
    model = GCN(d_in=8, d_hidden=8, n_classes=3, nnz=small_rmat.nnz)
    params = shard_params_2d(model.init(jax.random.PRNGKey(0)), mesh)
    opt = optax.sgd(1e-2)
    step = make_train_step_2d(model, plan, opt, mesh)
    rng = np.random.default_rng(0)
    X = jnp.asarray(make_features(small_rmat, 8))
    y = jnp.asarray(rng.integers(0, 3, small_rmat.m).astype(np.int32))
    mask = jnp.ones((small_rmat.m,), jnp.float32)
    _, _, loss = step(params, opt.init(params), X, y, mask)
    assert np.isfinite(float(loss))


def test_band_plan_pytree_roundtrip():
    from flex_tpu.io.synth import banded_graph
    from flex_tpu.ops.pallas_band import prepare_band

    g = banded_graph(512, 48, 8.0, seed=9)
    plan = prepare_band(g, tm=128, min_density=0.0)
    leaves, treedef = jax.tree_util.tree_flatten(plan)
    plan2 = jax.tree_util.tree_unflatten(treedef, leaves)
    B = jnp.ones((g.n, 8), jnp.float32)
    np.testing.assert_array_equal(np.asarray(plan(B)), np.asarray(plan2(B)))
