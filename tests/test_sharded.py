import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flex_tpu.io import make_features
from flex_tpu.io.synth import rmat_graph
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.parallel import make_mesh, prepare_ell_sharded
from flex_tpu.utils.check import res_check

needs_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_8dev
@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_matches_scipy(small_rmat, n_dev):
    mesh = make_mesh(n_dev)
    plan = prepare_ell_sharded(small_rmat, mesh)
    B = make_features(small_rmat, 16)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(small_rmat, B), C, small_rmat.degrees)
    assert chk.ok, f"{n_dev} devices: {chk}"


@needs_8dev
@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_allgather_b(small_rmat, n_dev):
    """b_layout="gathered": B column-sharded, reassembled per-chip by one
    all_gather over the mesh axis (spmm_sharded module docstring's
    crossover model); must match both SciPy and the replicated-B path."""
    mesh = make_mesh(n_dev)
    plan = prepare_ell_sharded(small_rmat, mesh, b_layout="gathered")
    assert plan.stats["b_layout"] == "gathered"
    k = 16
    B = make_features(small_rmat, k)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(small_rmat, B), C, small_rmat.degrees)
    assert chk.ok, f"{n_dev} devices: {chk}"

    rep = prepare_ell_sharded(small_rmat, mesh)
    np.testing.assert_allclose(C, np.asarray(rep(jnp.asarray(B))), rtol=1e-6)
    assert plan.ici_bytes_per_call(small_rmat.n, k) > 0
    assert rep.ici_bytes_per_call(small_rmat.n, k) == 0


@needs_8dev
@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_windowed_matches_scipy(n_dev):
    """Row-sharded windowed hybrid (dense windows under shard_map + the
    global residue on the sharded ELL path) matches SciPy and the
    single-chip windowed plan."""
    from flex_tpu.io.synth import community_graph
    from flex_tpu.ops.window_spmm import prepare_windowed
    from flex_tpu.parallel import prepare_windowed_sharded
    from flex_tpu.reorder import reorder

    g = reorder(community_graph(4000, 300_000, n_comm=4, seed=8), "rbdeg",
                check=False)
    mesh = make_mesh(n_dev)
    plan = prepare_windowed_sharded(g, mesh, tm=256, W=128, min_count=16)
    assert plan.stats["n_shards"] == n_dev
    B = make_features(g, 16)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, f"{n_dev} devices: {chk} stats={plan.stats}"

    local = prepare_windowed(g, tm=256, W=128, min_count=16)
    np.testing.assert_allclose(C, np.asarray(local(jnp.asarray(B))),
                               rtol=1e-5, atol=1e-5)

    # registered pytree: flatten/unflatten roundtrip stays callable
    leaves, treedef = jax.tree_util.tree_flatten(plan)
    plan2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(C, np.asarray(plan2(jnp.asarray(B))),
                               rtol=1e-6)


def test_sharded_windowed_builds_from_resident_device_csr():
    """The sharded windowed build must never touch host nnz-sized arrays
    (VERDICT r02 item 8): it gets a graph HANDLE carrying only O(m) host
    metadata (no .col/.vals at all) plus the resident DeviceCSR, and must
    still build a correct plan — device slices + device residue only."""
    from types import SimpleNamespace

    from flex_tpu.io.synth import community_graph
    from flex_tpu.parallel import prepare_windowed_sharded
    from flex_tpu.reorder import reorder
    from flex_tpu.sparse.device import DeviceCSR

    g = reorder(community_graph(4000, 300_000, n_comm=4, seed=8), "rbdeg",
                check=False)
    dev = DeviceCSR.from_graph(g)
    handle = SimpleNamespace(m=g.m, n=g.n, nnz=g.nnz, row_ptr=g.row_ptr,
                             degrees=g.degrees)
    mesh = make_mesh(4)
    plan = prepare_windowed_sharded(handle, mesh, tm=256, W=128,
                                    min_count=16, dev=dev)
    B = make_features(g, 16)
    chk = res_check(spmm_scipy(g, B), np.asarray(plan(jnp.asarray(B))),
                    g.degrees)
    assert chk.ok, f"{chk} stats={plan.stats}"
    assert "res_imbalance" in plan.stats


def test_sharded_windowed_host_hist_fallback(monkeypatch):
    """With the host-bincount histogram forced (the amazon-scale path —
    the per-shard device hist D2H is ~75 MB through the relay there),
    the sharded build still matches SciPy: each shard's zero-copy host
    col/degrees views must line up with its device CSR slice."""
    import flex_tpu.ops.window_spmm as wsp
    from flex_tpu.io.synth import community_graph
    from flex_tpu.parallel import prepare_windowed_sharded
    from flex_tpu.reorder import reorder

    g = reorder(community_graph(4000, 300_000, n_comm=4, seed=8), "rbdeg",
                check=False)
    mesh = make_mesh(4)
    monkeypatch.setattr(wsp, "_HIST_D2H_MAX_BYTES", 0)
    plan = prepare_windowed_sharded(g, mesh, tm=256, W=128, min_count=16)
    B = make_features(g, 16)
    chk = res_check(spmm_scipy(g, B), np.asarray(plan(jnp.asarray(B))),
                    g.degrees)
    assert chk.ok, f"{chk} stats={plan.stats}"


@needs_8dev
def test_sharded_windowed_refuses_scattered():
    from flex_tpu.io.synth import uniform_graph
    from flex_tpu.parallel import prepare_windowed_sharded

    # ~1 nnz per (256,128) block: no window clears min_count anywhere
    g = uniform_graph(100_000, 300_000, seed=1)
    mesh = make_mesh(2)
    with pytest.raises(ValueError):
        prepare_windowed_sharded(g, mesh, min_count=64)


@needs_8dev
def test_sharded_pubmed(pubmed):
    mesh = make_mesh(8)
    plan = prepare_ell_sharded(pubmed, mesh)
    B = make_features(pubmed, 32)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(pubmed, B), C, pubmed.degrees)
    assert chk.ok, chk


@needs_8dev
def test_sharded_balance(small_rmat):
    mesh = make_mesh(8)
    plan = prepare_ell_sharded(small_rmat, mesh)
    nnz_per = [
        int(small_rmat.row_ptr[r1] - small_rmat.row_ptr[r0])
        for r0, r1 in plan.row_bounds
    ]
    avg = small_rmat.nnz / 8
    assert max(nnz_per) < 2.2 * avg, nnz_per  # static nnz balance


@needs_8dev
def test_sharded_grad_flows(small_rmat):
    """Autodiff through the sharded SpMM (needed by the GCN train step)."""
    mesh = make_mesh(4)
    plan = prepare_ell_sharded(small_rmat, mesh)
    B = jnp.asarray(make_features(small_rmat, 8))

    def loss(b):
        return (plan(b) ** 2).sum()

    g = jax.grad(loss)(B)
    assert g.shape == B.shape
    # analytic: d/dB sum((A·B)²) = 2·Aᵀ·(A·B)
    A = small_rmat.to_scipy()
    want = 2.0 * (A.T @ (A @ np.asarray(B)))
    np.testing.assert_allclose(np.asarray(g), want, rtol=2e-4, atol=2e-3)


@needs_8dev
def test_sharded_windowed_budgeted_per_shard():
    """max_dense_bytes is a per-shard (per-chip HBM) budget: each shard's
    selection coarsens to fit instead of the build refusing, and the
    sharded result still matches SciPy (the single-chip budgeted
    selection composed with the row-sharded path — the amazon-scale
    multi-chip story)."""
    from flex_tpu.io.synth import community_graph
    from flex_tpu.parallel import prepare_windowed_sharded
    from flex_tpu.reorder import reorder

    g = reorder(community_graph(4000, 300_000, n_comm=4, seed=8), "rbdeg",
                check=False)
    mesh = make_mesh(4)
    free = prepare_windowed_sharded(g, mesh, tm=256, W=128, min_count=16)
    budget = max(b for b, _, _ in free.shard_sel) // 2
    plan = prepare_windowed_sharded(g, mesh, tm=256, W=128, min_count=16,
                                    max_dense_bytes=budget)
    assert all(b <= budget for b, _, _ in plan.shard_sel)
    assert any(mc > 16 for _, mc, _ in plan.shard_sel)
    assert plan.stats["min_count_eff"] > 16
    assert plan.stats["coverage"] < free.stats["coverage"]
    B = make_features(g, 16)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, f"{chk} stats={plan.stats}"
