import numpy as np
import pytest

from flex_tpu.bench.gcn_bench import bench_gcn_layer
from flex_tpu.tiling.stats import data_volume_est, tile_stats
from flex_tpu.utils.trace import StageTimer


def test_gcn_bench_cross_check(small_rmat):
    r = bench_gcn_layer(small_rmat, d=16, c=8, iters=2)
    assert r.cross_err_frac < 1e-4, r
    assert r.scipy_err_frac < 1e-4, r
    assert r.auto_choice in ("axw", "ax_w")
    gf = r.gflops(small_rmat.nnz, small_rmat.m)
    assert gf["axw"] > 0 and gf["ax_w"] > 0


def test_tile_stats_sanity(pubmed):
    st = tile_stats(pubmed, bm=8)
    assert st.nnz == pubmed.nnz
    assert 0 < st.occupancy <= 1
    assert st.flop_inflation >= 1
    assert st.panel_nnz_imbalance >= 0
    dv = data_volume_est(pubmed, 32, "xla")
    dv2 = data_volume_est(pubmed, 32, "ideal")
    assert dv["bytes"] > dv2["bytes"]


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a" in rep and "total" in rep


def test_traffic_model_columns(small_rmat):
    """Every measured bench row carries the byte-model analytics (the
    reference's NPerf-joined report columns, flex.cu:5505-5688)."""
    from flex_tpu.bench.harness import bench_spmm

    for method in ("ell", "xla"):
        r = bench_spmm(small_rmat, 8, method=method, iters=1, check=False)
        row = r.row()
        assert row["model_gb"] > 0
        assert row["ai_model"] > 0
        assert row["hbm_frac"] > 0
        assert row["b_reuse"] > 0
    # ELL gathers per-nnz (padded): reuse ≤ 1; xla gathers exactly nnz-ish
    assert r.extra["b_reuse"] <= 1.0
    # format stats become report columns (stats_collect analog)
    r = bench_spmm(small_rmat, 8, method="ell", iters=1, check=False)
    assert r.extra["fmt_pad_ratio"] >= 1.0


def test_trace_context(tmp_path, small_rmat):
    """utils.trace.trace() wired through bench_spmm --trace produces a
    profiler trace directory (works on CPU too)."""
    import os

    from flex_tpu.bench.harness import bench_spmm

    td = str(tmp_path / "trace")
    r = bench_spmm(small_rmat, 8, method="ell", iters=1, check=False,
                   trace_dir=td)
    assert r.extra["trace_dir"] == td
    found = [os.path.join(dp, f) for dp, _, fs in os.walk(td) for f in fs]
    assert found, "trace directory is empty"


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from flex_tpu.models.checkpoint import restore_checkpoint, save_checkpoint

    params = {"W": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    save_checkpoint(str(tmp_path / "ck"), params, step=7)
    got = restore_checkpoint(str(tmp_path / "ck"))
    assert got["step"] == 7
    np.testing.assert_array_equal(np.asarray(got["params"]["W"]), np.ones((4, 4)))


def test_checkpoint_resume_optimizer(tmp_path):
    """Regression (round-1 advisor, medium): restoring opt_state without a
    target pytree loses optax namedtuple types and update() fails on resume."""
    import jax
    import jax.numpy as jnp
    import optax

    from flex_tpu.models.checkpoint import restore_checkpoint, save_checkpoint

    params = {"W": jnp.ones((4, 4))}
    opt = optax.adam(1e-2)
    state = opt.init(params)
    grads = {"W": jnp.full((4, 4), 0.5)}
    updates, state = opt.update(grads, state, params)
    save_checkpoint(str(tmp_path / "ck"), params, opt_state=state, step=3)

    target = {"params": params, "opt_state": opt.init(params), "step": 0}
    got = restore_checkpoint(str(tmp_path / "ck"), target=target)
    assert got["step"] == 3
    # The restored opt_state must be directly usable by the optimizer.
    updates2, _ = opt.update(grads, got["opt_state"], got["params"])
    assert jax.tree_util.tree_structure(updates2) == jax.tree_util.tree_structure(grads)


def test_chain_timing_columns(small_rmat):
    """Small-graph rows carry the serial-chain ground truth (the
    dispatched average is relay transport at this scale —
    docs/measurements.md round-4 small-graph breakdown)."""
    from flex_tpu.bench.harness import bench_spmm

    r = bench_spmm(small_rmat, 16, method="ell", iters=2)
    assert "t_chain_us" in r.extra, r.extra
    assert r.extra["gflops_chain"] > 0
    # non-square pad branch: transpose-free check via a rectangular slice
    r2 = bench_spmm(small_rmat, 16, method="ell", iters=2, chain=False)
    assert "t_chain_us" not in r2.extra
