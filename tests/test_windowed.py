import numpy as np
import jax.numpy as jnp
import pytest

from flex_tpu.io import make_features
from flex_tpu.io.synth import community_graph, bipartite_projection_graph, uniform_graph
from flex_tpu.ops.window_spmm import prepare_windowed, window_select
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.reorder import reorder
from flex_tpu.utils.check import res_check


def _check(g, impl, **kw):
    B = make_features(g, 16)
    plan = prepare_windowed(g, impl=impl, **kw)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, f"{impl}: {chk} stats={plan.stats}"
    return plan


@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_windowed_matches_scipy(impl):
    g = community_graph(3000, 300_000, n_comm=8, seed=5, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    plan = _check(g, impl, tm=256, W=128, J=4, min_count=32)
    assert 0.15 < plan.coverage < 1.0
    assert plan.ell.nnz == g.nnz - round(plan.coverage * g.nnz)


@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_windowed_clique_graph(impl):
    g = bipartite_projection_graph(4000, 200_000, n_comm=6, seed=2)
    g = reorder(g, "rabbit", check=False)
    _check(g, impl, tm=128, W=128, J=4, min_count=16)


def test_windowed_full_coverage():
    # dense-enough graph: every entry lands in a window, residue is empty
    g = community_graph(512, 60_000, n_comm=2, seed=1, shuffle=False)
    B = make_features(g, 8)
    plan = prepare_windowed(g, tm=256, W=128, J=4, min_count=1)
    assert plan.ell.nnz == 0 and plan.coverage == 1.0
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, chk


def test_windowed_refuses_scattered():
    g = uniform_graph(4096, 40_000, seed=1)
    with pytest.raises(ValueError):
        prepare_windowed(g, tm=256, W=128, J=4, min_count=64)


def test_windowed_trailing_empty_panels():
    # zero-degree tail rows (post-DEG shape); last panel empty
    from flex_tpu.sparse.csr import CSRGraph

    rng = np.random.default_rng(0)
    m = 700
    rows = np.repeat(np.arange(256), 40)
    cols = rng.integers(0, 256, rows.shape)
    vals = np.ones(len(rows), np.float32)
    g = CSRGraph.from_coo(rows, cols, vals, m, name="tail")
    B = make_features(g, 8)
    plan = prepare_windowed(g, tm=256, W=128, J=3, min_count=8)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, chk
    assert np.all(C[256:] == 0.0)


def test_window_select_stats():
    g = community_graph(2048, 100_000, n_comm=4, seed=7, shuffle=False)
    sel = window_select(g, tm=256, W=128, J=4, min_count=16)
    assert 0 < sel["coverage"] <= 1.0
    assert sel["n_res"] == g.nnz - round(sel["coverage"] * g.nnz)
    # step layout invariants
    S = sel["total_steps"]
    assert sel["win_step"].shape == (S * 4,)
    assert sel["win_step"].max() <= sel["nblk"]  # sentinel only in pads
    assert sel["first"].sum() == sel["n_used_panels"]
    assert sel["out_panel"].max() + 1 == sel["n_used_panels"] if S else True
    # per-panel kept windows sorted ascending (sentinels trail each panel)
    ws = sel["win_step"].reshape(S, 4)
    real = ws < sel["nblk"]
    assert (np.diff(ws, axis=1) >= 0)[real[:, 1:]].all()


def test_window_select_device_hist_matches_host():
    """The device-side panel x block histogram path must produce the
    identical selection/layout as the host bincount path."""
    from flex_tpu.sparse.device import DeviceCSR

    g = community_graph(3000, 200_000, n_comm=5, seed=6)
    a = window_select(g, tm=256, W=128, min_count=32)
    b = window_select(g, tm=256, W=128, min_count=32,
                      dev=DeviceCSR.from_graph(g))
    for key in ("win_step", "out_panel", "first", "pstep0", "slot", "used"):
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    assert a["coverage"] == b["coverage"]


def test_windowed_grad_matches_xla_impl():
    """The custom VJP (Pallas forward, XLA backward) must agree with
    autodiff through the einsum fallback and with the analytic Aᵀg."""
    import jax

    g = community_graph(2000, 150_000, n_comm=4, seed=9, shuffle=False)
    B = jnp.asarray(make_features(g, 16))
    co = jnp.asarray(np.random.default_rng(0).random((g.m, 16), np.float32))

    grads = {}
    for impl in ("pallas", "xla"):
        plan = prepare_windowed(g, tm=256, W=128, J=8, min_count=8,
                                impl=impl)
        grads[impl] = jax.grad(lambda b: (plan(b) * co).sum())(B)
    np.testing.assert_allclose(np.asarray(grads["pallas"]),
                               np.asarray(grads["xla"]), rtol=2e-4,
                               atol=1e-4)
    analytic = g.to_scipy().T @ np.asarray(co)
    np.testing.assert_allclose(np.asarray(grads["pallas"]), analytic,
                               rtol=2e-3, atol=2e-3)


def test_windowed_pallas_bwd_tables_and_fallback():
    """The Pallas training backward (block-sorted slot tables) must agree
    with the XLA-formulation fallback (bwd_tabs stripped), and the host
    table invariants must hold: slots sorted by block id, ranks dense,
    rows = unique blocks' B_pad rows."""
    import dataclasses

    import jax

    from flex_tpu.ops.window_spmm import _bwd_tables

    g = community_graph(2000, 150_000, n_comm=4, seed=9, shuffle=False)
    B = jnp.asarray(make_features(g, 16))
    co = jnp.asarray(np.random.default_rng(0).random((g.m, 16), np.float32))
    plan = prepare_windowed(g, tm=256, W=128, J=8, min_count=8)
    assert plan.bwd_tabs is not None and plan.n_blk_used > 0

    g_new = jax.grad(lambda b: (plan(b) * co).sum())(B)
    p_old = dataclasses.replace(plan, bwd_tabs=None, n_blk_used=0)
    g_old = jax.grad(lambda b: (p_old(b) * co).sum())(B)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old),
                               rtol=2e-4, atol=1e-4)

    # host invariants
    sel = window_select(g, tm=256, W=128, J=8, min_count=8)
    tabs, n_blk = _bwd_tables(sel["win_step"], sel["out_panel"],
                              sel["nblk"], sel["G"], 128)
    slot_s, slot_g, panel_of, rank, bfirst, rows = tabs
    flat = slot_s.astype(np.int64) * sel["G"] + slot_g
    blk = sel["win_step"][flat]
    assert (blk != sel["nblk"]).all()          # no sentinel slots
    assert (np.diff(blk) >= 0).all()           # sorted by block id
    assert rank[-1] + 1 == n_blk
    np.testing.assert_array_equal(bfirst, np.r_[1, np.diff(blk) != 0])
    uniq = np.unique(blk)
    np.testing.assert_array_equal(
        rows.reshape(-1, 128)[:, 0], uniq * 128)
    np.testing.assert_array_equal(panel_of, sel["out_panel"][slot_s])


def test_windowed_lex_step_order():
    """Panel permutation by lexicographic first-step block ids (the
    mat.cu:311-678 seg-reordering analog) must not change results or
    coverage — only the step order."""
    g = community_graph(3000, 300_000, n_comm=8, seed=5, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    a = window_select(g, tm=256, W=128, J=4, min_count=32)
    b = window_select(g, tm=256, W=128, J=4, min_count=32,
                      step_order="lex")
    assert a["coverage"] == b["coverage"]
    assert a["total_steps"] == b["total_steps"]
    assert sorted(a["used"]) == sorted(b["used"])
    plan = _check(g, "pallas", tm=256, W=128, J=4, min_count=32,
                  step_order="lex")
    assert 0.15 < plan.coverage < 1.0


@pytest.mark.parametrize("g_step", [2, 8])
def test_windowed_g_step(g_step):
    """Windows-per-step is a tunable (G=4 default; the sweep explores
    2/8); results must match at any G."""
    g = community_graph(3000, 300_000, n_comm=8, seed=5, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    plan = _check(g, "pallas", tm=256, W=128, J=8, min_count=16,
                  g_step=g_step)
    assert plan.A.shape[2] == g_step * 128


def test_windowed_sel_reuse_identical():
    """prepare_windowed(sel=...) (the autotuner's shared selection, with
    device-resident tables) must produce the same plan as a fresh
    prepare."""
    g = community_graph(2048, 150_000, n_comm=4, seed=7, shuffle=False)
    B = make_features(g, 16)
    sel = window_select(g, tm=256, W=128, J=4, min_count=16)
    p1 = prepare_windowed(g, tm=256, W=128, J=4, min_count=16, sel=sel)
    p2 = prepare_windowed(g, tm=256, W=128, J=4, min_count=16)
    np.testing.assert_array_equal(np.asarray(p1.A), np.asarray(p2.A))
    np.testing.assert_allclose(np.asarray(p1(jnp.asarray(B))),
                               np.asarray(p2(jnp.asarray(B))))
    assert "dev_tables" in sel  # tables cached for the next prepare


def test_windowed_variable_steps():
    """Panels own variable numbers of G-window steps; the fat tail beyond
    the J cap is truncated to residue and the hybrid still matches."""
    g = community_graph(4096, 400_000, n_comm=3, seed=3, shuffle=False)
    g = reorder(g, "rbdeg", check=False)
    sel = window_select(g, tm=128, W=128, J=256, min_count=8)
    steps_per = np.bincount(sel["out_panel"])
    assert steps_per.min() >= 1 and steps_per.max() > steps_per.min()
    plan = prepare_windowed(g, tm=128, W=128, J=256, min_count=8)
    B = make_features(g, 16)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, f"{chk} stats={plan.stats}"


def test_budgeted_selection_raises_gate_to_fit():
    """max_dense_bytes auto-raises the count gate to the smallest value
    whose dense array fits the budget (the HBM-capacity analog of ASpT's
    MIN_OCC gate; makes windowed eligible at amazon scale on one chip)."""
    g = community_graph(3000, 300_000, n_comm=8, seed=5, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    free = window_select(g, tm=256, W=128, J=8, min_count=8)
    assert free["min_count_eff"] == 8
    budget = free["dense_bytes"] // 2
    sel = window_select(g, tm=256, W=128, J=8, min_count=8,
                        max_dense_bytes=budget)
    assert sel["dense_bytes"] <= budget
    assert sel["min_count_eff"] > 8
    assert 0 < sel["coverage"] < free["coverage"]
    # realized gate is minimal: one count lower must blow the budget
    below = window_select(g, tm=256, W=128, J=8,
                          min_count=sel["min_count_eff"] - 1)
    assert below["dense_bytes"] > budget
    # a budget the free selection already meets is a no-op
    same = window_select(g, tm=256, W=128, J=8, min_count=8,
                         max_dense_bytes=free["dense_bytes"])
    assert same["min_count_eff"] == 8
    assert same["dense_bytes"] == free["dense_bytes"]


def test_budgeted_prepare_matches_scipy():
    """prepare_windowed under a tight byte budget coarsens instead of
    refusing, and the built hybrid still matches the SciPy gold."""
    g = community_graph(3000, 300_000, n_comm=8, seed=5, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    free = window_select(g, tm=256, W=128, J=8, min_count=8)
    budget = free["dense_bytes"] // 2
    B = make_features(g, 16)
    plan = prepare_windowed(g, tm=256, W=128, J=8, min_count=8,
                            max_dense_bytes=budget)
    assert plan.A.size * 4 <= budget
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, f"{chk} stats={plan.stats}"


def test_budgeted_zero_budget_refuses_on_coverage():
    """An impossible budget empties the selection; prepare refuses on the
    coverage gate rather than building a degenerate hybrid."""
    g = community_graph(2048, 150_000, n_comm=4, seed=7, shuffle=False)
    sel = window_select(g, tm=256, W=128, J=4, min_count=8,
                        max_dense_bytes=0)
    assert sel["coverage"] == 0.0 and sel["dense_bytes"] == 0
    with pytest.raises(ValueError):
        prepare_windowed(g, tm=256, W=128, J=4, min_count=8,
                         max_dense_bytes=0)


def test_hist_host_fallback_matches_device(monkeypatch):
    """Past _HIST_D2H_MAX_BYTES the selection histogram comes from the
    host bincount instead of the device hist + D2H (301 MB ≈ 20 min
    through the relay at amazon scale); both must agree exactly."""
    import flex_tpu.ops.window_spmm as wsp
    from flex_tpu.sparse.device import DeviceCSR

    g = community_graph(2048, 150_000, n_comm=4, seed=7, shuffle=False)
    dev = DeviceCSR.from_graph(g)
    P, nblk = -(-g.m // 256), -(-g.n // 128)
    via_dev = wsp._panel_block_hist(g, dev, 256, 128, P, nblk)
    monkeypatch.setattr(wsp, "_HIST_D2H_MAX_BYTES", 0)
    via_host = wsp._panel_block_hist(g, dev, 256, 128, P, nblk)
    np.testing.assert_array_equal(via_dev, via_host)


def _assert_plans_identical(p1, p2):
    np.testing.assert_array_equal(np.asarray(p1.A), np.asarray(p2.A))
    np.testing.assert_array_equal(np.asarray(p1.row_gather),
                                  np.asarray(p2.row_gather))
    assert p1.ell.padded_nnz == p2.ell.padded_nnz
    assert p1.ell.nnz == p2.ell.nnz
    np.testing.assert_array_equal(np.asarray(p1.ell.chunk_row),
                                  np.asarray(p2.ell.chunk_row))
    assert len(p1.ell.buckets) == len(p2.ell.buckets)
    for (c1, v1), (c2, v2) in zip(p1.ell.buckets, p2.ell.buckets):
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


@pytest.mark.parametrize("mode", [True, "scatter", "scatter2"])
@pytest.mark.parametrize("kw", [
    dict(tm=256, W=128, J=4, min_count=32),          # normal hybrid
    dict(tm=256, W=128, J=4, min_count=1),           # near-full coverage
    dict(tm=128, W=128, J=256, min_count=8),         # variable steps
])
def test_fused_build_matches_twopass(kw, mode):
    """The fused one-program builds (slice-assembled and
    scatter-assembled residue) must produce bit-identical plan contents
    to the two-program path."""
    g = community_graph(3000, 300_000, n_comm=8, seed=5, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    p_fused = prepare_windowed(g, fused=mode, **kw)
    p_two = prepare_windowed(g, fused=False, **kw)
    _assert_plans_identical(p_fused, p_two)
    B = make_features(g, 16)
    np.testing.assert_array_equal(np.asarray(p_fused(jnp.asarray(B))),
                                  np.asarray(p_two(jnp.asarray(B))))


def test_fused_build_duplicates_and_empty_residue():
    """Fused path: duplicate (row, col) values must still SUM (the .add
    scatter), and a full-coverage selection (empty residue, no ELL
    buckets) must not break the fused program."""
    from flex_tpu.sparse.csr import CSRGraph

    rng = np.random.default_rng(0)
    m = 700
    rows = rng.integers(0, m, 8_000)
    cols = rng.integers(0, m, 8_000)
    rows = np.concatenate([rows, rows[:3000]])
    cols = np.concatenate([cols, cols[:3000]])
    vals = (2 * rng.random(len(rows)) - 1).astype(np.float32)
    order = np.lexsort((cols, rows))
    row_ptr = np.zeros(m + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=m), out=row_ptr[1:])
    g = CSRGraph.from_arrays(row_ptr, cols[order], vals[order], name="dups")
    kw = dict(tm=256, W=128, J=8, min_count=1, min_coverage=0.0)
    _assert_plans_identical(prepare_windowed(g, fused=True, **kw),
                            prepare_windowed(g, fused=False, **kw))
    _assert_plans_identical(prepare_windowed(g, fused="scatter", **kw),
                            prepare_windowed(g, fused=False, **kw))
    _assert_plans_identical(prepare_windowed(g, fused="scatter2", **kw),
                            prepare_windowed(g, fused=False, **kw))
    B = make_features(g, 8)
    C = np.asarray(prepare_windowed(g, fused=True, **kw)(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, chk

    # empty residue: full coverage (both fused modes)
    g2 = community_graph(512, 60_000, n_comm=2, seed=1, shuffle=False)
    ps = prepare_windowed(g2, tm=256, W=128, J=4, min_count=1,
                          fused="scatter")
    assert ps.ell.nnz == 0 and ps.ell.buckets == ()
    p = prepare_windowed(g2, tm=256, W=128, J=4, min_count=1, fused=True)
    assert p.ell.nnz == 0 and p.ell.buckets == ()
    B2 = make_features(g2, 8)
    chk2 = res_check(spmm_scipy(g2, B2), np.asarray(p(jnp.asarray(B2))),
                     g2.degrees)
    assert chk2.ok, chk2


def test_fused_build_split_chunk_residue():
    """A hub row whose residue degree exceeds the widest ELL bucket
    (2048) splits into multiple chunks; fused and two-pass layouts must
    agree."""
    from flex_tpu.sparse.csr import CSRGraph

    rng = np.random.default_rng(3)
    m = 4000
    # panel 0 rows: a dense (0, 0) block that clears the count gate;
    # hub row 300: 3000 entries spread thinly over all blocks (residue)
    rows = np.concatenate([
        np.repeat(np.arange(256), 80),
        np.full(3000, 300, np.int64),
        np.repeat(np.arange(1000, m), 2),
    ])
    cols = np.concatenate([
        rng.integers(0, 128, 256 * 80),
        np.sort(rng.choice(m, 3000, replace=False)),
        rng.integers(0, m, (m - 1000) * 2),
    ])
    vals = (2 * rng.random(len(rows)) - 1).astype(np.float32)
    g = CSRGraph.from_coo(rows, cols, vals, m, name="hub")
    assert g.degrees.max() > 2048
    kw = dict(tm=256, W=128, J=8, min_count=256, min_coverage=0.0)
    p1 = prepare_windowed(g, fused=True, **kw)
    p2 = prepare_windowed(g, fused=False, **kw)
    assert p1.A.shape[0] >= 1  # the dense block survived the gate
    assert p1.ell.nnz > 2048   # the hub's scatter stays residue
    _assert_plans_identical(p1, p2)
    _assert_plans_identical(prepare_windowed(g, fused="scatter", **kw), p2)
    _assert_plans_identical(prepare_windowed(g, fused="scatter2", **kw), p2)
    B = make_features(g, 8)
    chk = res_check(spmm_scipy(g, B), np.asarray(p1(jnp.asarray(B))),
                    g.degrees)
    assert chk.ok, chk


# ---------------------------------------------------------------------------
# transposed (k<128-specialized) kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("k", [16, 32, 64, 128])
def test_windowed_transposed_matches_scipy(k):
    g = community_graph(3000, 300_000, n_comm=8, seed=5, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    B = make_features(g, k)
    plan = prepare_windowed(g, tm=256, W=128, J=4, min_count=32,
                            transposed=True)
    assert plan.transposed and plan.stats["transposed"]
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, f"k={k}: {chk} stats={plan.stats}"


@pytest.mark.parametrize("fused", [True, False, "scatter", "scatter2"])
def test_windowed_transposed_build_variants(fused):
    g = community_graph(2000, 150_000, n_comm=6, seed=3, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    B = make_features(g, 32)
    plan = prepare_windowed(g, tm=128, W=128, J=4, min_count=16,
                            transposed=True, fused=fused)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, f"fused={fused}: {chk}"


def test_windowed_transposed_equals_row_major():
    # bit-comparable: same selection, same residue; dense halves both use
    # HIGHEST precision so the two layouts agree to f32 round-off
    g = community_graph(1500, 120_000, n_comm=5, seed=7, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    B = make_features(g, 32)
    p_row = prepare_windowed(g, tm=128, W=128, J=4, min_count=16)
    p_t = prepare_windowed(g, tm=128, W=128, J=4, min_count=16,
                           transposed=True)
    C_row = np.asarray(p_row(jnp.asarray(B)))
    C_t = np.asarray(p_t(jnp.asarray(B)))
    np.testing.assert_allclose(C_row, C_t, rtol=1e-5, atol=1e-5)


def test_windowed_transposed_grad():
    import jax

    g = community_graph(800, 40_000, n_comm=4, seed=2, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    B = jnp.asarray(make_features(g, 16))
    plan = prepare_windowed(g, tm=128, W=128, J=4, min_count=8,
                            transposed=True)
    p_ref = prepare_windowed(g, tm=128, W=128, J=4, min_count=8)

    def loss(plan, B):
        return (plan(B) ** 2).sum()

    gB_t = jax.grad(loss, argnums=1)(plan, B)
    gB_r = jax.grad(loss, argnums=1)(p_ref, B)
    np.testing.assert_allclose(np.asarray(gB_t), np.asarray(gB_r),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("transposed", [False, True])
def test_windowed_chunked_build_bit_exact(monkeypatch, transposed):
    """The chunked dense-A assembly (peak-HBM fix for the r3 OOM) must
    produce a bit-identical plan to the single-scatter build."""
    import flex_tpu.ops.window_spmm as ws

    g = community_graph(3000, 300_000, n_comm=8, seed=5, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    B = make_features(g, 16)

    p_plain = prepare_windowed(g, tm=256, W=128, J=8, min_count=32,
                               transposed=transposed)
    # force chunking: trigger 0, ~3 steps per chunk
    monkeypatch.setattr(ws, "_A_CHUNK_TRIGGER_BYTES", 0)
    monkeypatch.setattr(ws, "_A_CHUNK_TARGET_BYTES", 3 * 256 * 512 * 4)
    p_chunk = prepare_windowed(g, tm=256, W=128, J=8, min_count=32,
                               transposed=transposed)
    sel = window_select(g, tm=256, W=128, J=8, min_count=32)
    assert sel["build_chunks"] is not None and len(sel["build_chunks"]) > 1
    np.testing.assert_array_equal(np.asarray(p_plain.A),
                                  np.asarray(p_chunk.A))
    C1 = np.asarray(p_plain(jnp.asarray(B)))
    C2 = np.asarray(p_chunk(jnp.asarray(B)))
    np.testing.assert_array_equal(C1, C2)


def test_windowed_chunked_fused_variants(monkeypatch):
    import flex_tpu.ops.window_spmm as ws

    g = community_graph(2000, 150_000, n_comm=6, seed=3, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    B = make_features(g, 16)
    gold = spmm_scipy(g, B)
    monkeypatch.setattr(ws, "_A_CHUNK_TRIGGER_BYTES", 0)
    monkeypatch.setattr(ws, "_A_CHUNK_TARGET_BYTES", 2 * 128 * 512 * 4)
    for fused in (True, "scatter", False):
        plan = prepare_windowed(g, tm=128, W=128, J=4, min_count=16,
                                fused=fused)
        chk = res_check(gold, np.asarray(plan(jnp.asarray(B))), g.degrees)
        assert chk.ok, f"fused={fused}: {chk}"


def test_windowed_chunk_plan_covers_all_steps():
    from flex_tpu.ops.window_spmm import _plan_build_chunks

    g = community_graph(3000, 300_000, n_comm=8, seed=5, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    sel = window_select(g, tm=256, W=128, J=8, min_count=32)
    rp = np.concatenate([[0], np.cumsum(g.degrees, dtype=np.int64)])
    ch = _plan_build_chunks(sel["used"], sel["pstep0"],
                            sel["total_steps"], 256, 128, sel["G"],
                            rp, g.m, 1)  # a_elems=1 won't trigger
    assert ch is None
    ch = _plan_build_chunks(sel["used"], sel["pstep0"],
                            sel["total_steps"], 256, 128, sel["G"],
                            rp, g.m, 10**12)
    # step spans partition [0, total_steps) in order
    assert ch[0][2] == 0 and ch[-1][3] == sel["total_steps"]
    for a, b in zip(ch, ch[1:]):
        assert a[3] == b[2] and a[0] <= a[1] <= b[0]


def test_windowed_transposed_requires_w128():
    g = community_graph(1000, 60_000, n_comm=4, seed=1, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    with pytest.raises(ValueError, match="W % 128"):
        prepare_windowed(g, tm=128, W=64, J=4, min_count=8,
                         transposed=True)


def test_autotune_suggests_transposed_below_k128():
    from flex_tpu.bench.autotune import suggest

    g = community_graph(3000, 300_000, n_comm=8, seed=5, shuffle=True)
    g = reorder(g, "rbdeg", check=False)
    s32 = suggest(g, 32, win_min_count=16)
    s128 = suggest(g, 128, win_min_count=16)
    if s32.method == "windowed":
        assert s32.prep_kwargs.get("transposed") is True
    if s128.method == "windowed":
        assert "transposed" not in s128.prep_kwargs


def test_windowed_training_bwd_parity():
    # round-5: with_training_bwd swaps the residue's autodiff scatter for
    # the transposed-pattern gather; gradients must match the plain plan.
    import jax

    from flex_tpu.ops.window_spmm import with_training_bwd

    g = community_graph(2000, 150_000, n_comm=4, seed=9, shuffle=False)
    B = jnp.asarray(make_features(g, 16))
    co = jnp.asarray(np.random.default_rng(0).random((g.m, 16), np.float32))
    plan = prepare_windowed(g, tm=256, W=128, J=8, min_count=8)
    tplan = with_training_bwd(plan)
    assert tplan.ell.bwd_plan is not None
    np.testing.assert_allclose(np.asarray(tplan(B)), np.asarray(plan(B)),
                               rtol=1e-6, atol=1e-6)
    g_auto = jax.grad(lambda b: (plan(b) * co).sum())(B)
    g_cv = jax.grad(lambda b: (tplan(b) * co).sum())(B)
    np.testing.assert_allclose(np.asarray(g_cv), np.asarray(g_auto),
                               rtol=2e-4, atol=1e-4)
    analytic = g.to_scipy().T @ np.asarray(co)
    np.testing.assert_allclose(np.asarray(g_cv), analytic, rtol=2e-3,
                               atol=2e-3)
