import numpy as np
import jax.numpy as jnp
import pytest

from flex_tpu.io import load_csv, make_features
from flex_tpu.io.synth import rmat_graph, uniform_graph
from flex_tpu.ops.ell_spmm import prepare_ell
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.utils.check import res_check


@pytest.mark.parametrize("k", [8, 32])
def test_ell_matches_scipy(a_mat, k):
    B = make_features(a_mat, k)
    plan = prepare_ell(a_mat)
    chk = res_check(spmm_scipy(a_mat, B), np.asarray(plan(jnp.asarray(B))),
                    a_mat.degrees)
    assert chk.ok, chk


def test_ell_pubmed(pubmed):
    B = make_features(pubmed, 32)
    plan = prepare_ell(pubmed)
    chk = res_check(spmm_scipy(pubmed, B), np.asarray(plan(jnp.asarray(B))),
                    pubmed.degrees)
    assert chk.ok, chk
    assert plan.stats["pad_ratio"] < 1.6, plan.stats


def test_ell_split_rows():
    # force row splitting with a tiny wmax
    g = rmat_graph(256, 8192, seed=5)
    B = make_features(g, 16)
    plan = prepare_ell(g, widths=(2, 4, 8))
    chk = res_check(spmm_scipy(g, B), np.asarray(plan(jnp.asarray(B))),
                    g.degrees)
    assert chk.ok, chk
    assert plan.stats["n_chunks"] > g.m  # some rows split


def test_ell_zero_degree_rows():
    g = uniform_graph(512, 600, seed=1)
    assert (g.degrees == 0).any()
    B = make_features(g, 8)
    plan = prepare_ell(g)
    C = np.asarray(plan(jnp.asarray(B)))
    assert np.all(C[g.degrees == 0] == 0)
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, chk


def test_ell_plan_reuse(small_rmat):
    plan = prepare_ell(small_rmat)
    for seed in (1, 2):
        B = make_features(small_rmat, 8, seed=seed)
        chk = res_check(spmm_scipy(small_rmat, B),
                        np.asarray(plan(jnp.asarray(B))), small_rmat.degrees)
        assert chk.ok


def test_ell_gather_assembly_matches_scatter():
    # round-5 glue fix: output assembled by per-row gather of chunk
    # partials (chunk1/extras tables) must equal the chunk scatter-add.
    import dataclasses
    g = rmat_graph(256, 8192, seed=5)
    B = make_features(g, 16)
    plan = prepare_ell(g, widths=(2, 4, 8))  # forces split rows -> extras
    assert plan.chunk1 is not None
    assert plan.extras is not None  # split rows produce extra chunks
    scat = dataclasses.replace(plan, chunk1=None, extras=None)
    got = np.asarray(plan(jnp.asarray(B)))
    want = np.asarray(scat(jnp.asarray(B)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    chk = res_check(spmm_scipy(g, B), got, g.degrees)
    assert chk.ok, chk


def test_ell_gather_assembly_into():
    # hybrid contract: into= + chunk1 adds the gathered residue onto the
    # dense accumulator and returns the kp-wide buffer unsliced.
    g = uniform_graph(512, 600, seed=1)  # has zero-degree rows (sentinel)
    B = make_features(g, 8)
    plan = prepare_ell(g)
    assert plan.chunk1 is not None
    kp = 128  # k < 128 pads lanes
    into = jnp.ones((g.m, kp), jnp.float32)
    out = np.asarray(plan(jnp.asarray(B), into=into))
    assert out.shape == (g.m, kp)
    ref = spmm_scipy(g, B)
    chk = res_check(ref + 1.0, out[:, :8] , np.maximum(g.degrees, 1))
    assert chk.ok, chk
    assert np.all(out[g.degrees == 0] == 1.0)  # sentinel rows untouched


def test_ell_transposed_backward():
    # round-5: with_bwd_plan routes the call through a custom VJP whose
    # g_B is the transposed-pattern ELL (gather engine) — must match
    # autodiff through the plain plan and the analytic A^T g.
    import jax
    from flex_tpu.ops.ell_spmm import with_bwd_plan

    g = rmat_graph(256, 8192, seed=5)
    B = jnp.asarray(make_features(g, 16))
    co = jnp.asarray(np.random.default_rng(0).random((g.m, 16), np.float32))
    plan = prepare_ell(g, widths=(2, 4, 8))  # split rows exercise extras
    tplan = with_bwd_plan(plan, g.n)
    np.testing.assert_allclose(np.asarray(tplan(B)), np.asarray(plan(B)),
                               rtol=1e-6, atol=1e-6)
    g_auto = jax.grad(lambda b: (plan(b) * co).sum())(B)
    g_cv = jax.grad(lambda b: (tplan(b) * co).sum())(B)
    np.testing.assert_allclose(np.asarray(g_cv), np.asarray(g_auto),
                               rtol=1e-5, atol=1e-5)
    analytic = g.to_scipy().T @ np.asarray(co)
    np.testing.assert_allclose(np.asarray(g_cv), analytic, rtol=1e-4,
                               atol=1e-4)


def test_ell_transposed_backward_into():
    # the hybrid's into= path: g must flow to both the accumulator and B
    import jax
    from flex_tpu.ops.ell_spmm import with_bwd_plan

    g = uniform_graph(512, 600, seed=1)
    B = jnp.asarray(make_features(g, 8))
    tplan = with_bwd_plan(prepare_ell(g), g.n)
    co = jnp.asarray(
        np.random.default_rng(1).random((g.m, 128), np.float32))

    def f(b, into):
        bp = jnp.concatenate(
            [b, jnp.zeros((b.shape[0], 120), b.dtype)], axis=1)
        return (tplan(bp, into=into) * co).sum()

    into0 = jnp.zeros((g.m, 128), jnp.float32)
    g_b, g_into = jax.grad(f, argnums=(0, 1))(B, into0)
    analytic = (g.to_scipy().T @ np.asarray(co))[:, :8]
    np.testing.assert_allclose(np.asarray(g_b), analytic, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_into), np.asarray(co),
                               rtol=1e-6, atol=1e-6)
