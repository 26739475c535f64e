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
