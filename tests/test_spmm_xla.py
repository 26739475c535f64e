import jax.numpy as jnp
import numpy as np

from flex_tpu.io import make_features
from flex_tpu.ops import spmm
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.ops.xla_spmm import prepare_xla
from flex_tpu.utils.check import res_check, res_check2


def test_xla_matches_scipy_small(a_mat):
    B = make_features(a_mat, 16)
    gold = spmm_scipy(a_mat, B)
    got = np.asarray(spmm(a_mat, jnp.asarray(B), method="xla"))
    chk = res_check(gold, got, a_mat.degrees)
    assert chk.ok, f"{chk}"


def test_xla_matches_scipy_pubmed_k32(pubmed):
    # BASELINE.json config 1: Pubmed k=32 vs scipy reference, CPU-runnable.
    B = make_features(pubmed, 32)
    gold = spmm_scipy(pubmed, B)
    got = np.asarray(spmm(pubmed, jnp.asarray(B), method="xla"))
    chk = res_check(gold, got, pubmed.degrees)
    assert chk.ok, f"{chk}"


def test_plan_reuse(small_rmat):
    plan = prepare_xla(small_rmat)
    B1 = make_features(small_rmat, 8, seed=1)
    B2 = make_features(small_rmat, 8, seed=2)
    for B in (B1, B2):
        gold = spmm_scipy(small_rmat, B)
        got = np.asarray(plan(jnp.asarray(B)))
        assert res_check(gold, got, small_rmat.degrees).ok


def test_res_check_catches_errors(a_mat):
    B = make_features(a_mat, 8)
    gold = spmm_scipy(a_mat, B)
    bad = gold.copy()
    bad[3, 2] += 1.0
    chk = res_check(gold, bad, a_mat.degrees)
    assert not chk.ok and chk.n_bad == 1
    chk2 = res_check2(gold, bad, tol=0.01)
    assert chk2.n_bad == 1
