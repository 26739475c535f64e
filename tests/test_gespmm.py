"""GE-SpMM row-parallel baseline (the documented-negative second opinion,
reference flex.cu:81-273)."""
import numpy as np
import jax.numpy as jnp

from flex_tpu.io import make_features
from flex_tpu.io.synth import rmat_graph
from flex_tpu.ops.gespmm import prepare_gespmm
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.utils.check import res_check


def test_gespmm_matches_scipy(small_rmat):
    plan = prepare_gespmm(small_rmat, w=16)
    B = make_features(small_rmat, 8)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(small_rmat, B), C, small_rmat.degrees)
    assert chk.ok, f"{chk} stats={plan.stats}"


def test_gespmm_long_rows_and_pads():
    # rows longer than w split into chunks; zero-degree rows stay zero
    g = rmat_graph(500, 6_000, seed=3, name="ge")
    plan = prepare_gespmm(g, w=8)
    assert plan.stats["pad_ratio"] >= 1.0
    B = make_features(g, 8)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, chk
    assert np.all(C[g.degrees == 0] == 0.0)
