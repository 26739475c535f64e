import numpy as np
import jax.numpy as jnp
import pytest

import flex_tpu
from flex_tpu.io import load_csv, make_features
from flex_tpu.io.synth import rmat_graph
from flex_tpu.ops.bcoo_spmm import prepare_bcoo
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.utils.check import res_check


@pytest.fixture(scope="module")
def pubmed():
    return load_csv("/root/reference/data/pubmed.csv")


def test_bcoo_matches_scipy(pubmed):
    B = make_features(pubmed, 32)
    plan = prepare_bcoo(pubmed)
    chk = res_check(spmm_scipy(pubmed, B),
                    np.asarray(plan(jnp.asarray(B))), pubmed.degrees)
    assert chk.ok, chk


def test_bcoo_dispatcher_and_harness():
    from flex_tpu.bench.harness import bench_spmm

    g = rmat_graph(512, 8_000, seed=3, name="t")
    B = make_features(g, 16)
    C = flex_tpu.spmm(g, jnp.asarray(B), method="bcoo")
    chk = res_check(spmm_scipy(g, B), np.asarray(C), g.degrees)
    assert chk.ok, chk
    r = bench_spmm(g, 16, method="bcoo", iters=2)
    assert r.check.ok and r.gflops > 0
    assert r.extra["model_gb"] > 0


def test_bcoo_empty_rows():
    # zero-degree rows must produce zero output rows
    from flex_tpu.sparse.csr import CSRGraph

    rows = np.array([0, 0, 2])
    cols = np.array([1, 2, 0])
    vals = np.array([1.0, 2.0, 3.0], np.float32)
    g = CSRGraph.from_coo(rows, cols, vals, 4, name="tiny")
    B = np.eye(4, 3, dtype=np.float32)
    C = np.asarray(flex_tpu.spmm(g, jnp.asarray(B), method="bcoo"))
    assert np.all(C[1] == 0) and np.all(C[3] == 0)
    np.testing.assert_allclose(C, g.to_scipy() @ B)
