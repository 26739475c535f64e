import numpy as np
import pytest

import jax.numpy as jnp

from flex_tpu.io import load_csv, make_features
from flex_tpu.io.synth import rmat_graph, uniform_graph
from flex_tpu.ops.panel_spmm import prepare_panel
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.reorder import reorder
from flex_tpu.tiling.panels import build_panels
from flex_tpu.utils.check import res_check


@pytest.mark.parametrize("tm", [8, 32, 128])
def test_build_panels_reconstructs(a_mat, tm):
    pf = build_panels(a_mat, tm=tm)
    # dense reconstruction equals the original matrix
    A = pf.dense_a()
    dense = np.zeros((pf.n_panels * tm, a_mat.n), np.float32)
    for p in range(pf.n_panels):
        dense[p * tm:(p + 1) * tm][:, pf.ucols[p]] = 0  # touch cols
        for s in range(pf.u_pad):
            dense[p * tm:(p + 1) * tm, pf.ucols[p, s]] += A[p, :, s]
    want = a_mat.to_scipy().toarray()
    np.testing.assert_allclose(dense[: a_mat.m], want, rtol=0, atol=0)


def test_build_panels_ucols_sorted(small_rmat):
    pf = build_panels(small_rmat, tm=64)
    for p in range(pf.n_panels):
        u = pf.ucols[p, : pf.u_len[p]]
        assert np.all(np.diff(u) > 0), f"panel {p} unique cols not sorted"


@pytest.mark.parametrize("graph,params", [
    ("a_mat", dict(tm=16, hub_threshold=8)),     # forces hub path
    ("a_mat", dict(tm=128, hub_threshold=512)),  # all-panel path
    ("small_rmat", dict(tm=64, hub_threshold=64, hub_width=128)),
    ("small_rmat", dict(tm=128, hub_threshold=32, hub_width=64)),
])
def test_panel_spmm_matches_scipy(request, graph, params):
    g = request.getfixturevalue(graph)
    gd = reorder(g, "deg", check=False)
    B = make_features(gd, 32)
    plan = prepare_panel(gd, **params)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(gd, B), C, gd.degrees)
    assert chk.ok, f"{params}: {chk}"


def test_panel_spmm_pubmed(pubmed):
    gd = reorder(pubmed, "deg", check=False)
    B = make_features(gd, 64)
    plan = prepare_panel(gd, tm=128, hub_threshold=256)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(gd, B), C, gd.degrees)
    assert chk.ok, f"{chk}"


def test_panel_requires_hub_prefix(small_rmat):
    # unordered graph with scattered hubs must be rejected
    g = small_rmat
    if (np.sort(g.degrees)[::-1] == g.degrees).all():
        pytest.skip("graph already degree-sorted")
    with pytest.raises(NotImplementedError):
        prepare_panel(g, hub_threshold=int(np.median(g.degrees)))
