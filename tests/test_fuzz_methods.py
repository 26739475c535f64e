"""Randomized cross-method consistency fuzz: every SpMM strategy must
match the SciPy gold on awkward graph shapes — tiny m, empty rows/graphs,
duplicate entries, hub rows, narrow/odd k.  (The reference enforces the
same property operationally: every benchmarked config passes resCheck
vs cuSPARSE, flex.cu:5690-5693.)"""
import numpy as np
import jax.numpy as jnp
import pytest

import flex_tpu
from flex_tpu.io import make_features
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.utils.check import res_check


def _random_graph(seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(1, 600))
    nnz = int(rng.integers(0, max(1, m * 8)))
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, m, nnz)
    if seed % 3 == 0 and nnz > 4:  # force duplicates
        rows = np.concatenate([rows, rows[: nnz // 3]])
        cols = np.concatenate([cols, cols[: nnz // 3]])
    if seed % 4 == 0 and m > 10 and nnz:  # hub row
        extra = int(rng.integers(1, 3 * m))
        rows = np.concatenate([rows, np.full(extra, int(rng.integers(0, m)))])
        cols = np.concatenate([cols, rng.integers(0, m, extra)])
    vals = (2 * rng.random(len(rows)) - 1).astype(np.float32)
    return CSRGraph.from_coo(rows, cols, vals, m, name=f"fuzz{seed}")


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_methods_match_scipy(seed):
    g = _random_graph(seed)
    k = [1, 3, 7, 16, 32][seed % 5]
    B = make_features(g, k)
    gold = spmm_scipy(g, B)
    methods = [("xla", {}), ("ell", {}), ("bcoo", {}),
               ("windowed", dict(tm=256, W=128, J=8, min_count=2,
                                 min_coverage=0.0))]
    for method, kw in methods:
        C = np.asarray(flex_tpu.spmm(g, jnp.asarray(B), method=method, **kw))
        assert C.shape == (g.m, k), (method, seed)
        chk = res_check(gold, C, g.degrees)
        assert chk.ok, f"{method} seed={seed} m={g.m} nnz={g.nnz} k={k}: {chk}"


def test_fuzz_empty_and_singleton():
    empty = CSRGraph.from_arrays(np.zeros(5, np.int64), np.zeros(0, np.int64),
                                 np.zeros(0, np.float32), name="empty")
    one = CSRGraph.from_coo([0], [0], [2.5], 1, name="one")
    for g in (empty, one):
        B = make_features(g, 4)
        gold = spmm_scipy(g, B)
        for method, kw in (("xla", {}), ("ell", {}),
                           ("windowed", dict(min_count=1, min_coverage=0.0))):
            C = np.asarray(flex_tpu.spmm(g, jnp.asarray(B), method=method,
                                         **kw))
            # res_check's gold-sanity guard rejects an all-zero gold by
            # design (reference flex.cu:4210) — compare directly here
            np.testing.assert_allclose(C, gold, rtol=1e-5, atol=1e-6,
                                       err_msg=f"{g.name} {method}")
