import numpy as np
import pytest

from flex_tpu.io import load_csv, make_features, save_csv
from flex_tpu.io.synth import banded_graph, rmat_graph, uniform_graph
from flex_tpu.sparse.csr import CSRGraph


def test_a_mat_shape(a_mat):
    # data/a_mat.csv: 48-row hand-check matrix (SURVEY.md §4.5).
    assert a_mat.m == 48
    assert a_mat.nnz == int(a_mat.row_ptr[-1])
    assert a_mat.col.max() < a_mat.n


def test_pubmed_shape(pubmed):
    # README.md:13-20: Pubmed n=19717, nnz=108365.
    assert pubmed.m == 19717
    assert pubmed.nnz == 108365
    assert pubmed.label_width == 3


def test_pubmed_stats(pubmed):
    s = pubmed.stats
    # Pubmed citation graph is stored symmetrised in this format.
    assert s.n_edges_one_way >= 0
    assert s.n_nodes_zero_deg <= pubmed.m
    assert pubmed.degrees.sum() == pubmed.nnz


def test_roundtrip(tmp_path, a_mat):
    p = tmp_path / "x.csv"
    save_csv(a_mat, str(p))
    g2 = load_csv(str(p))
    np.testing.assert_array_equal(g2.row_ptr, a_mat.row_ptr)
    np.testing.assert_array_equal(g2.col, a_mat.col)
    np.testing.assert_allclose(g2.vals, a_mat.vals, rtol=1e-6)


def test_no_vals_line(tmp_path):
    p = tmp_path / "amazon.csv"
    with open(p, "w") as f:
        f.write("0,2,3\n")
        f.write("1,2,0\n")
    g = load_csv(str(p))
    assert g.m == 2 and g.nnz == 3
    assert np.all(np.abs(g.vals) <= 1.0)


def test_features(pubmed):
    B = make_features(pubmed, 32)
    assert B.shape == (pubmed.n, 32)
    assert B.dtype == np.float32
    dbg = make_features(pubmed, 4, debug=True)
    np.testing.assert_array_equal(dbg[:, 0], np.arange(pubmed.n))


@pytest.mark.parametrize(
    "gen", [lambda: rmat_graph(512, 4096), lambda: uniform_graph(512, 4096),
            lambda: banded_graph(512, 16, 8.0)]
)
def test_synth_valid(gen):
    g = gen()
    assert g.m == 512
    assert np.all(np.diff(g.row_ptr) >= 0)
    assert g.col.max() < g.n
    # columns sorted within rows (from_coo lexsorts)
    rows = np.repeat(np.arange(g.m), g.degrees)
    order = np.lexsort((g.col, rows))
    np.testing.assert_array_equal(order, np.arange(g.nnz))


def test_from_coo_matches_scipy():
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    r = rng.integers(0, 64, 300)
    c = rng.integers(0, 64, 300)
    v = rng.random(300).astype(np.float32)
    # dedupe for exact comparison
    keys = r * 64 + c
    _, idx = np.unique(keys, return_index=True)
    r, c, v = r[idx], c[idx], v[idx]
    g = CSRGraph.from_coo(r, c, v, 64)
    ref = sp.coo_matrix((v, (r, c)), shape=(64, 64)).tocsr()
    np.testing.assert_array_equal(g.row_ptr, ref.indptr)
    np.testing.assert_array_equal(g.col, ref.indices)
    np.testing.assert_allclose(g.vals, ref.data)


def test_rmat_quadrant_orientation():
    """b (top-right) must drive the column bit: with b >> c the mass sits in
    the upper triangle, i.e. col > row on average (round-1 advisor, low)."""
    from flex_tpu.io.synth import rmat_graph

    g = rmat_graph(4096, 60_000, a=0.45, b=0.40, c=0.05, seed=2)
    rows = np.repeat(np.arange(g.m), np.diff(g.row_ptr))
    upper_frac = float((g.col > rows).mean())
    assert upper_frac > 0.6, upper_frac


def test_community_graph():
    """Planted-partition proxy: exact nnz, symmetric pattern+values,
    measurable homophily near the target, shuffled ids hide the structure."""
    from flex_tpu.io.synth import community_graph

    m, nnz = 6000, 300_000
    g = community_graph(m, nnz, n_comm=10, intra_frac=0.76, seed=3,
                        shuffle=False)
    assert g.nnz == nnz
    sp = g.to_scipy()
    assert abs(sp - sp.T).nnz == 0  # symmetric incl. values
    assert np.all(sp.diagonal() == 1.0)  # self-loops
    # homophily against the (unshuffled) contiguous community blocks
    sizes = np.arange(1, 11.0) ** -0.8
    sizes = np.maximum((sizes / sizes.sum() * m).astype(np.int64), 1)
    sizes[0] += m - sizes.sum()
    comm_of = np.repeat(np.arange(10), sizes)
    rows = np.repeat(np.arange(m), np.diff(g.row_ptr))
    intra = float((comm_of[rows] == comm_of[g.col]).mean())
    assert 0.55 < intra < 0.95, intra

    g2 = community_graph(m, nnz, n_comm=10, seed=3, shuffle=True)
    assert g2.nnz == nnz
    rows2 = np.repeat(np.arange(m), np.diff(g2.row_ptr))
    # shuffled ids: contiguous-block homophily collapses to ~random
    intra2 = float((comm_of[rows2] == comm_of[g2.col]).mean())
    assert intra2 < intra - 0.2, (intra, intra2)


def test_pattern_is_symmetric():
    """Exact structural-symmetry detection (rabbit's force_undirected
    gate): symmetric pattern with asymmetric VALUES is still
    pattern-symmetric; one missing reverse edge breaks it; in-degree
    mismatch takes the early exit."""
    from flex_tpu.sparse.csr import CSRGraph

    def make(pairs, m, vals=None):
        rows = np.array([p[0] for p in pairs], np.int64)
        cols = np.array([p[1] for p in pairs], np.int64)
        v = np.asarray(vals, np.float32) if vals is not None \
            else np.ones(len(pairs), np.float32)
        return CSRGraph.from_coo(rows, cols, v, m, name="t")

    sym = make([(0, 1), (1, 0), (1, 2), (2, 1), (2, 2)], 3)
    assert sym.pattern_is_symmetric
    assert sym.stats.n_edges_one_way == 0

    # same pattern, asymmetric values: pattern-symmetric, value-asymmetric
    symv = make([(0, 1), (1, 0), (1, 2), (2, 1)], 3,
                vals=[1.0, 2.0, 3.0, 3.0])
    assert symv.pattern_is_symmetric
    assert symv.stats.n_edges_asymmetric == 2  # the 1.0/2.0 pair, both ways

    # a one-way edge whose endpoints still have matching in/out degrees
    # (0->1, 1->2, 2->0 cycle): must NOT pass the in-degree early exit
    cyc = make([(0, 1), (1, 2), (2, 0)], 3)
    assert not cyc.pattern_is_symmetric
    assert cyc.stats.n_edges_one_way == 3

    asym = make([(0, 1), (1, 0), (2, 1)], 3)
    assert not asym.pattern_is_symmetric
    assert asym.stats.n_edges_one_way == 1

    empty = CSRGraph.from_arrays(np.zeros(4, np.int64),
                                 np.zeros(0, np.int64),
                                 np.zeros(0, np.float32), name="e")
    assert empty.pattern_is_symmetric


def test_stats_match_bruteforce_random():
    """stats' sorted-query searchsorted path must agree with a brute-force
    set computation on random directed graphs (incl. duplicate-free
    asymmetric-value cases)."""
    from flex_tpu.sparse.csr import CSRGraph

    rng = np.random.default_rng(4)
    for trial in range(5):
        m = 60
        nnz = 400
        rows = rng.integers(0, m, nnz)
        cols = rng.integers(0, m, nnz)
        keep = np.unique(rows * m + cols)  # duplicate-free
        rows, cols = keep // m, keep % m
        vals = rng.integers(1, 4, len(rows)).astype(np.float32)
        g = CSRGraph.from_coo(rows, cols, vals, m, name="r")
        pairs = {(int(r), int(c)): float(v)
                 for r, c, v in zip(rows, cols, vals)}
        one_way = sum(1 for (r, c) in pairs if (c, r) not in pairs)
        asym = sum(1 for (r, c), v in pairs.items()
                   if (c, r) in pairs and pairs[(c, r)] != v)
        s = g.stats
        assert s.n_edges_one_way == one_way, trial
        assert s.n_edges_asymmetric == asym, trial
        assert g.pattern_is_symmetric == (one_way == 0), trial

        # shuffled-within-row variant: exercises the unsorted-fwd_keys
        # argsort fallback in stats and the fwd.sort() branch of
        # pattern_is_symmetric (raw-loader graphs keep file order)
        col_s = g.col.copy()
        val_s = g.vals.copy()
        for r in range(m):
            a, b = g.row_ptr[r], g.row_ptr[r + 1]
            p = rng.permutation(b - a)
            col_s[a:b] = g.col[a:b][p]
            val_s[a:b] = g.vals[a:b][p]
        gs = CSRGraph.from_arrays(g.row_ptr, col_s, val_s, name="shuf")
        assert gs.stats.n_edges_one_way == one_way, trial
        assert gs.stats.n_edges_asymmetric == asym, trial
        assert gs.pattern_is_symmetric == (one_way == 0), trial
