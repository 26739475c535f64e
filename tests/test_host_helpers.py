"""The indicator+cumsum host helpers must be exact drop-ins for
np.repeat(np.arange, counts) / np.repeat(values, counts) — they replace
it everywhere O(nnz) host passes matter (np.repeat with per-element
counts measured ~1.5M elem/s on this host, ~100x below bandwidth)."""
import numpy as np
import pytest

from flex_tpu.sparse.csr import indicator_cumsum, repeat_arange, repeat_values


@pytest.mark.parametrize("counts", [
    [3, 0, 2, 1],
    [0, 0, 5],
    [4],
    [0],
    [],
    [1] * 100,
])
def test_repeat_arange_matches_numpy(counts):
    counts = np.asarray(counts, dtype=np.int64)
    expect = np.repeat(np.arange(len(counts)), counts)
    np.testing.assert_array_equal(repeat_arange(counts), expect)


def test_repeat_arange_random():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 7, 5000)
    expect = np.repeat(np.arange(5000), counts)
    got = repeat_arange(counts, dtype=np.int32)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, expect)


def test_repeat_values_matches_numpy():
    rng = np.random.default_rng(1)
    counts = rng.integers(0, 5, 300)
    values = rng.standard_normal(300).astype(np.float32)
    np.testing.assert_array_equal(repeat_values(values, counts),
                                  np.repeat(values, counts))


def test_indicator_cumsum_segments():
    # segment starts (with an empty segment: duplicate start offsets)
    starts = np.array([3, 3, 5])  # segs: [0,3), [3,3), [3,5), [5,8)
    got = indicator_cumsum(starts, 8)
    np.testing.assert_array_equal(got, [0, 0, 0, 2, 2, 3, 3, 3])


def test_host_panel_key_matches_naive():
    from flex_tpu.io.synth import community_graph
    from flex_tpu.ops.window_spmm import _host_panel_key

    g = community_graph(2048, 120_000, n_comm=4, seed=3)
    tm, W = 256, 128
    P, nblk = -(-g.m // tm), -(-g.n // W)
    key, rp = _host_panel_key(g, tm, W, P, nblk)
    rows = np.repeat(np.arange(g.m, dtype=np.int64), g.degrees)
    naive = (rows // tm) * np.int64(nblk) + g.col.astype(np.int64) // W
    np.testing.assert_array_equal(key.astype(np.int64), naive)
    np.testing.assert_array_equal(rp, g.row_ptr)


def test_host_panel_key_non_pow2_W():
    from flex_tpu.io.synth import rmat_graph
    from flex_tpu.ops.window_spmm import _host_panel_key

    g = rmat_graph(512, 4_000, seed=2)
    tm, W = 96, 24  # non-power-of-two widths take the divide path
    P, nblk = -(-g.m // tm), -(-g.n // W)
    key, _ = _host_panel_key(g, tm, W, P, nblk)
    rows = np.repeat(np.arange(g.m, dtype=np.int64), g.degrees)
    naive = (rows // tm) * np.int64(nblk) + g.col.astype(np.int64) // W
    np.testing.assert_array_equal(key.astype(np.int64), naive)
