import numpy as np
import jax.numpy as jnp
import pytest

from flex_tpu.bench.autotune import suggest
from flex_tpu.io import make_features
from flex_tpu.io.synth import banded_graph, uniform_graph
from flex_tpu.ops.pallas_band import prepare_band
from flex_tpu.ops.ref import spmm_scipy
from flex_tpu.utils.check import res_check


@pytest.mark.parametrize("impl", ["pallas2", "xla", "pallas"])
def test_band_matches_scipy(impl):
    g = banded_graph(1024, 96, 12.0, seed=4)
    B = make_features(g, 32)
    plan = prepare_band(g, tm=128, impl=impl)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, f"{impl}: {chk}"


def test_band_refuses_scattered():
    g = uniform_graph(2048, 16384, seed=1)
    with pytest.raises(ValueError):
        prepare_band(g)


def test_band_row_spanning_windows():
    # windows that differ per panel and overflow past n
    g = banded_graph(600, 64, 8.0, seed=7)  # m not a multiple of tm
    B = make_features(g, 16)
    plan = prepare_band(g, tm=256, min_density=0.005)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, chk


def test_suggest_band():
    g = banded_graph(4096, 128, 32.0, seed=5)
    s = suggest(g)
    assert s.method == "band", s


@pytest.mark.parametrize("impl", ["pallas2", "xla"])
def test_band_trailing_empty_panels(impl):
    """Regression (round-1 advisor, high): trailing empty panels made the
    clamped reduceat drop the last nonzero from the final nonempty panel's
    window, scattering it into another row's output with no error."""
    from flex_tpu.sparse.csr import CSRGraph

    m, tm = 768, 256
    rng = np.random.default_rng(0)
    # Rows 0..511 dense-ish near the diagonal; rows 512.. empty (zero-degree
    # tail, as DEG ordering produces).  Last nonzero at (511, 400): outside
    # the understated 128-wide window the buggy stats computed.
    rows = np.repeat(np.arange(512), 4)
    cols = rng.integers(0, 64, rows.shape)
    rows = np.append(rows, 511)
    cols = np.append(cols, 400)
    vals = np.ones(len(rows), np.float32)
    g = CSRGraph.from_coo(rows, cols, vals, m, name="trailing_empty")
    B = make_features(g, 16)
    plan = prepare_band(g, tm=tm, min_density=0.001, impl=impl)
    C = np.asarray(plan(jnp.asarray(B)))
    chk = res_check(spmm_scipy(g, B), C, g.degrees)
    assert chk.ok, f"{impl}: {chk}"
    assert np.all(C[512:] == 0.0)
