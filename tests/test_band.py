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
