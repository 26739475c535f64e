"""Test configuration: force an 8-virtual-device CPU platform.

Must run before any jax import (hence top of conftest): multi-chip sharding
tests use a virtual mesh, per the driver's dryrun contract.
"""
import os

# Hard-set (not setdefault): the machine env pins JAX_PLATFORMS=axon (TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The machine's sitecustomize pre-imports jax (axon TPU plugin), so the env
# var alone is ignored; override through the live config too.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest

from flex_tpu.io import load_csv
from flex_tpu.io.synth import rmat_graph

PUBMED = "/root/reference/data/pubmed.csv"
A_MAT = "/root/reference/data/a_mat.csv"


@pytest.fixture(scope="session")
def pubmed():
    return load_csv(PUBMED)


@pytest.fixture(scope="session")
def a_mat():
    return load_csv(A_MAT)


@pytest.fixture(scope="session")
def small_rmat():
    return rmat_graph(2048, 32768, seed=3, name="small_rmat")


@pytest.fixture
def rng():
    return np.random.default_rng(42)
