"""Device-resident CSR arrays.

The analog of the reference's ``DataLoader::cuda_alloc_cpy``
(``DataLoader.cu:167-218``): the raw CSR is shipped to the device once per
graph and reused by every format build and kernel.  The host→device tunnel
in this environment moves ~35 MB/s (docs/measurements.md), so *all* heavy
format conversion happens on-device from these arrays; preprocessing (tPre)
never re-uploads nnz-sized data.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from flex_tpu.sparse.csr import CSRGraph


@dataclasses.dataclass(frozen=True)
class DeviceCSR:
    row_ptr: jax.Array  # int32[m+1]
    col: jax.Array      # int32[nnz]
    vals: jax.Array     # float32[nnz]
    m: int
    n: int
    nnz: int

    @staticmethod
    def from_graph(g: CSRGraph) -> "DeviceCSR":
        assert g.nnz < 2**31, "int32 CSR limit"
        return DeviceCSR(
            row_ptr=jnp.asarray(g.row_ptr.astype(np.int32)),
            col=jnp.asarray(g.col.astype(np.int32)),
            vals=jnp.asarray(g.vals),
            m=g.m, n=g.n, nnz=g.nnz,
        )


def round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def rows_from_row_ptr(row_ptr, nnz: int, m: int):
    """Recover per-nnz row ids from a device row_ptr with the
    indicator-cumsum trick — `jnp.searchsorted` over nnz-sized arrays is
    ~200x slower on this chip (docs/measurements.md)."""
    ind = jnp.zeros((nnz,), jnp.int32).at[row_ptr[1:m]].add(1, mode="drop")
    return jnp.cumsum(ind)
