"""Device-mesh helpers.

The reference is strictly single-GPU (``flex.cu:4134-4137`` picks one
device); its intra-chip work distribution (per-SM queues + atomic stealing,
``mat.cu:1104-1162``) has no cross-chip analog.  The TPU build scales out
instead via ``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives over
ICI (BASELINE.json config 5; SURVEY.md §5.8).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))
