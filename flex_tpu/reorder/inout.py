"""Ordering file I/O (reference ``inout.cu:20-37``): persist a computed
vertex order so expensive passes (gorder/rabbit on Amazon-scale graphs) run
once and are reloaded afterwards."""
from __future__ import annotations

import numpy as np


def save_order(perm: np.ndarray, path: str) -> None:
    np.save(path if path.endswith(".npy") else path + ".npy",
            np.asarray(perm, dtype=np.int64))


def load_order(path: str) -> np.ndarray:
    perm = np.load(path if path.endswith(".npy") else path + ".npy")
    from flex_tpu.sparse.perm import invert_permutation

    invert_permutation(perm)  # validate bijection on load
    return perm.astype(np.int64)
