"""ctypes bindings + lazy build for the C++ reordering natives.

Compiles ``_native/reorder.cc`` with g++ on first use.  The cache key is a
content hash of the source embedded in the library filename, so a stale or
foreign-ISA binary can never be picked up (round-1 advisor: a committed
``-march=native`` .so could SIGILL on a different host — binaries are now
gitignored, built with -mtune only, and keyed by source hash).  Every entry
point has a pure-Python fallback, so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "_native", "reorder.cc")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_DIR, "_native", f"libflexreorder-{h}.so")


def _build(lib_path: str) -> None:
    # -mtune (not -march): tuned for this host but ISA-portable, so a stray
    # binary copied between machines cannot SIGILL.
    cmd = [
        "g++", "-O3", "-mtune=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", lib_path,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            lib_path = _lib_path()
            if not os.path.exists(lib_path):
                _build(lib_path)
            lib = ctypes.CDLL(lib_path)
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            lib.flex_order_dfs.argtypes = [ctypes.c_int64, i64p, i32p, i64p]
            lib.flex_order_gorder.argtypes = [
                ctypes.c_int64, i64p, i32p, i64p, i32p, ctypes.c_int64, i64p,
            ]
            lib.flex_order_rabbit.argtypes = [
                ctypes.c_int64, i64p, i32p, ctypes.c_int32, ctypes.c_int64,
                i64p, i64p,
            ]
            _lib = lib
        except Exception as e:  # toolchain missing / compile failure
            _build_error = str(e)
        return _lib


def available() -> bool:
    return _load() is not None


def order_dfs_native(row_ptr: np.ndarray, col: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    n = len(row_ptr) - 1
    out = np.empty(n, dtype=np.int64)
    lib.flex_order_dfs(
        n, np.ascontiguousarray(row_ptr, np.int64),
        np.ascontiguousarray(col, np.int32), out,
    )
    return out


def order_gorder_native(
    out_rp: np.ndarray, out_col: np.ndarray,
    in_rp: np.ndarray, in_col: np.ndarray, window: int,
) -> np.ndarray:
    lib = _load()
    assert lib is not None
    n = len(out_rp) - 1
    out = np.empty(n, dtype=np.int64)
    lib.flex_order_gorder(
        n,
        np.ascontiguousarray(out_rp, np.int64),
        np.ascontiguousarray(out_col, np.int32),
        np.ascontiguousarray(in_rp, np.int64),
        np.ascontiguousarray(in_col, np.int32),
        window, out,
    )
    return out


def order_rabbit_native(
    row_ptr: np.ndarray, col: np.ndarray, force_undirected: bool,
    max_rounds: int = 64, want_labels: bool = False,
):
    """Returns perm, or (perm, labels) with labels[old_vertex] = cluster id
    in emission order when ``want_labels``."""
    lib = _load()
    assert lib is not None
    n = len(row_ptr) - 1
    out = np.empty(n, dtype=np.int64)
    labels = np.empty(n, dtype=np.int64)
    lib.flex_order_rabbit(
        n, np.ascontiguousarray(row_ptr, np.int64),
        np.ascontiguousarray(col, np.int32),
        1 if force_undirected else 0, max_rounds, out, labels,
    )
    return (out, labels) if want_labels else out
