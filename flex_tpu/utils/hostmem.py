"""Host allocator tuning for large numpy temporaries.

On this host (single-core VM, demand-paged memory) faulting NEW pages
runs at ~55 MB/s, so a fresh 1 GB ufunc temporary costs 1-30 s
(erratic).  glibc's default M_MMAP_THRESHOLD serves every >=128 KB
allocation with mmap and munmaps it on free, so EVERY large temporary
re-faults its pages: measured `a*7+b` at 264M int32 = 1.3-30 s
allocating vs 0.5 s in-place (docs/measurements.md, round-3 host
section).  Keeping large buffers on the heap (mmap disabled, trim
disabled) pays the fault once and reuses the pages forever after:
the same op settles at ~0.5 s from the second call on.

The reference framework faces the same class of problem on the CUDA
side and solves it with a persistent arena (``cuda_alloc_cpy``,
``DataLoader.cu:167-218``); this is the host-side analog for the
O(nnz) preprocessing passes.
"""
from __future__ import annotations

import ctypes
import os

_done = False

# glibc mallopt parameter numbers (glibc malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_MAX = -4


def tune_host_malloc() -> bool:
    """Disable glibc's mmap-and-return path for large allocations.

    Idempotent; no-ops (returns False) on non-glibc platforms or when
    ``FLEX_TPU_NO_MALLOC_TUNE`` is set.  Safe to call after startup:
    mallopt adjusts the dynamic thresholds for subsequent allocations.
    """
    global _done
    if _done:
        return True
    if os.environ.get("FLEX_TPU_NO_MALLOC_TUNE"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = bool(libc.mallopt(_M_TRIM_THRESHOLD, ctypes.c_int(2**31 - 1)))
        ok = bool(libc.mallopt(_M_MMAP_MAX, 0)) and ok
    except OSError:
        return False
    _done = ok
    return ok
