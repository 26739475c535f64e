"""flex_tpu — a TPU-native sparse×dense matrix-multiply (SpMM) framework.

A from-scratch JAX / Pallas / XLA re-design of the capabilities of the
CUDA research framework guohaoqiang/Flex (see /root/reference):

  C[m, k] = A[m, n] @ B[n, k]      A sparse (graph adjacency, CSR), B dense.

Components (mirrors SURVEY.md §2's inventory, re-architected TPU-first):

- :mod:`flex_tpu.sparse`   — CSR container, graph statistics, permutation
  machinery (reference: ``DataLoader.cu``).
- :mod:`flex_tpu.io`       — 3-line CSV loader, MTX converter, synthetic graph
  generators (reference: ``DataLoader.cu:19-84``, ``data/SuiteSparse/mtx2csr.cc``).
- :mod:`flex_tpu.reorder`  — vertex orderings: DFS / Rabbit / DEG / RCM / Gorder
  (reference: ``DataLoader.cu:324-857``, ``order_*.cu``).
- :mod:`flex_tpu.tiling`   — CSR → MXU-friendly blocked formats + occupancy /
  data-volume analytics (reference: ``mat.cu``).
- :mod:`flex_tpu.ops`      — SpMM kernels: XLA gather/segment baseline, Pallas
  BSR-on-MXU, Pallas row-panel gather kernel, fused GCN layer
  (reference: ``flex.cu`` kernels v4…v36, ``cusp.cu``).
- :mod:`flex_tpu.parallel` — multi-chip row-sharded SpMM over an ICI mesh via
  ``shard_map`` (new, per BASELINE.json config 5).
- :mod:`flex_tpu.models`   — GCN model family built on the fused ops.
- :mod:`flex_tpu.bench`    — benchmark harness: timing, GFLOP/s, error check,
  roofline model, autotuner (reference: ``flex.cu:run()``).
"""

__version__ = "0.1.0"

from flex_tpu.utils.hostmem import tune_host_malloc

# keep large numpy temporaries on the heap (fault once, reuse forever);
# without this every O(nnz) allocating ufunc pass re-faults its pages at
# ~55 MB/s on this host — see utils/hostmem.py and docs/measurements.md
tune_host_malloc()

from flex_tpu.sparse.csr import CSRGraph  # noqa: F401
from flex_tpu.ops import spmm  # noqa: F401
