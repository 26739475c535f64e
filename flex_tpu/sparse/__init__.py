from flex_tpu.sparse.csr import CSRGraph, GraphStats
from flex_tpu.sparse.perm import apply_vertex_order, check_permutation_invariants

__all__ = [
    "CSRGraph",
    "GraphStats",
    "apply_vertex_order",
    "check_permutation_invariants",
]
