"""Rabbit ordering: modularity-based clustering.

Re-implementation of the reference's ``DataLoaderRabbit``
(``DataLoader.cu:455-655``), which follows Shiokawa'13 (iterative serial) /
Arai'16 (rabbit) with unit edge weights:

- Build an undirected multigraph with unit weights (self-loops dropped; if
  the input is directed, edges are mirrored).
- Rounds: visit current vertices in degree-ascending order; merge u into the
  neighbor v maximising ΔQ = w(u,v) − deg(u)·deg(v)/(2m) (shyness=1); record
  the merge in a dendrogram.
- Final order = dendrogram leaves, communities emitted in surviving-root
  index order (hub grouping/sorting off, matching the reference defaults).

Pure-Python fallback; :mod:`flex_tpu.reorder.native` has the C++ version.
"""
from __future__ import annotations

import numpy as np

from flex_tpu.sparse.csr import CSRGraph


def order_rabbit(
    g: CSRGraph, max_rounds: int = 64, use_native: bool | None = None,
    want_labels: bool = False,
):
    """Rabbit permutation; with ``want_labels``, also returns
    labels[old_vertex] = cluster id in emission order."""
    n = g.m
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return (z, z.copy()) if want_labels else z

    if use_native is None:
        from flex_tpu.reorder import native

        use_native = native.available()
    if use_native:
        from flex_tpu.reorder import native

        return native.order_rabbit_native(
            g.row_ptr, g.col, not g.pattern_is_symmetric, max_rounds,
            want_labels=want_labels,
        )

    # Unit-weight undirected adjacency maps (DataLoader.cu:512-534).
    adj: list[dict[int, int]] = [dict() for _ in range(n)]
    force_undirected = not g.pattern_is_symmetric
    rows = np.repeat(np.arange(n, dtype=np.int64), g.degrees)
    for u, d in zip(rows.tolist(), g.col.tolist()):
        if u == d:
            continue
        adj[u][d] = 1
        if force_undirected:
            adj[d][u] = 1

    deg = np.array([len(a) for a in adj], dtype=np.int64)
    n_edges = int(deg.sum())
    if n_edges == 0:
        ident = np.arange(n, dtype=np.int64)
        return (ident, ident.copy()) if want_labels else ident
    two_m_inv = 1.0 / (2.0 * n_edges)

    # Dendrogram: tree[v] is a nested structure of vertex ids.
    tree: list = list(range(n))
    alive = np.ones(n, dtype=bool)
    round_of = np.zeros(n, dtype=np.int64)

    this_round = list(range(n))
    for rnd in range(1, max_rounds + 1):
        this_round.sort(key=lambda i: deg[i])
        next_round: list[int] = []
        for u in this_round:
            if not alive[u] or round_of[u] == rnd:
                continue
            au = adj[u]
            if not au:
                continue
            dv_2m = deg[u] * two_m_inv
            # argmax ΔQ over neighbors (DataLoader.cu:545-551); the reference
            # iterates an ordered map with strict >, i.e. ties prefer the
            # smallest neighbor id — reproduce that rule explicitly so the
            # C++ native (unordered_map) agrees.
            best_dq, v = -1.0, -1
            for d, w in au.items():
                dq = w - deg[d] * dv_2m
                if dq > best_dq or (dq == best_dq and d < v):
                    best_dq, v = dq, d
            if best_dq <= 0 or v < 0:
                continue

            # Merge u into v (DataLoader.cu:553-576).
            av = adj[v]
            deg[v] += deg[u]
            for d, w in au.items():
                if d == v:
                    continue
                av[d] = av.get(d, 0) + w
                ad = adj[d]
                if u in ad:
                    ad[v] = ad.get(v, 0) + ad.pop(u)
            av.pop(u, None)
            tree[v] = (tree[v], tree[u])
            tree[u] = None
            alive[u] = False

            if round_of[v] != rnd:
                round_of[v] = rnd
                next_round.append(v)
        if not next_round:
            break
        this_round = next_round

    # Emit leaves: surviving clusters in vertex-index order, left-to-right
    # within each dendrogram (v's subtree before u's, like leaves_apply).
    perm = np.empty(n, dtype=np.int64)
    labels = np.empty(n, dtype=np.int64)
    pos = 0
    cluster = -1
    for r in range(n):
        if not alive[r]:
            continue
        cluster += 1
        stack = [tree[r]]
        while stack:
            node = stack.pop()
            if isinstance(node, tuple):
                stack.append(node[1])  # right (u) after left (v)
                stack.append(node[0])
            else:
                labels[node] = cluster
                perm[pos] = node
                pos += 1
    assert pos == n, (pos, n)
    return (perm, labels) if want_labels else perm


def modularity(g: CSRGraph, communities: np.ndarray) -> float:
    """Newman modularity of a community assignment on the undirected
    unit-weight version of g (diagnostic; the reference prints Q after
    clustering, ``DataLoader.cu:648-652``)."""
    n = g.m
    from flex_tpu.sparse.csr import repeat_arange
    rows = repeat_arange(g.degrees, total=g.nnz)
    cols = g.col.astype(np.int64)
    mask = rows != cols
    rows, cols = rows[mask], cols[mask]
    if not g.pattern_is_symmetric:
        rows, cols = np.concatenate([rows, cols]), np.concatenate([cols, rows])
        keys = np.unique(rows * n + cols)
        rows, cols = keys // n, keys % n
    m2 = len(rows)
    if m2 == 0:
        return 0.0
    deg = np.bincount(rows, minlength=n)
    same = communities[rows] == communities[cols]
    e_in = same.sum() / m2
    dc = np.bincount(communities, weights=deg.astype(np.float64))
    exp = float((dc**2).sum()) / (m2 * m2)
    return float(e_in - exp)
