"""Synthetic graph generators.

The reference benchmarks six SNAP/GNN graphs (``README.md:13-20``) of which
only Pubmed ships in-tree; the rest are fetched externally.  With no network
egress we approximate the missing graphs with generators matched on
(n, nnz, structure):

- :func:`rmat_graph` — R-MAT / Kronecker power-law graphs (community structure,
  Reddit/Amazon-like).
- :func:`uniform_graph` — Erdős–Rényi-style uniform sparsity (worst case for
  tiling).
- :func:`banded_graph` — diagonal-band sparsity (best case; what RCM produces
  on mesh-like graphs).
"""
from __future__ import annotations

import numpy as np

from flex_tpu.sparse.csr import CSRGraph


def _dedupe_coo(rows, cols, m):
    keys = rows.astype(np.int64) * m + cols
    keys = np.unique(keys)
    return keys // m, keys % m


def rmat_graph(
    m: int,
    nnz_target: int,
    a: float = 0.45,
    b: float = 0.22,
    c: float = 0.22,
    seed: int = 0,
    name: str = "rmat",
) -> CSRGraph:
    """R-MAT (Chakrabarti et al., SDM'04) generator.  Defaults are softened
    from Graph500's (0.57/0.19/0.19): at Graph500 skew a Reddit-sized
    instance puts >95% of nnz in degree≥512 rows, far more extreme than the
    real GNN benchmark graphs (Reddit max-degree ≈ 21K at avg 100)."""
    rng = np.random.default_rng(seed)
    scale = int(np.ceil(np.log2(max(m, 2))))
    n_samples = int(nnz_target * 1.15) + 16  # oversample to survive dedupe

    rows = np.zeros(n_samples, dtype=np.int64)
    cols = np.zeros(n_samples, dtype=np.int64)
    p_ab = a + b
    p_abc = a + b + c
    for _ in range(scale):
        r = rng.random(n_samples)
        # Standard R-MAT quadrants: a=[0,a) top-left, b=[a,a+b) top-right
        # (sets the COLUMN bit), c=[a+b,a+b+c) bottom-left (sets the ROW
        # bit), d=rest bottom-right (sets both).  Round 1 had b/c swapped
        # (invisible at the b==c defaults; round-1 advisor, low).
        right = ((r >= a) & (r < p_ab)) | (r >= p_abc)
        down = r >= p_ab
        rows = rows * 2 + down
        cols = cols * 2 + right

    size = 1 << scale
    keep = (rows < m) & (cols < m)
    rows, cols = rows[keep], cols[keep]
    del size
    rows, cols = _dedupe_coo(rows, cols, m)
    if len(rows) > nnz_target:
        sel = rng.choice(len(rows), nnz_target, replace=False)
        sel.sort()
        rows, cols = rows[sel], cols[sel]
    vals = (2.0 * rng.random(len(rows)) - 1.0).astype(np.float32)
    return CSRGraph.from_coo(rows, cols, vals, m, name=name)


def uniform_graph(m: int, nnz_target: int, seed: int = 0, name: str = "uniform") -> CSRGraph:
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, m, int(nnz_target * 1.1) + 16)
    cols = rng.integers(0, m, len(rows))
    rows, cols = _dedupe_coo(rows, cols, m)
    if len(rows) > nnz_target:
        sel = rng.choice(len(rows), nnz_target, replace=False)
        sel.sort()
        rows, cols = rows[sel], cols[sel]
    vals = (2.0 * rng.random(len(rows)) - 1.0).astype(np.float32)
    return CSRGraph.from_coo(rows, cols, vals, m, name=name)


def banded_graph(
    m: int, bandwidth: int, avg_degree: float, seed: int = 0, name: str = "banded"
) -> CSRGraph:
    """Edges concentrated within ±bandwidth of the diagonal."""
    rng = np.random.default_rng(seed)
    nnz_target = int(m * avg_degree)
    rows = rng.integers(0, m, int(nnz_target * 1.2) + 16)
    off = rng.integers(-bandwidth, bandwidth + 1, len(rows))
    cols = np.clip(rows + off, 0, m - 1)
    rows, cols = _dedupe_coo(rows, cols, m)
    if len(rows) > nnz_target:
        sel = rng.choice(len(rows), nnz_target, replace=False)
        sel.sort()
        rows, cols = rows[sel], cols[sel]
    vals = (2.0 * rng.random(len(rows)) - 1.0).astype(np.float32)
    return CSRGraph.from_coo(rows, cols, vals, m, name=name)


def community_graph(
    m: int,
    nnz_target: int,
    n_comm: int = 41,
    intra_frac: float = 0.76,
    deg_sigma: float = 1.3,
    max_degree: int | None = None,
    comm_zipf: float = 0.8,
    seed: int = 0,
    name: str = "community",
    shuffle: bool = True,
) -> CSRGraph:
    """Degree-corrected planted-partition (SBM) generator.

    Produces an *undirected* (symmetric) graph with self-loops, heavy-tailed
    degrees, and ``n_comm`` communities of Zipf-distributed sizes where an
    ``intra_frac`` fraction of edge endpoints stay inside the source node's
    community (degree-weighted Chung-Lu endpoint selection both inside and
    across communities).

    Node ids are SHUFFLED when ``shuffle=True`` (the default): community
    structure exists in the topology but not in the vertex numbering, so a
    reordering pass (rabbit/gorder) must rediscover it — the same pipeline
    the reference applies to real graphs (DataLoader.cu:324-857).

    Calibration for the Reddit stand-in (see :func:`reddit_comm`):
    - The reference's Reddit CSR has 23,446,803 nnz = 2 x 11,606,919
      undirected edges + 232,965 self-loops — exactly the GraphSAINT/GNN
      Reddit graph (232,965 nodes, 11.6M edges, avg degree ~99.6).
    - n_comm=41: Reddit's 41 subreddit classes; community sizes are uneven
      (Zipf exponent 0.8 — assumption, the exact class-size histogram is
      not shipped with the reference).
    - intra_frac=0.76: published edge-label homophily for Reddit is
      ~0.75-0.78 in the GNN benchmark literature (assumption documented
      here; not tuned against any kernel).
    - deg_sigma=1.3 lognormal degree weights, clipped at max_degree
      (Reddit max degree is ~21.6K at avg ~100).
    """
    rng = np.random.default_rng(seed)
    # ---- communities: Zipf sizes, contiguous blocks pre-shuffle ----------
    sizes = (np.arange(1, n_comm + 1, dtype=np.float64)) ** (-comm_zipf)
    sizes = np.maximum((sizes / sizes.sum() * m).astype(np.int64), 1)
    sizes[0] += m - sizes.sum()  # exact total
    comm_of = np.repeat(np.arange(n_comm), sizes)  # node -> community
    comm_start = np.concatenate([[0], np.cumsum(sizes)])

    # ---- heavy-tailed Chung-Lu weights -----------------------------------
    w = rng.lognormal(mean=0.0, sigma=deg_sigma, size=m)
    if max_degree is None:
        max_degree = max(int(nnz_target / m * 200), 64)
    avg_und = max((nnz_target - m) // 2, 1) / m  # undirected edges per node
    w *= avg_und / w.mean()
    w = np.minimum(w, max_degree / 2)

    # ---- sample undirected edges (u, v), u != v ---------------------------
    E = max((nnz_target - m) // 2, 1)
    cumw = np.cumsum(w)
    total_w = cumw[-1]
    comm_cumw = [np.cumsum(w[comm_start[c]:comm_start[c + 1]])
                 for c in range(n_comm)]

    def draw_global(size):
        return np.searchsorted(cumw, rng.random(size) * total_w)

    def sample_pairs(n_samp):
        u = draw_global(n_samp)
        v = np.empty(n_samp, dtype=np.int64)
        intra = rng.random(n_samp) < intra_frac
        v[~intra] = draw_global(int((~intra).sum()))
        # intra endpoints: degree-weighted draw restricted to comm(u),
        # grouped per community → one vectorised searchsorted per group.
        cu = comm_of[u]
        for c in range(n_comm):
            sel = np.where(intra & (cu == c))[0]
            if not len(sel):
                continue
            cw = comm_cumw[c]
            v[sel] = comm_start[c] + np.searchsorted(
                cw, rng.random(len(sel)) * cw[-1])
        keep = u != v
        u, v = u[keep], v[keep]
        return np.minimum(u, v) * m + np.maximum(u, v)

    # Top-up loop: intra sampling collides inside small dense communities,
    # so a fixed oversample undershoots — keep sampling until E unique pairs.
    pair = np.unique(sample_pairs(int(E * 1.25) + 16))
    for _ in range(8):
        if len(pair) >= E:
            break
        extra = sample_pairs(int((E - len(pair)) * 2.5) + 16)
        pair = np.unique(np.concatenate([pair, extra]))
    if len(pair) > E:
        sel = rng.choice(len(pair), E, replace=False)
        sel.sort()
        pair = pair[sel]
    return _sym_from_pairs(pair, m, rng, shuffle, name)


def _sym_from_pairs(pair, m, rng, shuffle, name) -> CSRGraph:
    """Unordered pair keys (a*m+b) → symmetric CSR with unit self-loops and
    identical values in both directions."""
    a, b = pair // m, pair % m
    pv = (2.0 * rng.random(len(pair)) - 1.0).astype(np.float32)
    rows = np.concatenate([a, b, np.arange(m)])
    cols = np.concatenate([b, a, np.arange(m)])
    vals = np.concatenate([pv, pv, np.ones(m, np.float32)])
    if shuffle:
        perm = rng.permutation(m)
        rows, cols = perm[rows], perm[cols]
    return CSRGraph.from_coo(rows, cols, vals, m, name=name)


def hub_graph(
    m: int,
    nnz_target: int,
    n_hub_cols: int = 512,
    hub_frac: float = 0.9,
    seed: int = 0,
    name: str = "hub",
) -> CSRGraph:
    """Hub-concentrated column skew: ``hub_frac`` of all edges point at
    ``n_hub_cols`` popular columns (Zipf within the hub set), the rest
    uniform.  The structure of bipartite recommendation / citation-hub
    graphs after a DEG column ordering — and the family where the
    ``panel`` dense-A strategy legitimately wins: per-panel unique
    columns collapse to ≲ n_hub_cols, so B-reuse is ~deg·tm/n_hub_cols
    while ELL still pays per-nnz gather (docs/measurements.md)."""
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, m, int(nnz_target * 1.15) + 16)
    is_hub = rng.random(len(rows)) < hub_frac
    zipf_w = 1.0 / np.arange(1, n_hub_cols + 1) ** 0.8
    cols = np.where(
        is_hub,
        rng.choice(n_hub_cols, len(rows), p=zipf_w / zipf_w.sum()),
        rng.integers(0, m, len(rows)),
    )
    rows, cols = _dedupe_coo(rows, cols, m)
    if len(rows) > nnz_target:
        sel = rng.choice(len(rows), nnz_target, replace=False)
        sel.sort()
        rows, cols = rows[sel], cols[sel]
    vals = (2.0 * rng.random(len(rows)) - 1.0).astype(np.float32)
    return CSRGraph.from_coo(rows, cols, vals, m, name=name)


# (n, nnz) matched to README.md:13-20 dataset table.
def reddit_like(seed: int = 0) -> CSRGraph:
    """Reddit-scale R-MAT stand-in: 232,965 rows, ~23.4M nnz."""
    return rmat_graph(232_965, 23_446_803, seed=seed, name="reddit_like")


def bipartite_projection_graph(
    m: int,
    nnz_target: int,
    n_comm: int = 41,
    cross: float = 0.128,
    act_mean: float = 6.0,
    act_sigma: float = 0.9,
    act_max: int = 256,
    pop_sigma: float = 1.5,
    comm_zipf: float = 0.8,
    seed: int = 0,
    name: str = "biproj",
    shuffle: bool = True,
) -> CSRGraph:
    """Union-of-cliques graph from a bipartite user→post projection — the
    documented generative process of the Reddit GNN dataset (GraphSAGE:
    nodes are posts, linked when the same user comments on both, i.e. each
    user induces a clique over the posts they touched).

    This is the structure that makes dense-tile SpMM win on real Reddit:
    cliques → triangle-dense neighborhoods → reordering can expose dense
    blocks.  A flat SBM (``community_graph``) has ~zero clustering and
    information-theoretically cannot produce dense tiles under ANY
    permutation, so it understates every reordering-based kernel (ours and
    the reference's alike).

    Model: posts belong to ``n_comm`` Zipf-sized subreddits with lognormal
    popularity weights; each user has a lognormal activity (number of posts
    commented, clipped to [2, act_max]) and a home subreddit; every comment
    lands in the home subreddit except with probability ``cross``
    (cross-posting → inter-community edges; (1-cross)^2 ≈ target edge
    homophily).  Users are added until the unique-pair count reaches the
    undirected-edge target, then trimmed (<10% — slight clique erosion,
    same as real co-comment dedup).

    Node ids are shuffled by default; see :func:`reddit_posts` for the
    calibrated Reddit stand-in.
    """
    rng = np.random.default_rng(seed)
    sizes = (np.arange(1, n_comm + 1, dtype=np.float64)) ** (-comm_zipf)
    sizes = np.maximum((sizes / sizes.sum() * m).astype(np.int64), 1)
    sizes[0] += m - sizes.sum()
    comm_start = np.concatenate([[0], np.cumsum(sizes)])

    w = rng.lognormal(0.0, pop_sigma, m)  # post popularity
    cumw_all = np.cumsum(w)
    comm_cumw = [np.cumsum(w[comm_start[c]:comm_start[c + 1]])
                 for c in range(n_comm)]
    comm_w_tot = np.array([cw[-1] for cw in comm_cumw])
    comm_p = comm_w_tot / comm_w_tot.sum()

    E = max((nnz_target - m) // 2, 1)
    # expected unique pairs per user ≈ E[a(a-1)]/2 pre-dedup; start below
    # target and top up (clique overlap makes dedup loss graph-dependent).
    mean_pairs = float(np.mean(
        (a := np.clip(rng.lognormal(np.log(act_mean), act_sigma, 4096),
                      2, act_max).astype(np.int64)) * (a - 1) / 2))
    batch_users = max(int(E * 0.7 / mean_pairs), 64)

    def user_batch(U):
        a = np.clip(rng.lognormal(np.log(act_mean), act_sigma, U),
                    2, act_max).astype(np.int64)
        home = rng.choice(n_comm, U, p=comm_p)
        T = int(a.sum())
        user_of = np.repeat(np.arange(U), a)
        is_cross = rng.random(T) < cross
        draws = np.empty(T, np.int64)
        n_cross = int(is_cross.sum())
        draws[is_cross] = np.searchsorted(
            cumw_all, rng.random(n_cross) * cumw_all[-1])
        hc = home[user_of]
        for c in range(n_comm):
            sel = np.where(~is_cross & (hc == c))[0]
            if not len(sel):
                continue
            cw = comm_cumw[c]
            draws[sel] = comm_start[c] + np.searchsorted(
                cw, rng.random(len(sel)) * cw[-1])
        # expand each user's posts into clique pairs, grouped by activity so
        # each group is one vectorised triu expansion
        starts = np.concatenate([[0], np.cumsum(a)])
        out = []
        for av in np.unique(a):
            us = np.where(a == av)[0]
            mat = draws[starts[us][:, None] + np.arange(av)[None, :]]
            iu, ju = np.triu_indices(av, 1)
            p1, p2 = mat[:, iu].ravel(), mat[:, ju].ravel()
            keep = p1 != p2
            out.append(np.minimum(p1, p2)[keep] * m
                       + np.maximum(p1, p2)[keep])
        return np.concatenate(out)

    pair = np.unique(user_batch(batch_users))
    for _ in range(12):
        if len(pair) >= E:
            break
        need = E - len(pair)
        more = user_batch(max(int(batch_users * need / max(E, 1) * 1.3), 64))
        pair = np.unique(np.concatenate([pair, more]))
    if len(pair) > E:
        sel = rng.choice(len(pair), E, replace=False)
        sel.sort()
        pair = pair[sel]
    return _sym_from_pairs(pair, m, rng, shuffle, name)


def reddit_comm(seed: int = 0) -> CSRGraph:
    """Reddit stand-in with *community structure* (the R-MAT proxy lacks
    it, and the reference's whole speedup story — reordering densifying
    tiles — rides on it).  Calibration documented in
    :func:`community_graph`; sizes match the reference CSR exactly
    (232,965 nodes, 23,446,803 nnz incl. self-loops)."""
    return community_graph(
        232_965, 23_446_803, n_comm=41, intra_frac=0.76,
        deg_sigma=1.3, max_degree=21_657, seed=seed, name="reddit_comm",
    )


def reddit_posts(seed: int = 0) -> CSRGraph:
    """Primary Reddit stand-in: bipartite user→post projection matching the
    dataset's documented construction (GraphSAGE §: posts linked by shared
    commenters).  Calibration:
    - sizes exact: 232,965 nodes, 23,446,803 nnz (= 11,606,919 undirected
      edges x2 + self-loops — the reference CSR's exact decomposition);
    - 41 subreddit communities, Zipf sizes; (1-cross)^2 ≈ 0.76 edge
      homophily (published Reddit label homophily ~0.75-0.78);
    - measured avg local clustering ≈ 0.5-0.6 (union-of-cliques), the
      signature of co-comment graphs, vs ~0 for the SBM/R-MAT proxies;
    - lognormal post popularity: heavy-tail degrees (max ~20K at avg 100.6,
      real max 21,657).
    Not tuned against any kernel: parameters set by the stats above only."""
    return bipartite_projection_graph(
        232_965, 23_446_803, n_comm=41, cross=0.128,
        act_mean=6.0, act_sigma=0.9, act_max=256, pop_sigma=1.5,
        seed=seed, name="reddit_posts",
    )


def amazon_posts(seed: int = 0) -> CSRGraph:
    """Amazon stand-in with community structure: co-purchase projection
    (products linked when bought together — the documented construction
    of the GNN Amazon/ogbn-products datasets), same union-of-cliques
    process as :func:`reddit_posts`.  Sizes match the reference CSR
    (1,569,960 nodes, 264,339,468 nnz); 47 communities (ogbn-products
    class count), (1-cross)^2 ≈ 0.81 edge homophily (published
    ogbn-products label homophily ~0.81); activity/popularity tails give
    avg degree ~168 with a ~10K max.  Not tuned against any kernel."""
    return bipartite_projection_graph(
        1_569_960, 264_339_468, n_comm=47, cross=0.1,
        act_mean=7.0, act_sigma=0.9, act_max=256, pop_sigma=1.5,
        seed=seed, name="amazon_posts",
    )


def yelp_like(seed: int = 0) -> CSRGraph:
    return rmat_graph(716_847, 13_954_819, seed=seed, name="yelp_like")


def yelp_comm(seed: int = 0) -> CSRGraph:
    """Yelp stand-in with community structure: the GraphSAINT Yelp graph
    is a user *friendship* network (716,847 users, avg degree ~19.5), so
    the SBM generator fits better than a bipartite projection.
    Calibration: sizes exact; 100 communities with Zipf sizes (Yelp's
    100 business-category labels are multilabel, so the community count
    is an assumption, documented here); intra_frac 0.7 (social networks'
    typical assortativity; no published structural homophily for this
    split — assumption, not tuned against any kernel)."""
    return community_graph(
        716_847, 13_954_819, n_comm=100, intra_frac=0.7,
        deg_sigma=1.2, seed=seed, name="yelp_comm",
    )


def flickr_like(seed: int = 0) -> CSRGraph:
    return rmat_graph(89_250, 989_006, seed=seed, name="flickr_like")


def flickr_posts(seed: int = 0) -> CSRGraph:
    """Flickr stand-in: the GraphSAINT Flickr graph links images sharing
    properties (common tags/groups — a tag x image bipartite projection),
    so the union-of-cliques generator applies.  Calibration: sizes exact
    (89,250 nodes, 989,006 nnz, avg degree ~10.1); 7 communities
    (Flickr's 7 classes); cross 0.25 (published Flickr label homophily is
    low, ~0.32; (1-cross)^2 ≈ 0.56 upper-bounds it at the community
    level — structural homophily exceeds label homophily here since the
    7 labels are coarse).  Not tuned against any kernel."""
    return bipartite_projection_graph(
        89_250, 989_006, n_comm=7, cross=0.25,
        act_mean=3.5, act_sigma=0.8, act_max=64, pop_sigma=1.4,
        seed=seed, name="flickr_posts",
    )


def ppi_like(seed: int = 0) -> CSRGraph:
    return rmat_graph(14_755, 458_973, seed=seed, name="ppi_like")


def ppi_comm(seed: int = 0) -> CSRGraph:
    """PPI proxy (reference README.md:16: 14,755 nodes / 458,973 nnz).
    The GraphSAGE PPI dataset is 24 DISJOINT tissue graphs (~615 nodes
    each) — block structure, no cross-tissue edges — hence
    intra_frac=1.0 over 24 communities.  Sizes exact; within-tissue
    degree shape is the generator's lognormal default (assumption,
    documented; not tuned against any kernel)."""
    return community_graph(
        14_755, 458_973, n_comm=24, intra_frac=1.0, comm_zipf=0.3,
        seed=seed, name="ppi_comm",
    )


def amazon_like(seed: int = 0) -> CSRGraph:
    return rmat_graph(1_569_960, 264_339_468, seed=seed, name="amazon_like")
