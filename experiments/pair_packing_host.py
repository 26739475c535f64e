"""Host study: column-pair/quad packing factor for gather descriptors.

The residue chain is gather-DESCRIPTOR-bound (~215 M rows/s regardless of
row bytes, docs/measurements.md).  If two residue nnz of the same row
share col>>1, a single gather of a pair-packed B2[c>>1] = [B[2c'],
B[2c'+1]] (1024 B row at k=128) serves both — the descriptor count drops
by the pairing factor.  This script measures, entirely on host:

  - residue (windowed mc=64, the headline config): nnz / distinct
    (row, col>>s) groups for s = 1, 2 — the descriptor-reduction factor
    of pair- and quad-packing;
  - the same for the FULL graph (the pure-ELL k=32 path, VERDICT r04
    item 4);
  - the padded-slot count under the existing width-bucket ladder when
    chunks are built over groups instead of nnz (what the ELL layout
    would actually gather).

Run: python experiments/pair_packing_host.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")  # TPU may be busy (one process)

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.ops.ell_spmm import DEFAULT_WIDTHS, ell_padded_nnz


def group_stats(row_ptr, col, shift, tag):
    """Distinct (row, col>>shift) groups, counting per-row via sorted-
    adjacent compare (cols are sorted within rows)."""
    nnz = len(col)
    g = col >> shift if shift else col
    # group boundary: first entry of a row, or g change within the row
    same_row = np.ones(nnz, dtype=bool)
    same_row[row_ptr[1:-1][(row_ptr[1:-1] > 0) & (row_ptr[1:-1] < nnz)]] = \
        False
    same_row[0] = False
    new_grp = np.empty(nnz, dtype=bool)
    new_grp[0] = True
    np.not_equal(g[1:], g[:-1], out=new_grp[1:])
    np.logical_or(new_grp, ~same_row, out=new_grp)
    n_groups = int(new_grp.sum())
    # group degree per row = windowed sum of new_grp
    cs = np.empty(nnz + 1, np.int64)
    cs[0] = 0
    np.cumsum(new_grp, out=cs[1:])
    gdeg = cs[row_ptr[1:]] - cs[row_ptr[:-1]]
    padded = ell_padded_nnz(gdeg, DEFAULT_WIDTHS)
    print(f"  {tag} s={shift}: groups {n_groups/1e6:.2f}M "
          f"(factor {nnz/max(n_groups,1):.3f}), padded slots "
          f"{padded/1e6:.2f}M (vs nnz {nnz/1e6:.2f}M)")
    return n_groups, padded


def main():
    d = np.load("/tmp/reddit_posts_rbdeg_v3.npz")
    row_ptr, col = d["row_ptr"].astype(np.int64), d["col"].astype(np.int32)
    m, nnz = len(row_ptr) - 1, len(col)
    g = CSRGraph.from_arrays(row_ptr, col, d["vals"], name="reddit_posts",
                             order="RBD")
    print(f"graph: m={m}, nnz={nnz}")

    deg = np.diff(row_ptr)
    base_padded = ell_padded_nnz(deg, DEFAULT_WIDTHS)
    print(f"full graph (pure ELL): padded {base_padded/1e6:.2f}M")
    for s in (1, 2):
        group_stats(row_ptr, col, s, "full")

    # headline residue: windowed selection at the pinned capture config
    from flex_tpu.ops.window_spmm import window_select

    sel = window_select(g, tm=256, W=128, min_count=64, dev=None,
                        max_dense_bytes=6 << 30)
    print(f"selection: coverage {sel['coverage']:.3f}, "
          f"n_res {sel['n_res']/1e6:.2f}M, mc_eff {sel['min_count_eff']}")
    res_deg = sel["res_deg"]
    print(f"residue padded (current ladder): "
          f"{ell_padded_nnz(res_deg, DEFAULT_WIDTHS)/1e6:.2f}M")

    # rebuild residue col stream on host: entries whose slot == 0
    from flex_tpu.ops.window_spmm import _host_panel_key

    key_h, _ = _host_panel_key(g, 256, 128, sel["P"], sel["nblk"])
    mask = sel["slot"][key_h] == 0
    res_col = col[mask]
    cs = np.empty(nnz + 1, np.int64)
    cs[0] = 0
    np.cumsum(mask.astype(np.int64), out=cs[1:])
    res_row_ptr = cs[row_ptr]
    for s in (1, 2):
        group_stats(res_row_ptr, res_col, s, "residue")


if __name__ == "__main__":
    main()
