"""Build `pysrc` — a REAL (non-generated) graph from data present in this
image (VERDICT r04 missing #2 / next-round #5: every large graph so far
was a calibrated synthetic proxy; no network egress exists to fetch
SuiteSparse, so the one source of real large-scale relational data on
this machine is the installed Python distribution itself).

Construction (documented for the headline table):
  nodes  = every *.py file under /opt/venv/lib and /usr/lib/python3.12
           (~30K real source files);
  edges  = co-occurrence projection: files i,j are linked when they share
           a "rare" identifier (regex [A-Za-z_]\\w{2,}, document frequency
           2..DF_MAX) — the same shared-commenter projection the GNN
           Reddit dataset uses for posts.  Edge weight = number of shared
           rare identifiers.

The result is a genuine empirical community graph (packages cluster:
their modules share private names) whose degree tail, clustering, and
community structure were NOT chosen by any generator — exactly the
property the proxy-robustness study could not supply.  Written as a real
MatrixMarket file and ingested through io/mtx.py (the mtx2csr.cc parity
path, reference data/SuiteSparse/mtx2csr.cc:1-115).

Run: python experiments/build_pysrc_graph.py [out.mtx]
"""
from __future__ import annotations

import os
import re
import sys
import time

import numpy as np

DF_MAX = 24        # identifiers shared by more files are stopwords here
FILE_CAP = 400_000  # max identifiers kept per file (guards generated code)
ROOTS = ("/opt/venv/lib", "/usr/lib/python3.12")
TOKEN = re.compile(rb"[A-Za-z_][A-Za-z0-9_]{2,}")


def collect_files():
    files = []
    for root in ROOTS:
        for dirpath, _dirs, names in os.walk(root):
            for nm in names:
                if nm.endswith(".py"):
                    files.append(os.path.join(dirpath, nm))
    files.sort()  # deterministic node ids
    return files


def main(out_path="/tmp/pysrc.mtx"):
    t0 = time.time()
    files = collect_files()
    print(f"{len(files)} real source files", flush=True)

    # pass 1+2 fused: intern identifiers per file, build (token, file)
    # postings via a token->id dict; memory ~ total distinct pairs
    tok_ids: dict[bytes, int] = {}
    pair_tok: list[np.ndarray] = []
    pair_file: list[np.ndarray] = []
    for fi, path in enumerate(files):
        try:
            with open(path, "rb") as f:
                data = f.read(4 << 20)  # 4 MB per file is plenty of signal
        except OSError:
            continue
        seen = set(TOKEN.findall(data)[:FILE_CAP])
        if not seen:
            continue
        ids = np.empty(len(seen), np.int64)
        for j, tk in enumerate(seen):
            v = tok_ids.get(tk)
            if v is None:
                v = len(tok_ids)
                tok_ids[tk] = v
            ids[j] = v
        pair_tok.append(ids)
        pair_file.append(np.full(len(ids), fi, np.int64))
        if fi % 5000 == 0:
            print(f"  scanned {fi} files, {len(tok_ids)} tokens, "
                  f"{sum(len(p) for p in pair_tok)/1e6:.1f}M pairs "
                  f"({time.time()-t0:.0f}s)", flush=True)
    tok = np.concatenate(pair_tok)
    fil = np.concatenate(pair_file)
    del pair_tok, pair_file
    n_tok = len(tok_ids)
    tok_ids.clear()
    print(f"{n_tok} tokens, {len(tok)/1e6:.1f}M (token,file) pairs "
          f"({time.time()-t0:.0f}s)", flush=True)

    # document frequency filter: keep tokens with 2 <= df <= DF_MAX
    df = np.bincount(tok, minlength=n_tok)
    keep = (df >= 2) & (df <= DF_MAX)
    mask = keep[tok]
    tok, fil = tok[mask], fil[mask]
    print(f"kept {keep.sum()} rare tokens, {len(tok)/1e6:.1f}M pairs",
          flush=True)

    # group by token: sort pairs by token id, then emit all (fi, fj) pairs
    # within each token's file list (df <= DF_MAX bounds the blowup)
    order = np.argsort(tok, kind="stable")
    tok, fil = tok[order], fil[order]
    starts = np.flatnonzero(np.r_[True, tok[1:] != tok[:-1]])
    ends = np.r_[starts[1:], len(tok)]
    rows, cols = [], []
    for s, e in zip(starts, ends):
        grp = fil[s:e]
        d = e - s
        if d < 2:
            continue
        ii, jj = np.triu_indices(d, k=1)
        rows.append(grp[ii])
        cols.append(grp[jj])
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    del rows, cols
    print(f"{len(r)/1e6:.1f}M raw co-occurrence pairs "
          f"({time.time()-t0:.0f}s)", flush=True)

    # dedupe with weights, symmetrize
    m = len(files)
    key = np.minimum(r, c) * m + np.maximum(r, c)
    key, w = np.unique(key, return_counts=True)
    r, c = key // m, key % m
    sel = r != c
    r, c, w = r[sel], c[sel], w[sel]
    print(f"{len(r)/1e6:.2f}M unique undirected edges "
          f"-> nnz {2*len(r)/1e6:.2f}M ({time.time()-t0:.0f}s)", flush=True)

    # write a real MatrixMarket file (symmetric, integer weights)
    with open(out_path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate integer symmetric\n")
        f.write(f"% pysrc: file-file shared-rare-identifier projection\n")
        f.write(f"% over {m} real Python source files (see "
                f"experiments/build_pysrc_graph.py)\n")
        f.write(f"{m} {m} {len(r)}\n")
        # lower triangle per the MM symmetric convention
        lo_r, lo_c = np.maximum(r, c) + 1, np.minimum(r, c) + 1
        arr = np.column_stack([lo_r, lo_c, w])
        np.savetxt(f, arr, fmt="%d")
    print(f"wrote {out_path} ({os.path.getsize(out_path)/1e6:.0f} MB, "
          f"{time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
