"""Break the windowed tPre into its component device costs and A/B the
cheap variants (int16 vs int32 slot table; .add vs .set dense scatter).

Serial-chain methodology (docs/measurements.md round-3): each timed op is
wrapped in a jitted fori_loop whose iteration i+1 consumes a
data-dependent zero from iteration i's output, timed at two chain
lengths with the delta taken — repeated identical dispatches are not
reliably serialized by the relay.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
sys.path.insert(0, "/root/repo")

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR, rows_from_row_ptr
from flex_tpu.ops.window_spmm import window_select, sel_device_tables
from flex_tpu.bench.harness import _sync


def chain_time(body, y0, lo=2, hi=6):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(y, *, n):
        return jax.lax.fori_loop(0, n, body, y)

    ts = {}
    for n in (lo, hi):
        _sync(chain(y0, n=n))
        t0 = time.perf_counter()
        _sync(chain(y0, n=n))
        ts[n] = time.perf_counter() - t0
    return max((ts[hi] - ts[lo]) / (hi - lo), 1e-9)


def main():
    d = np.load("/tmp/reddit_posts_rbdeg_v3.npz")
    g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                             name="reddit", order="RBD")
    dev = DeviceCSR.from_graph(g)
    _sync(dev.vals)
    tm, W, mc, G = 256, 128, 64, 4
    sel = window_select(g, tm=tm, W=W, min_count=mc, dev=dev)
    tabs = sel_device_tables(sel)
    nnz, m = g.nnz, g.m
    nblk, n_res, S = sel["nblk"], sel["n_res"], sel["total_steps"]
    a_elems = S * tm * G * W
    print(f"cov={sel['coverage']:.3f} n_res={n_res} steps={S}", flush=True)

    slot16 = tabs["slot"]
    slot32 = slot16.astype(jnp.int32)
    pstep0 = tabs["pstep0"]

    # --- component: rows recovery + keys + slot gather -------------------
    def mk_gather(slot_tab):
        def body(i, y):
            off = jnp.minimum(y, 0).astype(jnp.int32)
            rows = rows_from_row_ptr(dev.row_ptr, nnz, m)
            key = (rows // tm) * nblk + (dev.col + off) // W
            j1 = slot_tab[key].astype(jnp.int32)
            return jnp.max(j1)
        return body

    t16 = chain_time(mk_gather(slot16), jnp.int32(0))
    t32 = chain_time(mk_gather(slot32), jnp.int32(0))
    print(f"slot gather int16: {t16*1e3:.0f} ms   int32: {t32*1e3:.0f} ms",
          flush=True)

    # shared precomputation for the scatter components (cost excluded)
    rows = rows_from_row_ptr(dev.row_ptr, nnz, m)
    p = rows // tm
    blk = dev.col // W
    j1 = slot32[p * nblk + blk]
    hit = j1 > 0
    j = j1 - 1
    flat = jnp.where(
        hit,
        (pstep0[p] + j // G) * (tm * G * W)
        + (rows % tm) * (G * W) + (j % G) * W + dev.col % W,
        a_elems).block_until_ready()
    miss_cum = jnp.cumsum((~hit).astype(jnp.int32))
    pos = jnp.where(hit, n_res, miss_cum - 1).block_until_ready()

    # --- component: dense scatter (add vs set) ---------------------------
    def mk_dense(mode):
        def body(i, y):
            v = dev.vals + jnp.minimum(y, 0.0)
            ref = jnp.zeros((a_elems,), jnp.float32)
            A = (ref.at[flat].add(v, mode="drop") if mode == "add"
                 else ref.at[flat].set(v, mode="drop"))
            return A[0] * 1e-9
        return body

    for mode in ("add", "set"):
        t = chain_time(mk_dense(mode), jnp.float32(0.0), lo=1, hi=3)
        print(f"dense scatter {mode}: {t*1e3:.0f} ms", flush=True)

    # --- component: residue compaction scatter + pack gather -------------
    def comp_body(i, y):
        off = jnp.minimum(y, 0).astype(jnp.int32)
        src = jnp.zeros((n_res,), jnp.int32).at[pos + off].set(
            jnp.arange(nnz, dtype=jnp.int32), mode="drop")
        return jnp.max(src)

    t = chain_time(comp_body, jnp.int32(0), lo=1, hi=3)
    print(f"compaction scatter: {t*1e3:.0f} ms", flush=True)

    packed = jnp.stack(
        [dev.col, jax.lax.bitcast_convert_type(dev.vals, jnp.int32)],
        axis=1).block_until_ready()
    res_src = jnp.zeros((n_res,), jnp.int32).at[pos].set(
        jnp.arange(nnz, dtype=jnp.int32), mode="drop").block_until_ready()

    def pack_body(i, y):
        off = jnp.minimum(y, 0).astype(jnp.int32)
        rp = packed[res_src + off]
        return jnp.max(rp)

    t = chain_time(pack_body, jnp.int32(0), lo=2, hi=6)
    print(f"residue pack gather: {t*1e3:.0f} ms", flush=True)

    # --- alternative: direct packed 2-wide scatter (replaces scatter(src)
    #     + gather(packed) with one scatter of [nnz,2]) ------------------
    def direct_body(i, y):
        off = jnp.minimum(y, 0).astype(jnp.int32)
        rp = jnp.zeros((n_res, 2), jnp.int32).at[pos + off].set(
            packed, mode="drop")
        return jnp.max(rp)

    t = chain_time(direct_body, jnp.int32(0), lo=1, hi=3)
    print(f"direct packed scatter: {t*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
