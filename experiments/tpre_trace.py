"""Trace one WARM fused windowed prepare and print the per-op-class
device-time table (VERDICT r04 next #3 follow-up: the scatter2/scatter
variants measured out — scatter2 OOMs beside the 6.4 GB dense array and
plain scatter is 2x the fused build — so cutting tPre below the <10
target needs to know where the fused build's ~1.19 s actually goes;
the round-3 component table accounts for only ~0.6 s).

PYTHONPATH=/root/repo:$PYTHONPATH python experiments/tpre_trace.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

from flex_tpu.utils import enable_compile_cache

enable_compile_cache()
import numpy as np

from flex_tpu.bench.harness import _sync
from flex_tpu.ops.window_spmm import prepare_windowed, window_select
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR
from flex_tpu.utils.trace import format_trace_table, trace, trace_table

GiB = 1 << 30


def log(msg, _t0=time.time()):
    print(f"[{time.time()-_t0:6.0f}s] {msg}", flush=True)


def main():
    d = np.load("/tmp/reddit_posts_rbdeg_v3.npz")
    g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                             name="reddit_posts", order="RBD")
    log("uploading CSR...")
    dev = DeviceCSR.from_graph(g)
    _sync((dev.row_ptr, dev.col, dev.vals))
    log("selecting...")
    sel = window_select(g, tm=256, W=128, min_count=64, dev=dev,
                        max_dense_bytes=6 * GiB)
    log(f"selection: cov={sel['coverage']:.4f}")

    # cold pass: compile + table upload
    t0 = time.time()
    plan = prepare_windowed(g, dev=dev, min_count=64,
                            max_dense_bytes=6 * GiB, sel=sel, fused=True)
    _sync(plan.__dict__)
    log(f"cold prepare {time.time()-t0:.1f}s")
    del plan

    # warm timed pass under the profiler
    logdir = "/tmp/tpre_trace"
    with trace(logdir):
        t0 = time.time()
        plan = prepare_windowed(g, dev=dev, min_count=64,
                                max_dense_bytes=6 * GiB, sel=sel,
                                fused=True)
        _sync(plan.__dict__)
        warm = time.time() - t0
    log(f"warm tPre {warm:.3f}s; parsing trace...")
    rows = trace_table(logdir)
    print(format_trace_table(rows, top=20), flush=True)
    total = sum(r.get("total_ms", 0.0) for r in rows
                if not r["op"].startswith("jit_"))
    print(f"trace op-total: {total:.1f} ms vs wall {warm*1e3:.0f} ms",
          flush=True)

    # on-chip res_check (CLAUDE.md: mandatory for build-path changes)
    import jax.numpy as jnp

    from flex_tpu.io import make_features
    from flex_tpu.ops.ref import spmm_scipy
    from flex_tpu.utils.check import res_check
    B = make_features(g, 128)
    chk = res_check(np.asarray(plan(jnp.asarray(B))), spmm_scipy(g, B),
                    g.degrees)
    print(f"res_check: {chk}", flush=True)
    print("ALL-DONE", flush=True)


if __name__ == "__main__":
    main()
