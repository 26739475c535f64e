"""Round-3: trace the windowed format build to find where its 1.02 s go
(2 scatters modeled at ~0.27 s each; measured build is ~2x that).

Uses the new trace_table machinery on a traced _build_windowed dispatch.

  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/profile_build.py
"""
from __future__ import annotations

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

from flex_tpu.bench.harness import _sync
from flex_tpu.ops.window_spmm import (
    _build_windowed, sel_device_tables, window_select,
)
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR
from flex_tpu.utils.trace import format_trace_table, trace, trace_table


def main():
    d = np.load("/tmp/reddit_posts_rbdeg_v3.npz")
    g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                             name="reddit_posts", order="RBD")
    dev = DeviceCSR.from_graph(g)
    _sync(dev.vals)
    sel = window_select(g, dev=dev)
    tabs = sel_device_tables(sel)
    _sync(tabs)
    layout = (g.nnz, g.m, 256, 128, sel["nblk"], sel["n_res"],
              sel["total_steps"], sel["G"], sel.get("unique_rc", False))

    def build():
        return _build_windowed(dev.row_ptr, dev.col, dev.vals,
                               tabs["slot"], tabs["pstep0"], layout=layout)

    _sync(build())  # compile + warm
    _sync(build())
    with trace("/tmp/trace_build"):
        _sync(build())
    rows = trace_table("/tmp/trace_build")
    print(format_trace_table(rows, top=20), flush=True)
    print(f"total device: {sum(r['total_ms'] for r in rows):.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
