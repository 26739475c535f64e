"""Trace parsing (the measured side of the reference's NPerf counter
join, flex.cu:5082-5132) — VERDICT r02 item 5: `--trace` must produce a
table, not just a directory."""
import numpy as np
import jax
import jax.numpy as jnp

from flex_tpu.utils.trace import (
    format_trace_table, trace, trace_summary, trace_table,
)


def test_trace_table_parses_ops(tmp_path):
    d = str(tmp_path / "tr")
    with trace(d):
        x = jnp.ones((256, 256))
        y = jax.jit(lambda a: (a @ a + 1.0).sum())(x)
        np.asarray(y)
    rows = trace_table(d)
    assert rows, "no ops parsed from trace"
    names = " ".join(r["op"] for r in rows)
    assert "dot" in names or "fusion" in names.lower(), names
    assert all(r["total_ms"] >= 0 for r in rows)
    # formatted table renders
    txt = format_trace_table(rows)
    assert "total ms" in txt and len(txt.splitlines()) >= 2
    s = trace_summary(d)
    assert s["device_total_ms"] > 0
    assert s["top_ops"][0]["total_ms"] == rows[0]["total_ms"]


def test_trace_table_empty_dir(tmp_path):
    assert trace_table(str(tmp_path)) == []


def test_bench_spmm_trace_columns(tmp_path):
    from flex_tpu.bench.harness import bench_spmm
    from flex_tpu.io.synth import rmat_graph

    g = rmat_graph(512, 8_000, seed=3, name="t")
    r = bench_spmm(g, 16, method="ell", iters=2,
                   trace_dir=str(tmp_path / "tr"))
    assert r.check.ok
    assert r.extra.get("trace_device_ms", 0) > 0
    assert "trace_vs_model" in r.extra
