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


def test_classify_op():
    from flex_tpu.utils.trace import classify_op

    assert classify_op("gather.123") == "gather"
    assert classify_op("dynamic-update-slice-scatter.4") == "scatter"
    assert classify_op("custom-call.7") == "dot"
    assert classify_op("loop_add_fusion.2") == "other"


def test_standing_columns(tmp_path):
    """VERDICT r04 item 8: fmt pad ratio + per-op-class trace time are
    STANDING columns — present in every windowed sweep row's dict, the
    CLI one-liner, and the CSV."""
    from flex_tpu.bench.harness import bench_spmm, write_csv, _fmt
    from flex_tpu.io.synth import community_graph
    from flex_tpu.reorder import reorder

    g = reorder(community_graph(1024, 24_000, n_comm=4, seed=0),
                "rbdeg", check=False)
    r = bench_spmm(g, 16, method="windowed", iters=2, trace=True,
                   tm=128, min_count=2)
    assert r.check.ok
    row = r.row()
    # format-inflation counters (the Imb% counterpart)
    assert row["fmt_pad_ratio"] >= 1.0
    assert 0 < row["fmt_step_fill"] <= 1.0
    assert 0 < row["fmt_dense_occ"] <= 1.0
    # per-op-class measured trace time
    assert row.get("trace_device_ms", 0) > 0
    line = _fmt(r)
    assert "pad=" in line and "trace=" in line
    p = tmp_path / "rows.csv"
    write_csv([r], str(p))
    hdr = p.read_text().splitlines()[0]
    assert "fmt_pad_ratio" in hdr and "trace_device_ms" in hdr
