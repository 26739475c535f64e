"""Tracing / profiling helpers.

The reference collects CUPTI hardware counters through NPerf (registered
metrics + a replay loop that re-launches kernels until all counters are
sampled, ``flex.cu:4583-4656, 5082-5085``) and per-warp clock timings
(``flex.cu:36-79, 5087-5132``), then joins them into derived columns
(``flex.cu:5505-5688``).  The TPU-native equivalents (SURVEY.md §5.1):

- :func:`trace` — a ``jax.profiler`` trace context writing a Perfetto/
  TensorBoard trace directory (hardware counters come from the profile, not
  from replayed launches).
- :func:`trace_table` / :func:`trace_summary` — parse the trace's XPlane
  protobuf into measured per-op device times (the NPerf "measured
  counters → table" step; round-3, VERDICT r02 item 5).  The bench
  harness joins these with its static byte-model columns so
  measured-vs-model deviation is visible per run.
- :class:`StageTimer` — wall-clock stage accounting with relay-safe syncs
  (the tPre/tElap split and the per-stage tables).
- Load-imbalance analytics are *static* on TPU (no persistent-kernel work
  stealing): ``tiling.stats.TileStats.panel_nnz_imbalance`` plays the role
  of the reference's measured Imb%.
"""
from __future__ import annotations

import contextlib
import glob
import os
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/flex_tpu_trace"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


_SKIP_PREFIXES = ("end:", "ThreadpoolListener", "TaskDispatcher",
                  "$", "process_")


def _newest_xplane(log_dir: str) -> str | None:
    files = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    return max(files, key=os.path.getmtime) if files else None


def trace_table(log_dir: str) -> list[dict]:
    """Parse the newest ``.xplane.pb`` under ``log_dir`` into measured
    per-op device times: ``[{op, count, total_ms, avg_us}, ...]`` sorted by
    total time descending.

    Device events are taken from planes whose name mentions a device
    (``/device:TPU:…``) and, as a fallback, from XLA-runtime lines
    (``tf_…Client``) so interpret-mode/CPU traces parse too.  This is the
    measured side of the reference's NPerf counter join
    (``flex.cu:5082-5132``)."""
    from jax.profiler import ProfileData

    path = _newest_xplane(log_dir)
    if path is None:
        return []
    agg: dict[str, list[float]] = {}

    def eat(line):
        for ev in line.events:
            name = ev.name
            if any(name.startswith(p) for p in _SKIP_PREFIXES):
                continue
            ent = agg.setdefault(name, [0, 0.0])
            ent[0] += 1
            ent[1] += ev.duration_ns

    data = ProfileData.from_file(path)
    planes = list(data.planes)
    dev_planes = [p for p in planes
                  if "TPU" in p.name or "/device:" in p.name.lower()]
    if dev_planes:
        for plane in dev_planes:
            for line in plane.lines:
                eat(line)
    else:  # CPU backend: XLA client lines live inside the host plane
        for plane in planes:
            for line in plane.lines:
                if line.name.startswith("tf_"):
                    eat(line)
    rows = [
        {"op": op, "count": c, "total_ms": round(ns / 1e6, 4),
         "avg_us": round(ns / 1e3 / max(c, 1), 2)}
        for op, (c, ns) in agg.items()
    ]
    rows.sort(key=lambda r: -r["total_ms"])
    return rows


# HLO-name → op-class buckets for the measured-side join (the reference
# derives per-kernel-class columns from NPerf counters the same way,
# flex.cu:5505-5688).  XLA leaves gathers unfused (docs/measurements.md:
# it refuses to fuse them into consumers), so they appear as standalone
# "gather.N" events; the Pallas MXU kernels are custom-calls.
_OP_CLASSES = (
    ("gather", ("gather",)),
    ("scatter", ("scatter",)),
    ("dot", ("dot", "custom-call", "convolution", "pallas")),
    ("copy", ("copy", "transpose", "reshape", "concatenate")),
)


def classify_op(name: str) -> str:
    low = name.lower()
    for cls, keys in _OP_CLASSES:
        if any(key in low for key in keys):
            return cls
    return "other"


def trace_summary(log_dir: str, top: int = 12) -> dict:
    """Roll a :func:`trace_table` up into the columns the bench harness
    reports: total measured device ms, per-op-class ms (gather / scatter /
    dot / copy — the measured attribution the reference gets from NPerf
    counters), and the top ops.

    NB (round-4 methodology): XPlane ``copy-start`` rows are async DMA
    that OVERLAPS compute, so ``device_total_ms`` over-counts wall time —
    per-op rows are for attribution; serial-chain timing is for totals."""
    rows = trace_table(log_dir)
    total = sum(r["total_ms"] for r in rows)
    by_class: dict[str, float] = {}
    for r in rows:
        cls = classify_op(r["op"])
        by_class[cls] = by_class.get(cls, 0.0) + r["total_ms"]
    return {
        "device_total_ms": round(total, 3),
        "class_ms": {c: round(v, 3) for c, v in by_class.items()},
        "top_ops": rows[:top],
    }


def format_trace_table(rows: list[dict], top: int = 12) -> str:
    lines = [f"{'op':<48s} {'count':>6s} {'total ms':>10s} {'avg us':>9s}"]
    for r in rows[:top]:
        lines.append(f"{r['op'][:48]:<48s} {r['count']:>6d} "
                     f"{r['total_ms']:>10.3f} {r['avg_us']:>9.2f}")
    return "\n".join(lines)


class StageTimer:
    """Accumulates named wall-clock stages; device stages must pass their
    output through ``sync`` to defeat async dispatch."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:  # a raising stage still records its elapsed time
            self.stages[name] = (self.stages.get(name, 0.0)
                                 + time.perf_counter() - t0)

    @staticmethod
    def sync(out):
        from flex_tpu.bench.harness import _sync

        _sync(out)
        return out

    def report(self) -> str:
        total = sum(self.stages.values()) or 1e-12
        lines = [f"{k:>20s}: {v*1e3:10.2f} ms ({v/total:6.1%})"
                 for k, v in self.stages.items()]
        lines.append(f"{'total':>20s}: {total*1e3:10.2f} ms")
        return "\n".join(lines)
