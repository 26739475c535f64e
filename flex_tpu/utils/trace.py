"""Tracing / profiling helpers.

The reference collects CUPTI hardware counters through NPerf and per-warp
clock timings (``flex.cu:4583-4656, 36-79, 5087-5132``).  The TPU-native
equivalents (SURVEY.md §5.1):

- :func:`trace` — a ``jax.profiler`` trace context writing a Perfetto/
  TensorBoard trace directory (hardware counters come from the profile, not
  from replayed launches).
- :class:`StageTimer` — wall-clock stage accounting with relay-safe syncs
  (the tPre/tElap split and the per-stage tables).
- Load-imbalance analytics are *static* on TPU (no persistent-kernel work
  stealing): ``tiling.stats.TileStats.panel_nnz_imbalance`` plays the role
  of the reference's measured Imb%.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/flex_tpu_trace"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates named wall-clock stages; device stages must pass their
    output through ``sync`` to defeat async dispatch."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    @staticmethod
    def sync(out):
        from flex_tpu.bench.harness import _sync

        _sync(out)
        return out

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"{k:>20s}: {v*1e3:10.2f} ms ({v/total:6.1%})"
                 for k, v in self.stages.items()]
        lines.append(f"{'total':>20s}: {total*1e3:10.2f} ms")
        return "\n".join(lines)
