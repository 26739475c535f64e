"""Benchmark harness.

TPU re-design of the reference's ``run()`` sweep (``flex.cu:4560-5716``):
drives ordering × format × kernel configurations, times preprocessing (tPre)
and execution (tElap), verifies against the SciPy gold with the per-row
tolerance model, and emits a CSV.

Metric conventions (BASELINE.md): GFLOP/s = 2·nnz·k / tElap (the 2× FMA
convention used by the reference's CSV and ASpT); tPre/tElap is the
preprocessing-to-kernel-time ratio; Errs% the fraction of outputs beyond
tolerance.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import numpy as np

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.utils.check import CheckResult, res_check

# Roofline constants for the chips we target (the reference hardcodes H100
# roofs at flex.cu:5241-5277; these are published TPU peak numbers).
ROOFLINE = {
    # bytes/s HBM, FLOP/s bf16 (MXU), FLOP/s f32-ish (bf16x3 MXU path)
    "v5e": {"hbm": 819e9, "bf16": 197e12, "f32": 49e12},
    "v5p": {"hbm": 2765e9, "bf16": 459e12, "f32": 115e12},
}

# Measured sustained HBM stream on the attached chip (docs/measurements.md
# round-3 serial-chain probe: 550-800 GB/s; the earlier 195-300 figure was
# sync-floor-polluted); "hbm_frac" report columns are relative to this,
# the roof a kernel can actually reach here.
HBM_MEASURED = 600e9

# Measured gather-engine descriptor rate (512 B rows, serial-chain probe,
# very stable at 208-214 M rows/s across sessions) — used to solve the
# measured-side B-reuse u from traced gather time, the analog of the
# reference solving u from measured DRAM counters (flex.cu:5505-5540).
GATHER_ROWS_PER_S = 210e6


@dataclasses.dataclass
class BenchResult:
    graph: str
    order: str
    method: str
    k: int
    m: int
    nnz: int
    t_pre: float
    t_elap: float
    gflops: float           # 2·nnz·k / tElap
    pre_ratio: float        # tPre / tElap
    check: CheckResult | None
    extra: dict[str, Any] = dataclasses.field(default_factory=dict)

    def row(self) -> dict:
        d = {
            "graph": self.graph, "order": self.order, "method": self.method,
            "k": self.k, "m": self.m, "nnz": self.nnz,
            "t_pre_s": round(self.t_pre, 6), "t_elap_ms": round(self.t_elap * 1e3, 4),
            "gflops": round(self.gflops, 2), "pre_ratio": round(self.pre_ratio, 3),
            "err_frac": self.check.err_frac if self.check else None,
            "max_err": self.check.max_err if self.check else None,
        }
        d.update(self.extra)
        return d


def _sync(out) -> None:
    """Force completion.  Under the axon TPU relay ``block_until_ready`` does
    not actually round-trip, so sync through a device-to-host copy.  All
    array leaves are folded into ONE tiny D2H (a first-element concat) so a
    multi-dispatch build (e.g. format build + bucket build) is fully
    retired — syncing only the first leaf under-measured tPre when later
    dispatches were still in flight."""
    import jax.numpy as jnp

    leaves = [leaf for leaf in jax.tree_util.tree_leaves(out)
              if isinstance(leaf, jax.Array)]
    if not leaves:
        return
    heads = [leaf.ravel()[:1].astype(jnp.float32) for leaf in leaves
             if leaf.size]
    if not heads:
        np.asarray(leaves[0])
        return
    np.asarray(heads[0] if len(heads) == 1 else jnp.concatenate(heads))


def _time_device(fn: Callable, *args, iters: int = 10, warmup: int = 3) -> float:
    """cuSpmm-style timing: warmup launches then averaged timed launches
    (reference flex.cu:5047-5067 does 5 warmup + 10 timed).

    Caveat (docs/measurements.md round-3): the relay does NOT guarantee
    it serializes independent outputs — a bare repeated matmul measured
    an impossible 213 TF/s this way.  On the real multi-dispatch SpMM
    plans the averaged numbers cross-check against serial-chain
    component costs and the static time model (ratio ~0.92), so this
    stays the sweep workhorse; the headline capture additionally
    verifies tElap with a true serial dependency chain
    (bench.py:_chain_elap) and flags divergence."""
    out = fn(*args)  # always at least one un-timed dispatch (compile)
    for _ in range(max(warmup - 1, 0)):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _chain_time(plan, m: int, n: int, k: int, lo: int = 4,
                hi: int = 24) -> float:
    """Marginal per-call cost with a TRUE serial dependency chain:
    iteration i+1 consumes iteration i's output inside one jitted
    fori_loop, delta-timed at two chain lengths.  Immune to both the
    per-dispatch relay latency (~3 ms round trip — which swamps small
    graphs: pubmed measures 3.7 ms/call dispatched but 127 µs chained,
    docs/measurements.md round-4) and the relay's non-serialization of
    independent dispatches.  Plans are pytrees: passed as an argument,
    never closed over."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("steps",))
    def chain(p, B0, *, steps):
        def body(i, y):
            out = p(y) * 0.01
            return out[:n] if m >= n else jnp.pad(
                out, ((0, n - m), (0, 0)))

        return jax.lax.fori_loop(0, steps, body, B0)

    B0 = jnp.zeros((n, k), jnp.float32)

    def delta(lo_, hi_):
        for _ in range(3):
            ts = {}
            for steps in (lo_, hi_):
                _sync(chain(plan, B0, steps=steps))  # compile + warm
                t0 = time.perf_counter()
                _sync(chain(plan, B0, steps=steps))
                ts[steps] = time.perf_counter() - t0
            if ts[hi_] > ts[lo_]:  # sane (the relay can swallow a sync)
                return (ts[hi_] - ts[lo_]) / (hi_ - lo_)
        return float("nan")

    t = delta(lo, hi)
    # µs-scale calls leave the 20-iter delta inside the relay's ms-scale
    # sync jitter (pubmed measured 127 vs 424 µs run-to-run); stretch the
    # chain until the signal is ≥20 ms of device time, capped at 2048
    # iterations (big graphs already clear the bar at the default hi).
    if t == t and t * (hi - lo) < 0.020:
        hi2 = lo + min(2048, max(hi - lo, int(0.020 / max(t, 1e-7))))
        t2 = delta(lo, hi2)
        if t2 == t2:
            return t2
    return t


def bench_spmm(
    g: CSRGraph,
    k: int,
    method: str = "xla",
    prepare: Callable[[CSRGraph], Any] | None = None,
    B: np.ndarray | None = None,
    gold: np.ndarray | None = None,
    check: bool = True,
    iters: int = 10,
    trace_dir: str | None = None,
    trace: bool | None = None,
    chain: bool | None = None,
    **prep_kwargs,
) -> BenchResult:
    import jax.numpy as jnp

    from flex_tpu.io.csv_loader import make_features
    from flex_tpu.ops import ref as _ref

    if B is None:
        B = make_features(g, k)
    if prepare is None:
        prepare = _resolve_prepare(method)

    extra: dict[str, Any] = {}
    if method in ("ell", "band", "windowed", "gespmm", "bcoo") \
            and "dev" not in prep_kwargs:
        # CSR upload is the loader's job (reference cuda_alloc_cpy), not
        # preprocessing; time it separately.
        from flex_tpu.sparse.device import DeviceCSR

        t0 = time.perf_counter()
        dev = DeviceCSR.from_graph(g)
        # sync ALL three uploads — first-leaf-only sync left the equally
        # nnz-sized col transfer in flight, leaking it into timed t_pre
        _sync((dev.row_ptr, dev.col, dev.vals))
        extra["t_upload_s"] = round(time.perf_counter() - t0, 3)
        prep_kwargs["dev"] = dev

    t0 = time.perf_counter()
    plan = prepare(g, **prep_kwargs)
    _sync(getattr(plan, "__dict__", plan))
    t_pre = time.perf_counter() - t0

    B_dev = jnp.asarray(B)
    t_elap = _time_device(plan, B_dev, iters=iters)

    # Chained ground truth: default ON for the small-graph regime, where
    # the per-dispatch relay latency dominates t_elap and the dispatched
    # average is transport, not kernel (docs/measurements.md round-4
    # small-graph breakdown; reference small graphs time kernel-only via
    # cudaEvent, flex.cu:5047-5067).
    if chain is None:
        chain = g.nnz < 5_000_000 and method != "xla"
    if chain:
        try:
            t_ch = _chain_time(plan, g.m, g.n, k)
            if t_ch == t_ch:  # not NaN
                extra["t_chain_us"] = round(t_ch * 1e6, 1)
                extra["gflops_chain"] = round(
                    2 * g.nnz * k / t_ch / 1e9, 1)
        except Exception as e:  # chain must never kill a sweep row
            extra["chain_error"] = str(e)[:120]

    # Format statistics (coverage, pad ratio, bucket shapes, …) become
    # report columns — the reference's per-config stats_collect columns.
    if hasattr(plan, "stats"):
        for key, val in plan.stats.items():
            if isinstance(val, (int, float, str)):
                extra[f"fmt_{key}"] = val

    # Measured-run analytics (reference flex.cu:5505-5688: byte model +
    # per-config AI + B-reuse joined with the measured launch): predicted
    # traffic, implied arithmetic intensity, fraction of the measured HBM
    # roof achieved, and the B-reuse factor u = nnz / gathered rows.
    if hasattr(plan, "traffic_model"):
        mdl = plan.traffic_model(k)
        extra["model_gb"] = round(mdl["bytes"] / 1e9, 4)
        extra["ai_model"] = round(2 * g.nnz * k / max(mdl["bytes"], 1), 4)
        extra["hbm_frac"] = round(
            mdl["bytes"] / max(t_elap, 1e-12) / HBM_MEASURED, 4)
        if mdl.get("gathered_rows"):
            extra["b_reuse"] = round(g.nnz / mdl["gathered_rows"], 4)

    # Per-step trace is a STANDING column (VERDICT r04 item 8): the
    # reference prints its measured Imb%/counter join for every config
    # (flex.cu:5087-5132); here one traced dispatch (kept out of the
    # timed loop) is parsed into per-op-class device times and joined
    # with the byte model.  ``trace=None`` means "on unless the caller
    # opted out"; failures only annotate.
    if trace is None:
        trace = trace_dir is not None
    if trace:
        import shutil
        import tempfile

        from flex_tpu.utils.trace import trace as trace_ctx
        from flex_tpu.utils.trace import trace_summary

        td = trace_dir or tempfile.mkdtemp(prefix="flex_trace_")
        try:
            with trace_ctx(td):
                _sync(plan(B_dev))
            if trace_dir:
                extra["trace_dir"] = trace_dir
            ts = trace_summary(td)
            if ts["top_ops"]:
                extra["trace_device_ms"] = ts["device_total_ms"]
                cls = ts.get("class_ms", {})
                for c in ("gather", "scatter", "dot"):
                    if cls.get(c):
                        extra[f"trace_{c}_ms"] = cls[c]
                if "model_gb" in extra:
                    model_ms = extra["model_gb"] / HBM_MEASURED * 1e12
                    extra["trace_vs_model"] = round(
                        ts["device_total_ms"] / max(model_ms, 1e-9), 3)
                # measured-side B-reuse: rows the gather engine ACTUALLY
                # spent time on (traced gather ms x calibrated descriptor
                # rate) vs nnz — the reference solves u from measured
                # DRAM counters the same way (flex.cu:5505-5540).  Only
                # meaningful on the TPU backend (the rate is a TPU
                # calibration).
                if cls.get("gather") and jax.default_backend() == "tpu":
                    rows_meas = cls["gather"] / 1e3 * GATHER_ROWS_PER_S
                    extra["u_meas"] = round(g.nnz / max(rows_meas, 1.0), 3)
        except Exception as e:  # trace failure must not kill the bench
            extra["trace_parse_error"] = str(e)[:120]
        finally:
            if not trace_dir:
                shutil.rmtree(td, ignore_errors=True)

    chk = None
    if check:
        if gold is None:
            gold = _ref.spmm_scipy(g, B)
        # Tolerance follows the *gather* dtype: bf16 fast mode introduces
        # ~2^-8 relative error per term, which the f32 tolerance model
        # would always flag (round-1 advisor, low).
        eps_scale = 4.0
        if getattr(plan, "b_dtype", "float32") == "bfloat16":
            eps_scale *= float(
                jnp.finfo(jnp.bfloat16).eps / np.finfo(np.float32).eps
            )
        chk = res_check(gold, np.asarray(plan(B_dev)), g.degrees,
                        eps_scale=eps_scale)

    return BenchResult(
        graph=g.name, order=g.order, method=method, k=k, m=g.m, nnz=g.nnz,
        t_pre=t_pre, t_elap=t_elap,
        gflops=2 * g.nnz * k / t_elap / 1e9,
        pre_ratio=t_pre / t_elap if t_elap else float("inf"),
        check=chk,
        extra=extra,
    )


def _resolve_prepare(method: str) -> Callable:
    if method == "xla":
        from flex_tpu.ops.xla_spmm import prepare_xla

        return prepare_xla
    if method == "ell":
        from flex_tpu.ops.ell_spmm import prepare_ell

        return prepare_ell
    if method == "band":
        from flex_tpu.ops.pallas_band import prepare_band

        return prepare_band
    if method == "panel":
        from flex_tpu.ops.panel_spmm import prepare_panel

        return prepare_panel
    if method == "windowed":
        from flex_tpu.ops.window_spmm import prepare_windowed

        return prepare_windowed
    if method == "gespmm":
        from flex_tpu.ops.gespmm import prepare_gespmm

        return prepare_gespmm
    if method == "bcoo":
        from flex_tpu.ops.bcoo_spmm import prepare_bcoo

        return prepare_bcoo
    raise ValueError(f"unknown method {method!r}")


# methods whose format has a row-panel height knob (the reference sweeps
# tm ∈ {2,4,8,16} via tileConfs[], flex.cu:4143-4152; MXU panels want
# 128/256)
_TM_METHODS = ("panel", "band", "windowed")


def sweep(
    g: CSRGraph,
    ks: tuple[int, ...] = (32, 128),
    orders: tuple[str, ...] = ("ovo", "deg", "rcm", "rabbit"),
    methods: tuple[str, ...] = ("xla",),
    tms: tuple[int, ...] = (128, 256),
    csv_path: str | None = None,
    check: bool = True,
    iters: int = 10,
    trace: bool = True,
) -> list[BenchResult]:
    """Ordering × k × method × tile-shape sweep — the reference's run()
    grid (4 orderings × 4 tile heights × kernel, flex.cu:4695-4825).
    Methods without a tile-shape knob (ell, xla) run once per (order, k);
    format-ineligible configs (band on a non-banded matrix) are recorded
    as error rows, matching the reference's practice of printing every
    config.  Every row carries the standing measured columns (per-op-class
    trace ms, measured-u, fmt pad ratios — VERDICT r04 item 8); pass
    ``trace=False`` to skip the traced dispatch per config."""
    from flex_tpu.reorder import reorder

    results = []
    for order in orders:
        g_ord = reorder(g, order, check=False) if order != "ovo" else g
        for k in ks:
            gold = None
            if check:  # one SciPy gold per (ordering, k), shared by configs
                from flex_tpu.io.csv_loader import make_features
                from flex_tpu.ops import ref as _ref

                B = make_features(g_ord, k)
                gold = _ref.spmm_scipy(g_ord, B)
            for method in methods:
                for tm in (tms if method in _TM_METHODS else (None,)):
                    kw = {"tm": tm} if tm is not None else {}
                    if check:
                        kw["B"] = B
                        kw["gold"] = gold
                    try:
                        r = bench_spmm(g_ord, k, method=method, check=check,
                                       iters=iters, trace=trace, **kw)
                    except Exception as e:  # record failures, keep sweeping
                        r = BenchResult(
                            graph=g.name, order=order, method=method, k=k,
                            m=g.m, nnz=g.nnz, t_pre=0.0, t_elap=float("inf"),
                            gflops=0.0, pre_ratio=0.0, check=None,
                            extra={"error": f"{type(e).__name__}: {e}"[:200]},
                        )
                    if tm is not None:
                        r.extra["tm"] = tm
                    results.append(r)
                    print(_fmt(r))
    if csv_path:
        write_csv(results, csv_path)
    return results


def _fmt(r: BenchResult) -> str:
    err = f"err={r.check.err_frac:.2e}" if r.check else r.extra.get("error", "")
    # Serial-chain intrinsic rate, when measured: on small graphs the
    # dispatched average is relay transport, not kernel time — the chain
    # column is the number library users should read (the reference's
    # cudaEvent kernel-only timing, flex.cu:5047-5067).
    chain = ""
    if "gflops_chain" in r.extra:
        chain = (f" chain={r.extra['gflops_chain']:.1f} GF/s"
                 f" ({r.extra['t_chain_us']:.0f}us/call)")
    # standing imbalance/measured columns (VERDICT r04 item 8): format
    # pad ratio (the TPU counterpart of the reference's per-config Imb%),
    # traced per-op-class device time, measured-side B-reuse
    extra_cols = ""
    if "fmt_pad_ratio" in r.extra:
        extra_cols += f" pad={r.extra['fmt_pad_ratio']:.2f}"
    if "trace_device_ms" in r.extra:
        extra_cols += f" trace={r.extra['trace_device_ms']:.1f}ms"
    if "u_meas" in r.extra:
        extra_cols += f" u={r.extra['u_meas']:.2f}"
    return (
        f"{r.graph:>14s} {r.order:>4s} {r.method:>6s} k={r.k:<4d} "
        f"tPre={r.t_pre*1e3:8.1f}ms tElap={r.t_elap*1e3:8.3f}ms "
        f"{r.gflops:8.1f} GF/s pre/elap={r.pre_ratio:8.2f} "
        f"{err}{chain}{extra_cols}"
    )


def write_csv(results: list[BenchResult], path: str) -> None:
    import csv

    rows = [r.row() for r in results]
    keys: list[str] = []
    for row in rows:
        for key in row:
            if key not in keys:
                keys.append(key)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
