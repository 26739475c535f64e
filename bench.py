"""Headline benchmark for the driver.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "GFLOP/s", "vs_baseline": N, ...}

Config (BASELINE.json config 3): Reddit-scale SpMM — 232,965 rows,
23,446,803 nnz, k=128, f32 exact.  The graph is the `reddit_posts`
bipartite-projection proxy (io/synth.py: matches the real GNN Reddit
dataset's documented construction — posts linked by shared commenters —
and its size/degree/homophily/clustering stats; the real reddit.csv is
not distributable in-tree).  Ordering: rbdeg (rabbit clusters, degree
sorted within).  Method: chosen by the autotuner's time model
(bench/autotune.suggest), validated err=0 against SciPy.

Baseline = ASpT on H100, Reddit k=128: 1237.25 GFLOP/s (BASELINE.md;
recorded there with ~99% wrong outputs — ours validates at err=0).

Round-3 structure (VERDICT r02 item 1 — the r02 capture ran 15-18x
slower than every dev measurement and bench.py reported it unflagged):

- the parent process does NO TPU work; it launches a worker subprocess
  and, if the worker reports a degraded environment (or dies), retries
  ONCE in a fresh process (the documented recovery for relay wedges).
- the worker benchmarks FIRST and emits the headline the moment it
  exists; a CALIBRATION PROBE (4096^2 f32 matmul + a 128 MB HBM stream
  + a 2M-row gather chain) runs AFTER as deadline-gated enrichment,
  checked against the measured constants in docs/measurements.md
  (round-5: probes-before-bench cost two captures — the probe
  subprocess couldn't fit device init + 6 chain executables in its
  timeout, and killing it wedged the tunnel).  Environment sanity for
  acceptance comes from the measurement itself: err=0 and tElap within
  1.5x of the autotuner's time model.  The reference harness
  self-checks its timing the same way (cuSPARSE setup/processing
  split, flex.cu:5737-5790).
- measured tElap is compared against the autotuner's own time model;
  >3x divergence is annotated.
- the capture window is small: ONE checked benchmark run, ONE extra
  timed prepare (tPre best-of-two vs tunnel upload variance; tElap is
  reported from the first run only — round-2 advisor).

Timing conventions (CLAUDE.md / README):
- GFLOP/s = 2·nnz·k / tElap.
- tPre = format build from the device-resident CSR (device build +
  residue ELL build), measured with warm XLA executables; the
  selection tables are the autotuner's own (shared pass — VERDICT r02
  item 2).  The reference's CUDA kernels are precompiled by nvcc and
  its harness builds formats from an already-resident graph the same
  way.  Cold (compile-inclusive) time is logged to stderr.
All progress chatter goes to stderr; stdout stays one line.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time


_T0 = time.time()


def log(msg):
    print(f"[{time.time()-_T0:6.0f}s] {msg}", file=sys.stderr, flush=True)


BASELINE_GFLOPS = 1237.25  # ASpT H100 Reddit k=128 (README.md:39)
# cache keyed by generator+ordering version (round-2 advisor: unkeyed
# cache could silently benchmark a stale graph) and validated on load
CACHE_VERSION = 3
CACHE = f"/tmp/reddit_posts_rbdeg_v{CACHE_VERSION}.npz"
EXPECT_M, EXPECT_NNZ = 232_965, 23_446_803
K = 128

# calibration-probe acceptance floors.  Healthy serial-chain readings on
# this chip (2026-08-17, docs/measurements.md): matmul 126-180 TF/s
# (DEFAULT f32 = one bf16 MXU pass), stream 550-800 GB/s, gather
# 208-214 M rows/s (very stable).  Floors sit at ~half of healthy so
# normal variance passes but the observed degradation episodes (gather
# chain 2x slow; r02's 15x collapse) fail.
PROBE_MATMUL_MIN_TFLOPS = 50.0
PROBE_STREAM_MIN_GBPS = 250.0
PROBE_GATHER_MIN_MROWS = 130.0
RESULT = "/tmp/flex_tpu_bench_result.json"

# Driver machines start with an EMPTY /tmp (measured round 4: every
# "cached" artifact the driver run found had been written by its own
# earlier steps, and the capture paid 146 s of cold compiles + a
# timed-out probe).  The compile cache therefore lives IN THE REPO
# (committed; populated by `python bench.py --warm` at dev time), and
# every stage after the headline value is computed is optional and
# deadline-gated.
WORKER_DEADLINE_ENV = "FLEX_BENCH_DEADLINE"


# --------------------------------------------------------------------------
# worker
# --------------------------------------------------------------------------

def _load_graph():
    import numpy as np

    from flex_tpu.sparse.csr import CSRGraph

    if os.path.exists(CACHE):
        log(f"loading cached ordered graph {CACHE}")
        d = np.load(CACHE)
        if d["row_ptr"].shape[0] - 1 == EXPECT_M and \
                d["col"].shape[0] == EXPECT_NNZ:
            return CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                                        name="reddit_posts", order="RBD")
        log("cache shape mismatch — regenerating")
    from flex_tpu.io.synth import reddit_posts
    from flex_tpu.reorder import reorder

    log("generating reddit_posts proxy (233K rows, 23.4M nnz)...")
    g = reddit_posts(seed=0)
    log(f"graph: {g}; applying rbdeg ordering...")
    g = reorder(g, "rbdeg", check=False)
    np.savez(CACHE, row_ptr=g.row_ptr, col=g.col, vals=g.vals)
    return g


def _probe(tag: str) -> dict:
    """Calibration probe: realized matmul TF/s, HBM stream GB/s, and
    gather-engine M rows/s, checked against docs/measurements.md.

    Each rate is measured as a SERIAL dependency chain inside one jitted
    ``fori_loop`` (iteration i+1 consumes iteration i's output), timed at
    two chain lengths with the delta taken — independent repeated
    dispatches of identical computations are NOT reliably serialized by
    the relay (they measured 213 TF/s "matmul"), and the fixed ~34 ms
    D2H sync floor would otherwise dominate."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as _np

    from flex_tpu.bench.harness import _sync

    def chain_time(make_body, y0, *ops, lo=4, hi=24):
        """``ops`` (tables/operands) enter as jit ARGUMENTS — closing the
        jitted chain over concrete device arrays bakes them into the
        executable as constants (CLAUDE.md), bloating compiles and the
        on-disk cache."""
        import time as _t

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(y, *ops, n):
            return jax.lax.fori_loop(0, n, make_body(*ops), y)

        for attempt in range(3):
            ts = {}
            for n in (lo, hi):
                out = chain(y0, *ops, n=n)
                _sync(out)  # compile + warm
                t0 = _t.perf_counter()
                _sync(chain(y0, *ops, n=n))
                ts[n] = _t.perf_counter() - t0
            if ts[hi] > ts[lo]:  # sane delta
                return (ts[hi] - ts[lo]) / (hi - lo)
        # three non-positive deltas: the relay swallowed the sync — treat
        # the reading as unusable-but-fast (an impossibly *fast* probe is
        # a timing artifact, not a degraded chip; only slow readings gate)
        log(f"[probe] WARNING: non-positive serial-chain delta "
            f"({ts[lo]*1e3:.1f} vs {ts[hi]*1e3:.1f} ms) — reading invalid")
        return float("nan")

    n = 4096
    x = jnp.full((n, n), 1.0 / n, jnp.float32)
    t_mm = chain_time(lambda x_: (lambda i, y: y @ x_),
                      jnp.ones((n, n), jnp.float32), x)
    tflops = 2 * n**3 / t_mm / 1e12

    s = jnp.ones((32 * 1024 * 1024,), jnp.float32)  # 128 MB
    t_st = chain_time(lambda: (lambda i, y: y * 1.000001 + 1e-12), s)
    gbps = 2 * s.size * 4 / t_st / 1e9

    # gather probe: the headline's residue chain is gather-engine-bound,
    # and the gather engine degrades INDEPENDENTLY of matmul/stream on
    # this chip (observed 2x on 2026-08-17; docs/measurements.md) —
    # 2M random 512 B rows + consume-reduce per link
    tbl = jnp.ones((233_000, 128), jnp.float32)
    idx = jnp.asarray(_np.random.default_rng(0).integers(
        0, 233_000, 2_000_000, dtype=_np.int32))

    def ga_make(tbl_, idx_):
        def body(i, c):
            off = jnp.minimum(c.astype(jnp.int32), 0)  # 0, data-dependent
            return tbl_[idx_ + off].sum(axis=0)[0] * 1e-7
        return body

    t_ga = chain_time(ga_make, jnp.float32(0.0), tbl, idx, lo=2, hi=10)
    grate = 2_000_000 / t_ga / 1e6

    import math

    def passes(value, floor):
        # NaN = chain delta invalid (impossibly fast) — does not gate;
        # only measured-slow readings mark the environment degraded
        return math.isnan(value) or value >= floor

    ok = (passes(tflops, PROBE_MATMUL_MIN_TFLOPS)
          and passes(gbps, PROBE_STREAM_MIN_GBPS)
          and passes(grate, PROBE_GATHER_MIN_MROWS))
    log(f"[probe:{tag}] matmul {tflops:.1f} TF/s (floor "
        f"{PROBE_MATMUL_MIN_TFLOPS}), stream {gbps:.1f} GB/s (floor "
        f"{PROBE_STREAM_MIN_GBPS}), gather {grate:.0f} M rows/s (floor "
        f"{PROBE_GATHER_MIN_MROWS}) -> {'ok' if ok else 'DEGRADED'}")

    def jval(v):
        return None if math.isnan(v) else round(v, 1)

    return {"tag": tag, "matmul_tflops": jval(tflops),
            "stream_gbps": jval(gbps),
            "gather_mrows": jval(grate), "ok": ok}


def _chain_elap(plan, n, k, lo=3, hi=9) -> float:
    """True serial-chain tElap: iteration i+1 consumes iteration i's
    output (square graph: m == n), timed at two chain lengths with the
    delta taken — immune to both the ~34 ms sync floor and the relay's
    non-serialization of independent dispatches (docs/measurements.md).
    Cross-checks the dispatch-averaged bench_spmm timing; values are
    zeros (gather/matmul cost is structural, and zero stays denormal-
    free through the x0.01 damping)."""
    import functools
    import time as _t

    import jax
    import jax.numpy as jnp

    from flex_tpu.bench.harness import _sync

    @functools.partial(jax.jit, static_argnames=("steps",))
    def chain(plan, B0, *, steps):
        return jax.lax.fori_loop(
            0, steps, lambda i, y: plan(y) * 0.01, B0)

    B0 = jnp.zeros((n, k), jnp.float32)
    for attempt in range(3):
        ts = {}
        for steps in (lo, hi):
            _sync(chain(plan, B0, steps=steps))  # compile + warm
            t0 = _t.perf_counter()
            _sync(chain(plan, B0, steps=steps))
            ts[steps] = _t.perf_counter() - t0
        if ts[hi] > ts[lo]:  # sane delta (the relay can swallow a sync)
            return (ts[hi] - ts[lo]) / (hi - lo)
    return float("nan")  # caller skips the cross-check, annotated


def worker(out_path: str) -> None:
    t_start = time.time()
    import threading

    # Backend-init watchdog: the axon backend has been observed to hang
    # (not fail) inside device init when the tunnel is wedged — a plain
    # UNAVAILABLE raises, a hang would otherwise eat the parent's whole
    # worker timeout before the first retry.  Healthy init is 10-30 s;
    # fire at 180 s and exit so the parent can try a fresh process.
    res: dict = {"annotations": [], "probes": []}

    def emit():
        # atomic: a timeout-kill mid-write must never leave truncated
        # JSON (the parent would lose an already-valid headline)
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(res, f)
        os.replace(tmp, out_path)

    # Capture level (escalated by the parent on OOM): 0 = the pinned
    # in-harness windowed config (mc=64 / 6 GiB — see the level-0 note
    # below: the mc=48/8 GiB standalone frontier measured SLOWER
    # in-harness); any level >= 1 = small-footprint ell.
    level = 2 if os.environ.get("FLEX_BENCH_SAFE") else \
        int(os.environ.get("FLEX_BENCH_LEVEL", "0"))
    res["capture_level"] = level

    # NO pre-probe (round-5 rehearsal lesson: a 120 s probe subprocess
    # timed out on BOTH attempts — device init + 6 chain executables
    # don't fit 120 s through the relay, and killing a TPU-attached
    # subprocess wedges the tunnel for ~1 min, poisoning everything
    # after; the in-process fallback then re-paid the full probe cost
    # and the 600 s attempt died before the first benchmark run).  The
    # benchmark comes FIRST; one probe runs AFTER the headline is
    # emitted, as deadline-gated enrichment.  Environment sanity is
    # judged by the parent from the measurement itself (err=0 + tElap
    # within 1.5x of the autotuner's time model — a degraded chip
    # diverges hard, r02 measured 15x).
    # Graph load/generation is pure host work (numpy + the C++ reorder
    # natives) — overlap it with backend init.  Worst case (empty /tmp:
    # generate + rbdeg ≈ 75-120 s) runs concurrently with the ~40 s
    # device attach.
    graph_box: dict = {}

    def _graph_thread():
        try:
            graph_box["g"] = _load_graph()
        except Exception as e:  # surfaced at join below
            graph_box["err"] = e

    g_thread = threading.Thread(target=_graph_thread, daemon=True)
    g_thread.start()

    init_done = threading.Event()

    def _init_watchdog():
        if not init_done.wait(180):
            log("[watchdog] backend init exceeded 180s — exiting "
                "(parent retries in a fresh process)")
            try:
                with open(out_path, "w") as f:
                    json.dump({"annotations": ["backend-init-hang"]}, f)
            finally:
                os._exit(3)

    # Deadline awareness: the parent tells this worker how long it may
    # run; every stage AFTER the headline value is computed is optional
    # and skipped when the remaining budget is too small for it (each
    # would compile fresh executables at the relay's 1-15 min/compile
    # worst case — exactly what killed the r04 capture mid-post-steps).
    deadline = float(os.environ.get(WORKER_DEADLINE_ENV, time.time() + 840))
    force_all = bool(os.environ.get("FLEX_BENCH_WARM"))

    def left() -> float:
        return deadline - time.time()

    threading.Thread(target=_init_watchdog, daemon=True).start()

    import contextlib

    @contextlib.contextmanager
    def stage_deadline(name: str, seconds: float):
        """Per-stage watchdog: a wedged relay transfer can stall one stage
        for the worker's whole window (rehearsal r05-3: a CSR upload sat
        >530 s at <0.5 MB/s and the attempt died at the 600 s cap with
        nothing to show).  Exiting EARLY (rc=5) hands the remaining budget
        to the parent's fresh-process retry — the documented cure for a
        wedged tunnel.  Post-emit stages don't need this: the RESULT file
        is already on disk and the parent reads it regardless of rc."""
        done = threading.Event()
        if force_all:
            seconds = max(seconds, 3000)  # --warm has no parent retry

        def _fire():
            if not done.wait(seconds):
                log(f"[watchdog] stage '{name}' exceeded {seconds:.0f}s — "
                    f"exiting for a fresh-process retry")
                try:
                    emit()
                finally:
                    os._exit(5)

        t = threading.Thread(target=_fire, daemon=True)
        t.start()
        try:
            yield
        finally:
            done.set()

    import jax

    from flex_tpu.utils import enable_repo_compile_cache

    enable_repo_compile_cache()
    # document every persistent-cache miss in the capture log — the r04
    # postmortem could not tell WHY the driver run paid 146 s of cold
    # compiles despite a cache
    jax.config.update("jax_explain_cache_misses", True)
    import logging as _logging

    _logging.getLogger("jax._src.compiler").setLevel(_logging.DEBUG)
    # per-component cache-key hashes on every compile: a future miss
    # must name WHICH component drifted (computation vs compile_options
    # — the round-5 windowed_call misses could not be attributed)
    _logging.getLogger("jax._src.cache_key").setLevel(_logging.DEBUG)
    log(f"backend: {jax.devices()}")  # forces device init under watchdog
    init_done.set()
    import jax.numpy as jnp
    import numpy as np

    from flex_tpu.bench.autotune import suggest
    from flex_tpu.bench.harness import _resolve_prepare, _sync, bench_spmm
    from flex_tpu.sparse.device import DeviceCSR

    g_thread.join()
    if "err" in graph_box:
        raise graph_box["err"]
    g = graph_box["g"]
    log(f"graph ready: {g}")

    log("uploading CSR...")
    t0 = time.time()
    # Fail-fast rate probe: the tunnel's slow mode (0.04-0.8 MB/s; four
    # round-5 rehearsal attempts died at the 240 s csr-upload watchdog)
    # is a process-lifetime condition — measure it on 4 MB under its own
    # SHORT watchdog (the probe transfer itself blocks at slow-mode
    # rates, so only a watchdog can cut it) and bail immediately, handing
    # the fresh-process retry ~200 s more budget.  --warm has no parent
    # retry, so it rides the slow mode out instead (stage_deadline is
    # already >= 3000 s there and the rate bail is skipped).
    with stage_deadline("upload-probe", 25):
        tp = time.time()
        _sync(jax.device_put(np.ones(1024 * 1024, np.float32)))
        t_probe = time.time() - tp
    # 190 MB at the probed rate must fit the 240 s stage deadline:
    # bail when 4 MB took > ~5 s (<= 0.8 MB/s)
    if t_probe > 5.0 and not force_all:
        log(f"[watchdog] upload probe 4 MB took {t_probe:.1f}s — slow "
            f"tunnel mode; exiting for a fresh-process retry")
        res["annotations"].append("slow-tunnel-probe")
        emit()
        os._exit(5)
    log(f"upload probe: 4 MB in {t_probe:.1f}s")
    with stage_deadline("csr-upload", 240):
        dev = DeviceCSR.from_graph(g)
        _sync((dev.row_ptr, dev.col, dev.vals))  # retire ALL three uploads
    log(f"CSR upload: {time.time()-t0:.1f}s")

    # Config ladder (round 4): level 0 is the pinned measured-safe
    # in-harness config (mc=64 / 5.9 GiB dense, 110.8 GF/s in THIS
    # harness, BASELINE.md r04); level >=1 is small-footprint ell.  The
    # mc=48/8 GiB standalone frontier was tried as level 0 and measured
    # out: at a 7.996 GB dense + ~2.3 GB build temps its peak rides the
    # ~10 GB edge, so the fit is allocator-luck (an identical fresh
    # process built it once and OOMed once, 2026-08-18), and the
    # capped-7 GiB midpoint measured SLOWER than mc=64 on the same day
    # (58.7 ms @ mc_eff=52 vs 54.9 ms) — the frontier's +6% is within
    # chip-day variance while its OOM risk is not.  After any
    # RESOURCE_EXHAUSTED the relay fails every later allocation in the
    # same process (docs/measurements.md), so escalation is always a
    # fresh worker.
    if level >= 1:
        log(f"capture level {level}: forcing ell (prior attempt OOMed)")
        sug = None
        method = "ell"
        prep_kwargs: dict = {}
        res["annotations"].append("oom-fallback:ell")
    else:
        with stage_deadline("autotune-select", 600 if force_all else 240):
            sug = suggest(g, K, dev=dev, win_min_count=64,
                          max_dense_bytes=6 << 30)
        log(f"capture level 0 (mc=64 pinned): {sug.method} ({sug.reason})")
        method = sug.method
        prep_kwargs = dict(sug.prep_kwargs)

    prepare = _resolve_prepare(method)
    dev_kw = {"dev": dev} \
        if method in ("ell", "band", "windowed", "gespmm") else {}

    def cold_and_bench():
        log("cold prepare + executable warmup (compile pass)...")
        t0 = time.time()
        plan = prepare(g, **dev_kw, **prep_kwargs)
        # sync the same pytree structure the timed region syncs — the
        # sync concat itself compiles once per plan structure, and that
        # compile must happen HERE, not inside the timed prepare
        _sync(getattr(plan, "__dict__", plan))
        Bw = jnp.zeros((g.n, K), jnp.float32)
        if method == "windowed":
            # canonicalized-IR fingerprint of the headline executable:
            # two runs logging different hashes = the COMPUTATION drifts
            # (plan structure nondeterminism); same hash but a cache
            # miss = compile_options/backend drift (round-5 forensics)
            try:
                import hashlib

                from jax._src import cache_key as _ck

                from flex_tpu.ops.window_spmm import _windowed_call
                _ir = _windowed_call.lower(plan, Bw).compiler_ir()
                _canon = _ck._canonicalize_ir(_ir, _ck.IgnoreCallbacks.NO)
                log(f"windowed_call canon-IR sha256="
                    f"{hashlib.sha256(_canon).hexdigest()} len={len(_canon)}")
            except Exception as e:  # forensics only — never gates
                log(f"canon-IR fingerprint failed: {e!r}")
        _sync(plan(Bw))
        del plan
        t_cold = time.time() - t0
        log(f"cold prepare+compile: {t_cold:.1f}s")
        return t_cold, bench_spmm(g, K, method=method, iters=10, check=True,
                                  **dev_kw, **prep_kwargs)

    def _is_oom(e) -> bool:
        return "RESOURCE_EXHAUSTED" in repr(e)

    try:
        with stage_deadline("cold-prepare+bench",
                            900 if force_all else 360):
            t_cold, r = cold_and_bench()
    except Exception as e:
        if _is_oom(e):
            # After a RESOURCE_EXHAUSTED the relay fails EVERY later
            # allocation in this process (docs/measurements.md sweep
            # lesson; reproduced in bench_r4_verify: the in-process
            # mc=64 retry died allocating a tiny histogram).  Emit what
            # we have and hand control back to the parent, which retries
            # in a fresh process with FLEX_BENCH_SAFE=1 (-> ell).
            log(f"OOM in {method} ({e!r}); exiting for a safe "
                f"fresh-process retry")
            res["annotations"].append(f"oom:{method}")
            emit()
            os._exit(4)
        if method != "windowed" or prep_kwargs.get("fused") is False:
            raise
        # Safety net for the fused single-program windowed build:
        # fall back to the validated two-program path rather than
        # losing the capture.
        log(f"windowed bench failed ({e!r}); retrying with fused=False")
        res["annotations"].append("fused-build-fallback")
        prep_kwargs["fused"] = False
        with stage_deadline("fallback-prepare+bench", 360):
            t_cold, r = cold_and_bench()

    # ---- the headline value exists NOW: emit it before anything else.
    # Every stage below compiles fresh executables (1-15 min/compile
    # worst case through the relay); the r04 capture had a valid 110 GF/s
    # measurement in hand and lost it by emitting only after the chain
    # cross-check + post-probe (VERDICT r04 weak #1).
    if r.check is not None and r.check.err_frac > 1e-4:
        log("WARNING: result check failed; reporting 0")
        res["annotations"].append("result-check-failed")
        value = 0.0
    else:
        value = round(r.gflops, 2)
    res.update({
        "value": value,
        "t_pre_s": round(r.t_pre, 3),
        "t_elap_ms": round(r.t_elap * 1e3, 2),
        "pre_elap_ratio": round(r.pre_ratio, 2),
        "method": method,
        "err_frac": r.check.err_frac if r.check else None,
        "cold_s": round(t_cold, 1),
        # env_ok is set by the post-probe if the deadline allows it; the
        # parent's acceptance does not require it (model-agreement path)
    })
    emit()
    log(f"HEADLINE EMITTED at {time.time()-t_start:.0f}s: "
        f"tPre={r.t_pre:.2f}s (cold incl. compile {t_cold:.1f}s) "
        f"tElap={r.t_elap*1e3:.1f}ms gflops={r.gflops:.1f} "
        f"pre/elap={r.pre_ratio:.2f} "
        f"err_frac={r.check.err_frac if r.check else None} "
        f"extra={r.extra}")

    # ---- optional enrichment stages, each deadline-gated and re-emitting.
    # Thresholds are worst-case-compile-inclusive; with the committed
    # repo cache warm they run in seconds.
    plan2 = None
    if force_all or left() > 120:
        # tPre best-of-two: the host->device tunnel's throughput varies
        # 1.7-45 MB/s between transfers, so a single warm prepare can be
        # hit by one slow transfer.  Only tPre is re-timed (round-2
        # advisor: best-of-two tElap would inflate the headline).
        try:
            t0 = time.time()
            plan2 = prepare(g, **dev_kw, **prep_kwargs)
            _sync(getattr(plan2, "__dict__", plan2))
            t_pre2 = time.time() - t0
            r.t_pre = min(r.t_pre, t_pre2)
            r.pre_ratio = r.t_pre / r.t_elap
            res["t_pre_s"] = round(r.t_pre, 3)
            res["pre_elap_ratio"] = round(r.pre_ratio, 2)
            emit()
        except Exception as e:
            log(f"tPre best-of-two failed: {e!r}")
    else:
        log(f"skipping tPre best-of-two ({left():.0f}s left)")

    # Serial-chain tElap (the reference harness likewise double-checks
    # its timing, flex.cu:5737-5790).  The chain delta-of-two-lengths is
    # the repo's ONE trustworthy estimator (CLAUDE.md): it is immune to
    # the relay's non-serialization of independent dispatches (which
    # makes dispatch-avg too FAST) and subtracts the per-dispatch sync
    # round-trip (~5-7 ms here, which makes dispatch-avg too SLOW — the
    # reference's cudaEvent timing has no launch latency in it either).
    # When the chain delta is valid and plausible it IS the headline
    # tElap; dispatch-avg stays in the JSON as the cross-check.
    if plan2 is not None and (force_all or left() > 150):
        try:
            import math as _math

            ch = _chain_elap(plan2, g.n, K)
            if _math.isnan(ch):
                raise RuntimeError("non-positive serial-chain delta 3x")
            res["t_elap_chain_ms"] = round(ch * 1e3, 2)
            res["t_elap_dispatch_ms"] = round(r.t_elap * 1e3, 2)
            log(f"serial-chain tElap: {ch*1e3:.1f}ms "
                f"(dispatch-avg {r.t_elap*1e3:.1f}ms)")
            if ch < 0.4 * r.t_elap:
                # a chain 2.5x faster than its own dispatches is not
                # overhead subtraction — something got elided; keep the
                # conservative dispatch number
                res["annotations"].append(
                    f"chain-implausibly-fast:{ch/r.t_elap:.2f}x-kept-dispatch")
            else:
                res["annotations"].append(
                    f"chain-timing-used:{ch/r.t_elap:.2f}x-dispatch-avg")
                r.t_elap = ch
                r.gflops = 2 * g.nnz * K / ch / 1e9
                r.pre_ratio = r.t_pre / ch
                res.update({
                    "value": round(r.gflops, 2) if res["value"] else 0.0,
                    "t_elap_ms": round(ch * 1e3, 2),
                    "pre_elap_ratio": round(r.pre_ratio, 2),
                })
            emit()
        except Exception as e:
            log(f"chain cross-check failed: {e!r}")
            res["annotations"].append("chain-check-failed")
            emit()
    else:
        if plan2 is not None:
            log(f"skipping chain cross-check ({left():.0f}s left)")
        res["annotations"].append("chain-check-skipped:deadline")
        emit()
    del plan2

    # model-divergence flag: measured vs the autotuner's own time model
    model_t = (sug.model or {}).get(method) if sug is not None else None
    if model_t:
        ratio = r.t_elap / model_t
        res["model_elap_ratio"] = round(ratio, 2)
        if ratio > 3.0:
            res["annotations"].append(
                f"model-divergence:{ratio:.1f}x-slower-than-time-model")
        emit()

    if force_all or left() > 180:
        p1 = _probe("post")
        res["probes"].append(p1)
        res["env_ok"] = p1["ok"]
        if not p1["ok"]:
            res["annotations"].append("degraded-environment:post-probe")
        emit()
    else:
        log(f"skipping post-probe ({left():.0f}s left)")

    log(f"total wall so far: {time.time()-t_start:.0f}s "
        f"({left():.0f}s to deadline)")

    # Secondary row: the ELL fallback trades tElap for a sub-second
    # rebuild (the right choice for one-shot runs; the autotuned windowed
    # headline amortises its format over reuse, e.g. GCN training).
    if not (force_all or left() > 180):
        log(f"skipping secondary ell ({left():.0f}s left)")
        return
    try:
        from flex_tpu.ops.ell_spmm import prepare_ell

        plan3 = prepare_ell(g, dev=dev)  # warm the build executables
        _sync(plan3.__dict__)  # incl. the per-structure sync concat
        del plan3
        r2 = bench_spmm(g, K, method="ell", iters=10, check=False, dev=dev)
        log(f"[secondary] ell: tPre={r2.t_pre:.2f}s "
            f"tElap={r2.t_elap*1e3:.1f}ms gflops={r2.gflops:.1f} "
            f"pre/elap={r2.pre_ratio:.2f}")
        res["secondary_ell_gflops"] = round(r2.gflops, 1)
        res["secondary_ell_pre_ratio"] = round(r2.pre_ratio, 2)
        emit()
    except Exception as e:
        log(f"[secondary] ell failed: {e}")


# --------------------------------------------------------------------------
# parent
# --------------------------------------------------------------------------

_CHILD: list = []  # live worker Popen, killed by the parent's signal handler


def _run_worker(timeout: float, level: int = 0) -> dict | None:
    if os.path.exists(RESULT):
        os.unlink(RESULT)
    env = dict(os.environ)
    env["FLEX_BENCH_LEVEL"] = str(level)
    # the worker gates its optional post-value stages on this (30 s of
    # slack so it emits its last enrichment before the parent's kill)
    env[WORKER_DEADLINE_ENV] = str(time.time() + timeout - 30)
    p = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", RESULT],
        env=env,
    )
    _CHILD.append(p)
    try:
        p.wait(timeout=timeout)
        log(f"worker exited rc={p.returncode}")
    except subprocess.TimeoutExpired:
        log("worker timed out")
        p.kill()
        try:
            p.wait(timeout=10)
        except subprocess.TimeoutExpired:
            pass
    finally:
        _CHILD.remove(p)
    if os.path.exists(RESULT):
        try:
            with open(RESULT) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError) as e:
            log(f"result file unreadable ({e}); treating as no result")
    return None


def _final_line(res: dict | None) -> str:
    """The ONE stdout line, built from whatever we have (possibly None)."""
    if res is None or "value" not in res:
        out = {
            "metric": "spmm_effective_gflops_reddit_posts_k128",
            "value": 0.0, "unit": "GFLOP/s", "vs_baseline": 0.0,
            "annotations": ["benchmark-failed-twice"]
            + (res.get("annotations", []) if res else []),
        }
    else:
        out = {
            "metric": "spmm_effective_gflops_reddit_posts_k128",
            "value": res["value"],
            "unit": "GFLOP/s",
            "vs_baseline": round(res["value"] / BASELINE_GFLOPS, 4),
        }
        for key in ("t_pre_s", "t_elap_ms", "pre_elap_ratio", "method",
                    "err_frac", "probes", "model_elap_ratio", "env_ok",
                    "secondary_ell_gflops", "secondary_ell_pre_ratio",
                    "annotations"):
            if key in res and res[key] not in (None, [],):
                out[key] = res[key]
    return json.dumps(out)


def main() -> None:
    # Fresh-process attempts until one comes back healthy or the wall
    # budget runs out (documented recovery: relay wedges clear in ~1 min;
    # the init watchdog turns a hung backend into a 3-min failed attempt
    # instead of a 40-min one, so multiple attempts fit the same budget).
    #
    # The one-line-JSON contract must hold under EVERY failure mode
    # (VERDICT r03 item 1: a 2700 s internal budget overran the driver's
    # kill timer and rc=124 swallowed even the value-0 fallback line).
    # Two defenses: (a) the wall budget is 1200 s — well inside any
    # plausible driver window; (b) SIGTERM/SIGINT print the best line
    # seen so far before exiting, so even a kill mid-attempt emits.
    import signal

    state: dict = {"res": None, "emitted": False}
    t_start = time.time()

    def _fresh_result() -> bool:
        # only salvage a RESULT written by THIS capture's worker — a
        # stale file from an earlier dev run must not masquerade as a
        # fresh measurement (the per-attempt unlink in _run_worker covers
        # mid-attempt kills; this covers a kill before attempt 1).  The
        # 5 s slack absorbs the kernel's coarse mtime clock lagging
        # time.time() by a few ms (a write microseconds after t_start
        # must count as fresh; a genuinely stale file is minutes old).
        try:
            return os.path.getmtime(RESULT) >= t_start - 5.0
        except OSError:
            return False

    def _emit_now(signum=None, frame=None):
        if not state["emitted"]:
            state["emitted"] = True
            res_now = state["res"]
            if (signum is not None
                    and (res_now is None or "value" not in res_now)
                    and _fresh_result()):
                # a mid-attempt kill: the worker emits incrementally, so a
                # valid headline may already be on disk — salvage it
                try:
                    with open(RESULT) as f:
                        r = json.load(f)
                    if "value" in r:
                        res_now = r
                except (json.JSONDecodeError, OSError):
                    pass
            line = _final_line(res_now)
            if signum is not None:
                if res_now is None or "value" not in res_now:
                    # the fallback line: mark WHY it is 0
                    d = json.loads(line)
                    d.setdefault("annotations", []).append(
                        f"killed-by-signal-{signum}")
                    line = json.dumps(d)
            print(line, flush=True)
        if signum is not None:
            for p in list(_CHILD):  # don't leave a TPU-holding orphan
                try:
                    p.kill()
                except OSError:
                    pass
            os._exit(0)

    signal.signal(signal.SIGTERM, _emit_now)
    signal.signal(signal.SIGINT, _emit_now)

    deadline = time.time() + 1200
    res = None
    attempt = 0
    level = 0
    while True:
        attempt += 1
        # cap any single attempt at 600 s so the 1200 s budget ALWAYS
        # holds a full retry (VERDICT r04: the 840 s cap left no second
        # attempt; with the committed compile cache warm the whole
        # capture runs in ~3-4 min, and even a full cache miss fits
        # ~430 s because the post-value stages deadline-skip themselves)
        r = _run_worker(timeout=max(300.0, min(600.0,
                                               deadline - time.time())),
                        level=level)
        if r is not None and any(a.startswith("oom:")
                                 for a in r.get("annotations", [])):
            # the config exhausted HBM — escalate the ladder: pinned
            # mc=64 -> small-footprint ell (a low number beats none); an
            # OOM-poisoned process can't recover, so every escalation is
            # a fresh worker
            level = min(level + 1, 1)
        if r is not None and "value" in r:
            # keep the first valued result unless the new one is healthy
            if res is None or "value" not in res or r.get("env_ok", False):
                res = r
            if attempt > 1:
                # annotate the KEPT result (annotating only the new one
                # lost the marker when the first capture was retained)
                res.setdefault("annotations", []).append(
                    f"retry:capture-{attempt}")
            state["res"] = res
            # Accept when the environment probes pass, OR when the
            # MEASUREMENT itself is proven sane: err=0 and tElap within
            # 1.5x of the autotuner's time model (a genuinely degraded
            # run diverges hard — r02's collapse measured 15x the model;
            # the probes are diagnostics, and the post-probe's gather leg
            # reads low under allocation pressure from the 6 GB dense
            # array still resident, a false-positive a retry can't fix).
            meas_ok = (r["value"] > 0
                       and (r.get("err_frac") or 0) <= 1e-4
                       and r.get("model_elap_ratio") is not None
                       and r["model_elap_ratio"] <= 1.5)
            if r.get("env_ok", False) or meas_ok:
                if meas_ok and not r.get("env_ok", False):
                    res.setdefault("annotations", []).append(
                        "accepted-on-model-agreement")
                break
        elif res is None:
            res = r  # keep annotations (e.g. backend-init-hang) for the log
            state["res"] = res
        why = "no result" if r is None else \
            ",".join(r.get("annotations", [])) or "no value"
        if time.time() + 60 + 300 > deadline:
            log(f"capture degraded ({why}); wall budget exhausted "
                f"after attempt {attempt}")
            break
        log(f"capture degraded ({why}); retrying in 60s "
            f"(attempt {attempt} done)...")
        time.sleep(60)

    state["res"] = res
    _emit_now()


def probe_main(tag: str) -> None:
    """--probe mode: run one calibration probe in THIS process and print
    its dict as one JSON line.  Run as a short-lived subprocess by the
    worker so the probe's device buffers (128 MB stream array + ~1 GB
    gather take-temp) never touch the worker's heap — HBM fragmentation
    from the pre-probe is a suspect in the frontier config's in-harness
    OOM (docs/measurements.md round-4)."""
    from flex_tpu.utils import enable_repo_compile_cache

    enable_repo_compile_cache()
    import jax

    log(f"probe backend: {jax.devices()}")
    print(json.dumps(_probe(tag)), flush=True)


def warm_main() -> None:
    """--warm mode: populate the repo-committed compile cache with every
    capture-path executable (probe chains, format builds, the SpMM call,
    the chain cross-check, the secondary ell row) by running the full
    worker with all optional stages forced.  Run at dev time; commit
    .jax_cache/ afterwards so a fresh driver machine hits it."""
    os.environ["FLEX_BENCH_WARM"] = "1"
    os.environ[WORKER_DEADLINE_ENV] = str(time.time() + 3600)
    worker(RESULT)
    with open(RESULT) as f:
        log(f"warm result: {f.read()}")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    elif len(sys.argv) >= 3 and sys.argv[1] == "--probe":
        probe_main(sys.argv[2])
    elif len(sys.argv) >= 2 and sys.argv[1] == "--warm":
        warm_main()
    else:
        main()
