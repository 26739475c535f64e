"""Command-line interface.

Mirrors the reference's CLI contract (``main.cu:12``, ``run.sh:7``):

    python -m flex_tpu <graph.csv> <k> [--order=deg] [--method=auto] ...

Loads the graph, prints its statistics (the reference prints directedness /
zero-degree counts before running), applies the ordering, runs the requested
SpMM strategy (or the ordering×method sweep), verifies against SciPy, and
prints the report table / CSV.
"""
from __future__ import annotations

import sys


def main(argv=None) -> int:
    from flex_tpu.config import FlexConfig

    cfg, pos = FlexConfig.from_args(argv if argv is not None else sys.argv[1:])
    if len(pos) < 1:
        print(__doc__)
        return 2
    path = pos[0]
    if len(pos) > 1:
        cfg.k = int(pos[1])

    from flex_tpu.bench.autotune import suggest
    from flex_tpu.bench.harness import bench_spmm, _fmt, write_csv
    from flex_tpu.io import load_csv
    from flex_tpu.reorder import reorder

    from flex_tpu.utils import enable_compile_cache
    from flex_tpu.utils.device_info import device_banner

    enable_compile_cache()

    print(device_banner())  # the reference prints GPU info first (gp lib)
    g = load_csv(path)
    s = g.stats
    print(f"{g}")
    print(
        f"  one-way edges={s.n_edges_one_way} asymmetric={s.n_edges_asymmetric} "
        f"zero-out={s.n_nodes_zero_out} zero-in={s.n_nodes_zero_in} "
        f"zero-deg={s.n_nodes_zero_deg} unit-rows={s.n_unit_rows} "
        f"directed={s.is_directed}"
    )
    print(f"  degree histogram [0,2) [2,4) [4,8) [8,16) [16,inf): "
          f"{g.degree_histogram().tolist()}")

    if cfg.method == "sweep":
        # the reference's run(): ordering × tile-shape × kernel sweep with
        # one report table (flex.cu:4560-5716, 4 orderings × tm∈{2,4,8,16});
        # orderings are applied by the sweep itself, on the original graph.
        from flex_tpu.bench.harness import sweep

        results = sweep(
            g, ks=(cfg.k,),
            orders=("ovo", "deg", "rcm", "dfs", "gorder", "rabbit"),
            methods=("xla", "bcoo", "ell", "panel", "band", "windowed"),
            tms=(128, 256), csv_path=cfg.csv,
            check=cfg.check, iters=cfg.iters,
        )
        bad = [r for r in results if r.check is not None and not r.check.ok]
        # crashes are failures too; format-ineligibility refusals
        # (ValueError/NotImplementedError) are expected sweep rows
        crashed = [r for r in results
                   if r.check is None and "error" in r.extra
                   and not r.extra["error"].startswith(
                       ("ValueError", "NotImplementedError"))]
        return 1 if bad or crashed else 0

    if cfg.order != "ovo":
        import os

        from flex_tpu.reorder import ORDER_ABBR, compute_order
        from flex_tpu.reorder.inout import load_order, save_order
        from flex_tpu.sparse.perm import apply_vertex_order

        of = cfg.order_file
        if of and os.path.exists(of if of.endswith(".npy") else of + ".npy"):
            # reference inout.cu:20-37: reload a persisted ordering instead
            # of recomputing gorder/rabbit on every run
            print(f"loading ordering from {of}")
            perm = load_order(of)
            g = apply_vertex_order(g, perm, ORDER_ABBR[cfg.order],
                                   check=False)
        else:
            print(f"applying ordering: {cfg.order}")
            perm = compute_order(g, cfg.order)
            if of:
                save_order(perm, of)
                print(f"saved ordering to {of}")
            g = apply_vertex_order(g, perm, ORDER_ABBR[cfg.order],
                                   check=False)

    method = cfg.method
    if method == "auto":
        # explicit user flags flow INTO the autotuner's model (it would
        # otherwise score its own defaults and silently override them)
        sug_kw = {}
        if "tm" in cfg.explicit:
            sug_kw["win_tm"] = max(cfg.tm, 256)
        if "W" in cfg.explicit:
            sug_kw["win_W"] = cfg.W
        if "min_count" in cfg.explicit:
            sug_kw["win_min_count"] = cfg.min_count
        sug = suggest(g, cfg.k, tm=cfg.tm, hub_threshold=cfg.hub_threshold,
                      **sug_kw)
        method = sug.method
        # the autotuner's validated parameters take precedence over
        # DEFAULTS, but never over flags the user set explicitly
        prep_kwargs = {**cfg.prep_kwargs(method), **sug.prep_kwargs}
        user = {k: v for k, v in cfg.prep_kwargs(method).items()
                if k in cfg.explicit}
        prep_kwargs.update(user)
        if "J" in cfg.explicit:
            # suggest() has no J knob; its cached selection was built at
            # the default cap, so let prepare re-select with the user's
            prep_kwargs.pop("sel", None)
        # tPre convention matches bench.py's headline: the autotuner's
        # selection tables are a shared pass, reused by the timed prepare
        # (the previous pop("sel") re-timed the O(nnz) selection here
        # while the headline excluded it — contradictory conventions)
        print(f"auto-selected method: {method} ({sug.reason})")
    else:
        prep_kwargs = cfg.prep_kwargs(method)

    try:
        r = bench_spmm(
            g, cfg.k, method=method, iters=cfg.iters, check=cfg.check,
            trace_dir=cfg.trace, **prep_kwargs,
        )
    except (ValueError, NotImplementedError) as e:
        if cfg.method != "auto" or method == "ell":
            raise
        print(f"{method} refused ({e}); falling back to ell")
        method = "ell"
        r = bench_spmm(g, cfg.k, method="ell", iters=cfg.iters,
                       check=cfg.check, trace_dir=cfg.trace,
                       **cfg.prep_kwargs("ell"))
    print(_fmt(r))
    if cfg.trace:
        # measured per-op device times from the trace (the reference's
        # NPerf table, flex.cu:5082-5132)
        from flex_tpu.utils.trace import format_trace_table, trace_table

        rows = trace_table(cfg.trace)
        if rows:
            print(format_trace_table(rows))
            print(f"trace: {len(rows)} distinct ops; "
                  f"total {sum(x['total_ms'] for x in rows):.2f} ms device "
                  f"time in {cfg.trace}")
    if cfg.csv:
        write_csv([r], cfg.csv)
        print(f"wrote {cfg.csv}")
    if r.check is not None and not r.check.ok:
        print(f"RESULT CHECK FAILED: {r.check}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
