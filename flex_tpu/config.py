"""Runtime configuration.

The reference configures everything at compile time (kernel choice
``#define flex_kernel``, tile-shape macros, ``NNZ_LIMIT``, in-source bools —
``flex.cu:4720-4761``, ``flex.cuh:15-48``, ``mat.cuh:16``).  The TPU build
replaces that with one dataclass that the CLI, bench harness, and autotuner
share (SURVEY.md §5.6).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class FlexConfig:
    # kernel strategy: "ell" | "panel" | "xla" | "auto"
    method: str = "auto"
    # vertex ordering: "ovo" | "deg" | "rcm" | "dfs" | "gorder" | "rabbit"
    order: str = "deg"
    k: int = 128

    # ell params; None = use ops.ell_spmm.DEFAULT_WIDTHS (the measured-fast
    # fine ladder) — kept in one place so the CLI can't drift from it
    widths: tuple[int, ...] | None = None
    b_dtype: str = "float32"          # "bfloat16" = fast inference mode

    # panel params
    tm: int = 128
    hub_threshold: int = 512
    hub_width: int = 2048

    # windowed params (J = per-panel window cap; the step-major layout
    # pads only to G=4 granularity so a high cap costs nothing)
    W: int = 128
    J: int = 1024
    min_count: int = 128
    # k<128-specialized transposed kernel (Aᵀ step layout, Cᵀ = Bᵀ·Aᵀ):
    # no 128-lane padding in the dense half, so k=32 does ~¼ the MXU work
    transposed: bool = False

    # bench params
    iters: int = 10
    check: bool = True
    csv: str | None = None
    # profiler trace directory (--trace=/tmp/dir wires utils.trace into the
    # bench run — the reference's NPerf replay analog)
    trace: str | None = None
    # persist/reuse the computed ordering (reference inout.cu:20-37):
    # --order-file=path.npy loads it if present, else computes + saves
    order_file: str | None = None

    # flag names the user set explicitly on the CLI (from_args fills it);
    # lets --method=auto honor user overrides over the autotuner's
    explicit: frozenset = frozenset()

    def prep_kwargs(self, method: str) -> dict:
        if method == "ell":
            kw = {"b_dtype": self.b_dtype}
            if self.widths is not None:
                kw["widths"] = self.widths
            return kw
        if method == "panel":
            return {
                "tm": self.tm,
                "hub_threshold": self.hub_threshold,
                "hub_width": self.hub_width,
            }
        if method == "windowed":
            return {
                "tm": max(self.tm, 256), "W": self.W, "J": self.J,
                "min_count": self.min_count, "b_dtype": self.b_dtype,
                "transposed": self.transposed,
            }
        if method == "band":
            return {"tm": max(self.tm, 256)}
        return {}

    @staticmethod
    def from_args(argv) -> tuple["FlexConfig", list[str]]:
        """Parse --key=value overrides; returns (config, positional args)."""
        cfg = FlexConfig()
        pos = []
        explicit = set()
        for a in argv:
            if a.startswith("--"):
                key, eq, val = a[2:].partition("=")
                key = key.replace("-", "_")
                if not hasattr(cfg, key) or key == "explicit":
                    raise SystemExit(f"unknown flag --{key}")
                cur = getattr(cfg, key)
                if isinstance(cur, bool):
                    val = val.lower() not in ("0", "false", "no") if val else True
                else:
                    if not val:
                        # a bare non-bool flag would silently become None
                        # and crash far from the parse site
                        raise SystemExit(f"--{key} needs a value (--{key}=...)")
                    if isinstance(cur, int):
                        val = int(val)
                    elif isinstance(cur, tuple) or key == "widths":
                        val = tuple(int(x) for x in val.split(","))
                setattr(cfg, key, val)
                explicit.add(key)
            else:
                pos.append(a)
        cfg.explicit = frozenset(explicit)
        return cfg, pos
