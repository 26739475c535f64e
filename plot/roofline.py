"""Roofline plot from a bench CSV (reference ``plot/…py`` analog).

Usage: python plot/roofline.py bench.csv [out.png] [--chip=v5e]

Plots measured effective GFLOP/s against the chip's HBM and compute roofs
using the byte model from flex_tpu.tiling.stats.
"""
from __future__ import annotations

import csv
import sys


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    args = [a for a in argv if not a.startswith("--")]
    chip = "v5e"
    for a in argv:
        if a.startswith("--chip="):
            chip = a.split("=", 1)[1]
    if not args:
        print(__doc__)
        return 2
    csv_path = args[0]
    out = args[1] if len(args) > 1 else "roofline.png"

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from flex_tpu.bench.harness import ROOFLINE

    if chip not in ROOFLINE:
        print(f"unknown chip {chip!r}; choose from {sorted(ROOFLINE)}")
        return 2
    roofs = ROOFLINE[chip]
    rows = list(csv.DictReader(open(csv_path)))
    ai = np.logspace(-2, 3, 200)
    plt.figure(figsize=(7, 5))
    plt.loglog(ai, np.minimum(ai * roofs["hbm"], roofs["f32"]) / 1e9,
               label=f"{chip} roof (HBM {roofs['hbm']/1e9:.0f} GB/s, "
                     f"f32 {roofs['f32']/1e12:.0f} TF/s)")
    for r in rows:
        # error rows carry gflops="0.0" — a truthy STRING; parse first
        gf = float(r.get("gflops") or 0)
        if gf <= 0:
            continue
        nnz, k, m = int(r["nnz"]), int(r["k"]), int(r["m"])
        # effective AI from the ideal byte model (A once, B once, C once)
        bytes_ = nnz * 8 + m * k * 8
        x = 2 * nnz * k / bytes_
        plt.scatter([x], [gf], label=f"{r['graph']}/{r['order']}/{r['method']}")
    plt.xlabel("arithmetic intensity (FLOP/byte, ideal-traffic model)")
    plt.ylabel("effective GFLOP/s (2·nnz·k/t)")
    plt.legend(fontsize=7)
    plt.grid(True, which="both", alpha=0.3)
    plt.tight_layout()
    plt.savefig(out, dpi=120)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
