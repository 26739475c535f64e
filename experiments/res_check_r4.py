"""Round-4 on-chip res_check queue (VERDICT r03 item 1b / missing #2).

Every build-path change that landed after the 2026-08-17 TPU outage is
CPU-bit-exact-tested but NOT yet believed: CPU tests cannot see FTZ-class
bugs (the err_frac-0.73 denormal incident, docs/measurements.md).  This
script runs each of them on the real chip against the SciPy gold with the
reference's per-row tolerance (flex.cu:4154-4213) and prints a table.

Queue (all on pubmed, RBD-ordered — small enough that each config
compiles in <1 min):
  - windowed fused=True (one-program build)        k=128
  - windowed fused='scatter'                        k=128
  - windowed fused='scatter2'                       k=128
  - windowed fused=False (two-program, r2-validated) k=128
  - windowed k=32 (lane padding path)
  - band k=32 (lane padding), band k=128
  - ell k=128, ell k=32
  - panel on a deg-ordered copy, k=32 and k=128 (lane padding)
  - xla + bcoo baselines k=128

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/res_check_r4.py
"""
import time

import numpy as np

from flex_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from flex_tpu.bench.harness import _sync  # noqa: E402
from flex_tpu.io import load_csv, make_features  # noqa: E402
from flex_tpu.ops.ref import spmm_scipy  # noqa: E402
from flex_tpu.reorder import reorder  # noqa: E402
from flex_tpu.sparse.device import DeviceCSR  # noqa: E402
from flex_tpu.utils.check import res_check  # noqa: E402

g0 = load_csv("/root/reference/data/pubmed.csv")
g = reorder(g0, "rbdeg", check=False)
dev = DeviceCSR.from_graph(g)
_sync((dev.row_ptr, dev.col, dev.vals))

gdeg = reorder(g0, "deg", check=False)
dev_deg = DeviceCSR.from_graph(gdeg)
_sync((dev_deg.row_ptr, dev_deg.col, dev_deg.vals))

from flex_tpu.ops.bcoo_spmm import prepare_bcoo  # noqa: E402
from flex_tpu.ops.ell_spmm import prepare_ell  # noqa: E402
from flex_tpu.ops.pallas_band import prepare_band  # noqa: E402
from flex_tpu.ops.panel_spmm import prepare_panel  # noqa: E402
from flex_tpu.ops.window_spmm import prepare_windowed  # noqa: E402
from flex_tpu.ops.xla_spmm import prepare_xla  # noqa: E402

CASES = [
    ("windowed fused=True k=128", g, dev, 128,
     lambda g, dev: prepare_windowed(g, dev=dev, fused=True)),
    ("windowed fused=scatter k=128", g, dev, 128,
     lambda g, dev: prepare_windowed(g, dev=dev, fused="scatter")),
    ("windowed fused=scatter2 k=128", g, dev, 128,
     lambda g, dev: prepare_windowed(g, dev=dev, fused="scatter2")),
    ("windowed fused=False k=128", g, dev, 128,
     lambda g, dev: prepare_windowed(g, dev=dev, fused=False)),
    ("windowed fused=True k=32", g, dev, 32,
     lambda g, dev: prepare_windowed(g, dev=dev, fused=True)),
    ("band k=128", g, dev, 128, lambda g, dev: prepare_band(g, dev=dev)),
    ("band k=32", g, dev, 32, lambda g, dev: prepare_band(g, dev=dev)),
    ("ell k=128", g, dev, 128, lambda g, dev: prepare_ell(g, dev=dev)),
    ("ell k=32", g, dev, 32, lambda g, dev: prepare_ell(g, dev=dev)),
    ("panel(deg) k=128", gdeg, dev_deg, 128,
     lambda g, dev: prepare_panel(g)),
    ("panel(deg) k=32", gdeg, dev_deg, 32,
     lambda g, dev: prepare_panel(g)),
    ("xla k=128", g, dev, 128, lambda g, dev: prepare_xla(g)),
    ("bcoo k=128", g, dev, 128, lambda g, dev: prepare_bcoo(g)),
]

rows = []
golds = {}
for name, gg, dd, k, mk in CASES:
    key = (id(gg), k)
    if key not in golds:
        B = make_features(gg, k)
        golds[key] = (B, spmm_scipy(gg, B))
    B, gold = golds[key]
    t0 = time.time()
    try:
        plan = mk(gg, dd)
        C = np.asarray(plan(jnp.asarray(B)))
        chk = res_check(gold, C, gg.degrees)
        rows.append((name, chk.err_frac, chk.max_err, time.time() - t0))
        status = "OK " if chk.ok else "BAD"
        print(f"[{status}] {name:34s} err_frac={chk.err_frac:.3g} "
              f"max_err={chk.max_err:.3g} wall={time.time()-t0:.1f}s",
              flush=True)
    except Exception as e:
        rows.append((name, None, None, time.time() - t0))
        print(f"[ERR] {name:34s} {e!r}", flush=True)

n_bad = sum(1 for _, ef, _, _ in rows if ef is None or ef > 1e-4)
print(f"\n{len(rows)-n_bad}/{len(rows)} configs pass on-chip res_check")
raise SystemExit(1 if n_bad else 0)
