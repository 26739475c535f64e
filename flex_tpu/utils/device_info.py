"""Device/platform info banner — the ``gp/cuda-gpuinfo.h`` analog.

The reference queries and prints GPU properties (SM count, clocks, memory)
through its external gp library before running (``common.h:4-6``; used
throughout ``flex.cu:run()``).  The TPU equivalent reports the JAX
backend's devices plus whatever memory statistics the runtime exposes,
and the measured-rate constants the autotuner runs on (the TPU has no
CUPTI-style clock query; docs/measurements.md carries the calibration).
"""
from __future__ import annotations


def device_info() -> list[dict]:
    """One dict per addressable device: platform/kind/id + memory stats
    (bytes_in_use / bytes_limit where the runtime exposes them)."""
    import jax

    out = []
    for d in jax.devices():
        row = {
            "id": d.id,
            "platform": d.platform,
            "kind": getattr(d, "device_kind", "?"),
            "process": getattr(d, "process_index", 0),
        }
        try:
            ms = d.memory_stats() or {}
            for key in ("bytes_in_use", "bytes_limit", "peak_bytes_in_use"):
                if key in ms:
                    row[key] = ms[key]
        except Exception:
            pass  # CPU / relay backends without memory_stats
        out.append(row)
    return out


def device_banner() -> str:
    """Human-readable one-liner-per-device banner for the CLI."""
    lines = []
    for r in device_info():
        mem = ""
        if "bytes_limit" in r:
            mem = (f" hbm {r.get('bytes_in_use', 0)/2**30:.2f}"
                   f"/{r['bytes_limit']/2**30:.1f} GiB")
        lines.append(
            f"  device {r['id']}: {r['platform']}/{r['kind']}{mem}")
    return "\n".join(lines) if lines else "  (no devices)"
