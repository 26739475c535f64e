"""SpMM kernel registry and dispatcher.

The reference explores ~36 CUDA kernel generations (``flex.cu:327-4124``);
the TPU design keeps a small set of structurally distinct strategies and an
autotuner that picks per matrix (SURVEY.md §7 step 4):

- ``"ref"``        — SciPy host reference (golden).
- ``"xla"``        — XLA take + segment-sum (always-correct device baseline).
- ``"ell"``        — width-bucketed row chunks (robust default).
- ``"panel"``      — hub row-split + dense-A MXU panels (high B-reuse).
- ``"band"``       — dense column-window MXU path (banded/RCM matrices).
- ``"windowed"``   — per-panel dense MXU windows + ELL residue hybrid
                     (community graphs after rbdeg/rabbit).
- ``"gespmm"``     — GE-SpMM row-parallel port (documented-negative
                     baseline, flex.cu:81-273).
- ``"bcoo"``       — jax.experimental.sparse BCOO dot_general (second stock
                     baseline; the reference keeps two in-tree external
                     baselines the same way, flex.cu:81-273 + aspt/).
"""
from __future__ import annotations


def spmm(g, B, method: str = "xla", **kwargs):
    """Compute ``C = A @ B`` for CSRGraph ``g`` and dense ``B``."""
    from flex_tpu.ops import ref as _ref
    from flex_tpu.ops import xla_spmm as _xla

    if method == "ref":
        return _ref.spmm_scipy(g, B)
    if method == "xla":
        return _xla.spmm_xla(g, B, **kwargs)
    if method == "ell":
        from flex_tpu.ops import ell_spmm as _ell

        return _ell.spmm_ell(g, B, **kwargs)
    if method == "band":
        from flex_tpu.ops import pallas_band as _band

        return _band.spmm_band(g, B, **kwargs)
    if method == "panel":
        from flex_tpu.ops import panel_spmm as _panel

        return _panel.spmm_panel(g, B, **kwargs)
    if method == "windowed":
        from flex_tpu.ops import window_spmm as _win

        return _win.spmm_windowed(g, B, **kwargs)
    if method == "gespmm":
        from flex_tpu.ops import gespmm as _ge

        return _ge.spmm_gespmm(g, B, **kwargs)
    if method == "bcoo":
        from flex_tpu.ops import bcoo_spmm as _bcoo

        return _bcoo.spmm_bcoo(g, B, **kwargs)
    raise ValueError(f"unknown spmm method {method!r}")
