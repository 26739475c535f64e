"""Result verification with the reference's per-row tolerance model.

Re-implements ``resCheck`` (``flex.cu:4154-4213``): tolerance for row r is
``eps_f32 · row_nnz(r) · 4`` — relative error when |gold| ≥ 1, absolute
otherwise; also asserts the gold output is not mostly zeros
(``flex.cu:4210``).  ``res_check2`` is the simpler |diff| > tol variant
(``flex.cu:4214-4231``).
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CheckResult:
    n_bad: int
    n_total: int
    max_err: float
    err_frac: float  # the README's "Errs %" as a fraction

    @property
    def ok(self) -> bool:
        return self.n_bad == 0


def res_check(
    gold: np.ndarray,
    res: np.ndarray,
    row_nnz: np.ndarray,
    eps_scale: float = 4.0,
    max_report: int = 20,
    verbose: bool = False,
) -> CheckResult:
    """Per-row-tolerance comparison (reference ``flex.cu:4168-4177``)."""
    gold = np.asarray(gold, dtype=np.float32)
    res = np.asarray(res, dtype=np.float32)
    assert gold.shape == res.shape, (gold.shape, res.shape)
    eps = np.finfo(np.float32).eps
    tol = (eps * eps_scale) * np.maximum(row_nnz, 1).astype(np.float64)[:, None]

    diff = np.abs(gold.astype(np.float64) - res.astype(np.float64))
    denom = np.abs(gold.astype(np.float64))
    err = np.where(denom >= 1.0, diff / np.maximum(denom, 1e-300), diff)
    bad = err > tol

    n_bad = int(bad.sum())
    if verbose and n_bad:
        idx = np.argwhere(bad)[:max_report]
        for r, c in idx:
            print(
                f"  mismatch C[{r},{c}]: gold={gold[r, c]:.6g} got={res[r, c]:.6g} "
                f"err={err[r, c]:.3g} tol={tol[r, 0]:.3g}"
            )
    # Gold-sanity: the reference asserts the gold isn't mostly zeros.
    nz_frac = float((gold != 0).mean()) if gold.size else 0.0
    if gold.size and nz_frac < 0.01:
        raise AssertionError(f"gold output suspiciously sparse ({nz_frac:.2%} nonzero)")

    return CheckResult(
        n_bad=n_bad,
        n_total=gold.size,
        max_err=float(err.max()) if gold.size else 0.0,
        err_frac=n_bad / max(gold.size, 1),
    )


def res_check2(gold: np.ndarray, res: np.ndarray, tol: float = 0.01) -> CheckResult:
    """Plain absolute-difference check (reference ``flex.cu:4214-4231``)."""
    diff = np.abs(np.asarray(gold, np.float64) - np.asarray(res, np.float64))
    bad = diff > tol
    return CheckResult(
        n_bad=int(bad.sum()),
        n_total=diff.size,
        max_err=float(diff.max()) if diff.size else 0.0,
        err_frac=float(bad.mean()) if diff.size else 0.0,
    )
