"""Checkpoint / resume for model training.

The reference persists nothing (SURVEY.md §5.4); the framework adds
orbax-backed save/restore so long GCN training runs survive preemption —
table stakes for a production training loop on TPU pods.
"""
from __future__ import annotations

import os
from typing import Any


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    step: int = 0) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        path,
        {"params": params, "opt_state": opt_state, "step": step},
        force=True,
    )


def restore_checkpoint(path: str, target: Any = None) -> dict:
    """Restore a checkpoint written by :func:`save_checkpoint`.

    Pass ``target`` — a pytree of the same structure with concrete or
    abstract leaves, e.g. ``{"params": params0, "opt_state": opt.init(
    params0), "step": 0}`` — so container *types* are reconstructed.
    Without it, optax namedtuples come back as plain dicts and
    ``optimizer.update`` fails on resume (round-1 advisor, medium).
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if target is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(os.path.abspath(path), item=target)
