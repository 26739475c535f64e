"""2D-sharded GCN training: rows (data-parallel) × features (model-parallel).

Composes the framework's two parallelism axes over one mesh
(SURVEY.md §5.8, BASELINE config 5):

- axis "x": the adjacency's row shards (ShardedEllPlan, shard_map) — the
  SpMM analog of data parallelism; C comes out row-sharded.
- axis "y": dense GCN weights column-sharded (tensor parallelism for the
  X·W GEMMs); XLA/GSPMD inserts the all-gathers/reduce-scatters from
  sharding constraints.

Gradients flow through both (shard_map is differentiable; replicated
leaves get psum'd automatically).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flex_tpu.models.gcn import GCN, gcn_loss


def shard_params_2d(params: dict, mesh: Mesh, model_axis: str = "y") -> dict:
    """Column-shard the weight matrices over the model axis; biases and
    everything else replicated."""
    y = mesh.shape[model_axis]
    out = {}
    for name, p in params.items():
        if name.startswith("W") and p.shape[-1] % y == 0:
            out[name] = jax.device_put(
                p, NamedSharding(mesh, P(None, model_axis))
            )
        else:  # replicate biases and non-divisible widths (e.g. pubmed c=3)
            out[name] = jax.device_put(p, NamedSharding(mesh, P()))
    return out


def make_train_step_2d(
    model: GCN, plan, optimizer, mesh: Mesh, model_axis: str = "y"
) -> Callable:
    """Like models.gcn.make_train_step, but pins the weight shardings so the
    dense GEMMs run tensor-parallel over ``model_axis`` while the SpMM runs
    row-parallel inside the plan's shard_map."""

    # NB: do not name this `y` — _step's label argument would shadow it
    # if constrain were ever inlined there
    axis_size = mesh.shape[model_axis]

    def constrain(params):
        return {
            name: (
                jax.lax.with_sharding_constraint(
                    p, NamedSharding(mesh, P(None, model_axis))
                )
                if name.startswith("W") and p.shape[-1] % axis_size == 0
                else p
            )
            for name, p in params.items()
        }

    from flex_tpu.models.common import make_step

    return make_step(
        lambda p, plan_, X, y, mask: gcn_loss(model, constrain(p), plan_,
                                              X, y, mask),
        plan, optimizer)
