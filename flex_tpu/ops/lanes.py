"""Feature-dim (lane) padding helpers.

Sub-128-lane layouts are pathological on TPU (k=32 measured 3-19x slower
through gather chains and 21% slower through the dense Pallas windowed
path — docs/measurements.md): last-dim < 128 tensors pad 4x in registers
and the chains lose their vector layout.  Padding B's feature dim to 128
costs ~zero wall time (the chains are row/step-rate-bound) and restores
the measured-fast path; the result is sliced back at the end.

The optimization barriers matter: without them XLA distributes the pad
over the downstream gather (``gather(concat(B, 0)) →
concat(gather(B), 0)``) or sinks the final slice back through the chain,
recreating the narrow-lane layout either way (cf. ``_ell_spmm``, which
inlines the same pattern).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_k_lanes(B):
    """Pad ``B``'s feature dim up to 128 lanes behind a barrier
    (no-op when k >= 128)."""
    k = B.shape[1]
    if k >= 128:
        return B
    return jax.lax.optimization_barrier(jnp.concatenate(
        [B, jnp.zeros((B.shape[0], 128 - k), B.dtype)], axis=1))


def unpad_k_lanes(out, k: int):
    """Slice a padded result back to ``k`` columns behind a barrier
    (no-op when nothing was padded)."""
    if out.shape[1] == k:
        return out
    return jax.lax.optimization_barrier(out)[:, :k]
