"""Multi-scene expert routing: the TPU-native replacement for the reference's
iNGPFieldMS / PropNetDensityFieldMS / SkyFieldMS Python loops.

The reference routes each sample to the nearest-centroid sub-field, then runs
each sub-field on a boolean-masked subset and scatters results back
(nerfstudio-0.3.3/nerfstudio/fields/PreSight/ingp_field_ms.py:80-129). That
design is serial over experts and dynamic-shaped — both hostile to XLA.

Here the experts' parameters are *stacked* along a leading axis and samples
are *sorted* by expert id once; every per-expert MLP layer then becomes a
single `jax.lax.ragged_dot` (grouped matmul) over the sorted batch, and the
hash-table lookup folds the expert id into the gather index (see
ops/hash_encoding.py). One sort + one unsort replaces E masked passes, with
fully static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Routing(NamedTuple):
    """Sorted-dispatch bookkeeping for a flat batch of N samples."""

    expert_ids: jnp.ndarray  # (N,) int32, original order
    order: jnp.ndarray  # (N,) int32: sorted_x = x[order]
    inverse: jnp.ndarray  # (N,) int32: x = sorted_x[inverse]
    group_sizes: jnp.ndarray  # (E,) int32
    expert_ids_sorted: jnp.ndarray  # (N,) int32


def assign_experts(positions: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """Nearest-centroid assignment (cdist argmin, ingp_field_ms.py:97).

    positions: (N, 3); centroids: (E, 3). Returns (N,) int32.
    """
    d2 = jnp.sum((positions[:, None, :] - centroids[None, :, :]) ** 2, axis=-1)
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


def build_routing(expert_ids: jnp.ndarray, num_experts: int) -> Routing:
    """Stable sort by expert id + group sizes for ragged_dot dispatch."""
    order = jnp.argsort(expert_ids, stable=True).astype(jnp.int32)
    # inverse[order[i]] = i. argsort(order) equals that permutation inverse
    # and costs one more sort (~2.5 ns/element) instead of the scatter XLA
    # would emit for zeros.at[order].set(arange) (~16 ns/element).
    inverse = jnp.argsort(order).astype(jnp.int32)
    group_sizes = jnp.bincount(expert_ids, length=num_experts).astype(jnp.int32)
    return Routing(
        expert_ids=expert_ids,
        order=order,
        inverse=inverse,
        group_sizes=group_sizes,
        expert_ids_sorted=expert_ids[order],
    )


def route_positions(positions: jnp.ndarray, centroids: jnp.ndarray) -> Routing:
    return build_routing(assign_experts(positions, centroids), centroids.shape[0])
