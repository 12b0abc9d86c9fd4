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
        order=order,
        inverse=inverse,
        group_sizes=group_sizes,
        expert_ids_sorted=expert_ids[order],
    )


def route_positions(positions: jnp.ndarray, centroids: jnp.ndarray) -> Routing:
    return build_routing(assign_experts(positions, centroids), centroids.shape[0])


class PaddedRouting(NamedTuple):
    """Routing fused with the grouped-matmul block layout.

    The sorted-dispatch design (Routing) moves every MLP input through TWO
    permutes: sort-by-expert, then pad-to-block-aligned-slabs inside
    apply_mlp_grouped (and their inverses on the way out). Both maps are
    injections, so their composition is one injection: one gather puts any
    per-sample array straight into its padded block slot, and one gather
    brings results back. Measured on v5e each eliminated permute is a
    ~0.5M-row gather (~5-13 ns/row) in the forward, the remat recompute,
    AND the backward dual — this fusion removes ~half the routing gathers
    of a field evaluation.
    """

    to_slot: jnp.ndarray  # (n_pad,) int32: padded[s] = x[to_slot[s]]
    from_slot: jnp.ndarray  # (N,) int32: x[i] lives at padded slot from_slot[i]
    slot_valid: jnp.ndarray  # (n_pad,) bool — False on block-padding slots
    block_expert: jnp.ndarray  # (n_pad // block,) int32
    expert_of_slot: jnp.ndarray  # (n_pad,) int32
    group_sizes: jnp.ndarray  # (E,) int32


def build_padded_routing(expert_ids: jnp.ndarray, num_experts: int,
                         block: int) -> PaddedRouting:
    """Compose sort-by-expert with the block-padded slab layout."""
    from ..ops.mlp import _blocked_layout, block_offsets

    routing = build_routing(expert_ids, num_experts)
    n = expert_ids.shape[0]
    dest, src, slot_valid, block_expert, _n_pad = _blocked_layout(
        routing.group_sizes, n, block
    )
    # from_slot by offset arithmetic instead of the dest[inverse]
    # composition gather: row j sits at sorted position inverse[j], whose
    # expert is e_j, so its padded slot is pad_offset[e_j] + (inverse[j] -
    # orig_offset[e_j]). The two offset lookups hit E-row tables (~free on
    # v5e) where the composition was a second N-row gather (~5 ns/row,
    # measured; N ~ 1M per microbatch on the hot path). The offsets come
    # from the same block_offsets as _blocked_layout, so the padding rule
    # cannot drift between the two maps.
    _, pad_offsets, orig_offsets = block_offsets(routing.group_sizes, block)
    from_slot = (
        pad_offsets[expert_ids] + routing.inverse - orig_offsets[expert_ids]
    ).astype(jnp.int32)
    return PaddedRouting(
        to_slot=routing.order[src],
        from_slot=from_slot,
        slot_valid=slot_valid,
        block_expert=block_expert,
        expert_of_slot=jnp.repeat(block_expert, block),
        group_sizes=routing.group_sizes,
    )


def route_positions_padded(positions: jnp.ndarray, centroids: jnp.ndarray,
                           block: int) -> PaddedRouting:
    return build_padded_routing(
        assign_experts(positions, centroids), centroids.shape[0], block
    )


def pad_rows(x: jnp.ndarray, routing: PaddedRouting) -> jnp.ndarray:
    """x (N, ...) -> padded (n_pad, ...), zeros on padding slots; the exact
    VJP is the dual gather (ops/permute.py)."""
    from ..ops.permute import permute

    return permute(x, routing.to_slot, routing.from_slot,
                   fwd_valid=routing.slot_valid)


def unpad_rows(h: jnp.ndarray, routing: PaddedRouting) -> jnp.ndarray:
    """padded (n_pad, ...) -> (N, ...) in original row order."""
    from ..ops.permute import permute

    return permute(h, routing.from_slot, routing.to_slot,
                   bwd_valid=routing.slot_valid)
