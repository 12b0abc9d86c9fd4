"""Proposal (density-only) fields, stacked over multi-scene experts.

Reference spec: nerfstudio-0.3.3/nerfstudio/fields/PreSight/
prop_density_field.py:38-156 + prop_density_field_ms.py (router mirror).
PreSight's two proposal nets (nerfacto_nusc_ms.py:115-123): 8 levels x 1
feature, 2^20 table, res 16->1024 and 16->4096, 2-layer MLP(64) -> 1.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..ops.hash_encoding import HashEncodingConfig, hash_encode, init_hash_table
from ..ops.math import contract_positions, trunc_exp
from ..ops.permute import sort_rows, unsort_rows
from ..ops.mlp import apply_mlp, apply_mlp_grouped, init_mlp
from .router import Routing, assign_experts, route_positions


@dataclasses.dataclass(frozen=True)
class PropFieldConfig:
    num_levels: int = 8
    base_res: int = 16
    max_res: int = 1024
    log2_hashmap_size: int = 20
    features_per_level: int = 1
    num_layers: int = 2
    hidden_dim: int = 64
    hash_init_scale: float = 1e-4
    hash_storage: str = "corner"
    shared_mlp: bool = False
    """One MLP shared by all experts (TPU profile): proposal capacity
    lives in the (expert-hashed) tables, and a shared density head removes
    the per-round routing sort and grouped-matmul permutes entirely —
    the proposal rounds touch 2/3 of all samples, so this is the hottest
    routing site. Reference semantics (per-expert MLPs,
    prop_density_field_ms.py) remain the default."""

    @property
    def hash(self) -> HashEncodingConfig:
        return HashEncodingConfig(
            num_levels=self.num_levels,
            min_res=self.base_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
            hash_init_scale=self.hash_init_scale,
            storage=self.hash_storage,
        )


def init_prop_field(
    key: jax.Array,
    config: PropFieldConfig,
    num_experts: int,
    aabbs: jnp.ndarray,
    centroids: jnp.ndarray,
) -> Dict:
    k_hash, k_mlp = jax.random.split(key)
    return {
        "hash_table": init_hash_table(k_hash, config.hash, num_experts),
        "mlp": init_mlp(
            k_mlp,
            in_dim=config.hash.out_dim,
            num_layers=config.num_layers,
            layer_width=config.hidden_dim,
            out_dim=1,
            num_experts=0 if config.shared_mlp else num_experts,
        ),
        "aabbs": aabbs,
        "centroids": centroids,
    }


def prop_density_sorted(
    params: Dict, config: PropFieldConfig, positions_sorted: jnp.ndarray, routing: Routing
) -> jnp.ndarray:
    """Density for pre-sorted positions (prop_density_field.py:129-153)."""
    if config.shared_mlp:
        raise ValueError(
            "prop_density_sorted requires stacked per-expert MLP params; "
            "shared_mlp configs use the sort-free path in prop_density")
    e = routing.expert_ids_sorted
    aabb = jax.lax.stop_gradient(params["aabbs"])[e]  # buffer, not trained
    unit, selector = contract_positions(positions_sorted, aabb)
    feats = hash_encode(params["hash_table"], unit, config.hash, expert_ids=e)
    feats = checkpoint_name(feats, "hash_enc")
    logit = apply_mlp_grouped(params["mlp"], feats, routing.group_sizes)[..., 0]
    return trunc_exp(logit) * selector


def prop_density(params: Dict, config: PropFieldConfig, positions: jnp.ndarray) -> jnp.ndarray:
    """Route + evaluate density for arbitrary (..., 3) world positions."""
    shape = positions.shape[:-1]
    flat = positions.reshape(-1, 3)
    if config.shared_mlp:
        # Sort-free path: per-expert AABB normalization is an unsorted
        # 16-row gather, the expert id folds into the hash, and the shared
        # MLP is one dense matmul stack.
        eids = assign_experts(flat, params["centroids"])
        aabb = jax.lax.stop_gradient(params["aabbs"])[eids]
        unit, selector = contract_positions(flat, aabb)
        feats = hash_encode(params["hash_table"], unit, config.hash, expert_ids=eids)
        feats = checkpoint_name(feats, "hash_enc")
        logit = apply_mlp(params["mlp"], feats)[..., 0]
        return (trunc_exp(logit) * selector).reshape(shape)
    routing = route_positions(flat, params["centroids"])
    dens = prop_density_sorted(
        params, config, sort_rows(flat, routing.order, routing.inverse), routing
    )
    return unsort_rows(dens, routing.order, routing.inverse).reshape(shape)


# ---------------------------------------------------------------------------
# Cached proposal density grid (the TPU-native first proposal round)
# ---------------------------------------------------------------------------
#
# The reference's first proposal round trains a full hash-grid density field
# and evaluates it on 128 samples/ray every step (ray_samplers.py:572-599 via
# prop_density_field.py). On v5e that round is pure table-row traffic: 128
# samples x num_levels gathers per ray, their backward duals, plus the
# grouped MLP — ~35% of the whole train step (PERFORMANCE.md round 2).
#
# TPU-native replacement (the -tpu profile, quality-gated): the first round
# reads a per-expert DENSE density grid over the contracted unit cube,
# stored one-row-per-cell with the 8 cell-corner densities in the row
# (exactly the 'cell' hash-table layout) — one gather + trilerp per sample,
# no MLP, no hash collisions, and NO backward at all (the grid is a cache,
# refreshed every K steps from the trained fine proposal field, which the
# interlevel loss keeps matched to the final NeRF weights). This is the
# Instant-NGP occupancy-grid idea applied to the proposal histogram.

from ..ops.hash_encoding import (  # noqa: E402  (module-level dep)
    _CORNER_BITS,
    trilerp_weights,
)


def prop_grid_cells(corner_density: jnp.ndarray) -> jnp.ndarray:
    """(E, G+1, G+1, G+1) corner densities -> (E * G^3, 8) cell rows.

    Row corner order matches _CORNER_BITS (bit=1 selects the +1 corner on
    that axis), so the trilerp weights are shared with hash_encode."""
    e = corner_density.shape[0]
    g = corner_density.shape[1] - 1
    cols = []
    for bx, by, bz in _CORNER_BITS:
        cols.append(
            corner_density[:, bx:bx + g, by:by + g, bz:bz + g]
        )
    cells = jnp.stack(cols, axis=-1)  # (E, G, G, G, 8)
    return cells.reshape(e * g * g * g, 8)


def prop_grid_density(
    grid_cells: jnp.ndarray,  # (E * G^3, 8) f32 cell rows
    centroids: jnp.ndarray,  # (E, 3)
    aabbs: jnp.ndarray,  # (E, 2, 3)
    positions: jnp.ndarray,  # (..., 3) world
    res: int,
) -> jnp.ndarray:
    """Density from the cached grid: route -> contract -> 1 gather -> trilerp.

    Always gradient-free (the grid is a cache, not a parameter)."""
    shape = positions.shape[:-1]
    flat = jax.lax.stop_gradient(positions.reshape(-1, 3))
    eids = assign_experts(flat, centroids)
    unit, selector = contract_positions(flat, aabbs[eids])
    scaled = unit * res
    fl = jnp.clip(jnp.floor(scaled), 0.0, res - 1)
    offset = jnp.clip(scaled - fl, 0.0, 1.0)  # (N, 3)
    cell = fl.astype(jnp.int32)
    cidx = (cell[..., 0] * res + cell[..., 1]) * res + cell[..., 2]
    rows = jax.lax.stop_gradient(grid_cells)[eids * (res * res * res) + cidx]
    w = trilerp_weights(offset)  # (N, 8)
    dens = jnp.sum(rows * w, axis=-1)
    return (dens * selector).reshape(shape)


def refresh_prop_grid(
    params: Dict,
    config: PropFieldConfig,
    res: int,
    num_experts: int,
) -> jnp.ndarray:
    """Evaluate the (trained) proposal field on every grid corner and pack
    cell rows. Runs every K steps on a host schedule — cost amortizes to
    noise (one round-1's worth of field evals per K steps).

    Corner coordinates are generated directly in contracted unit space, so
    no AABB inverse is needed and the out-of-range selector is identically
    1. The upper boundary face is evaluated at 1 - 2^-12 rather than
    exactly 1.0: under 'cell'/'shared' storage a coordinate of exactly 1.0
    makes hash_encode read floor-corner slots of the out-of-domain cell at
    index res_level — a row no training sample ever reaches (samples are
    strictly inside (0,1)), so its content is arbitrary — and
    prop_grid_density would then trilerp that value across the grid's whole
    outermost cell shell. The one-sided limit (the last in-domain cell's
    features) is the correct boundary value; 2^-12 keeps the f32 product
    scaled = x * res_level strictly below res_level for every level
    resolution in use (exact at 4096: 4096 * (1 - 2^-12) = 4095.0)."""
    n = (res + 1) ** 3
    lin = jnp.arange(res + 1, dtype=jnp.float32) / jnp.float32(res)
    lin = jnp.minimum(lin, jnp.float32(1.0 - 2.0 ** -12))
    gx, gy, gz = jnp.meshgrid(lin, lin, lin, indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(n, 3)  # (n, 3) unit coords

    def eval_expert(e):
        eids = jnp.full((n,), e, jnp.int32)
        feats = hash_encode(params["hash_table"], pts, config.hash, expert_ids=eids)
        if config.shared_mlp:
            logit = apply_mlp(params["mlp"], feats)[..., 0]
        else:
            logit = apply_mlp(
                [(w[e], b[e]) for (w, b) in params["mlp"]], feats
            )[..., 0]
        return trunc_exp(logit)

    corners = jax.lax.map(eval_expert, jnp.arange(num_experts))  # (E, n)
    corners = corners.reshape(num_experts, res + 1, res + 1, res + 1)
    return prop_grid_cells(corners)
