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
    e = routing.expert_ids_sorted
    aabb = jax.lax.stop_gradient(params["aabbs"])[e]  # buffer, not trained
    unit, selector = contract_positions(positions_sorted, aabb)
    feats = hash_encode(params["hash_table"], unit, config.hash, expert_ids=e)
    feats = checkpoint_name(feats, "hash_enc")
    logit = apply_mlp_grouped(params["mlp"], feats, routing.group_sizes, e)[..., 0]
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
