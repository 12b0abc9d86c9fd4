"""The main iNGP radiance/semantic field, stacked over multi-scene experts.

Reference spec: nerfstudio-0.3.3/nerfstudio/fields/PreSight/ingp_field.py
(single sub-field) + ingp_field_ms.py (the nearest-centroid router). Here a
single parameter pytree holds *all* experts:

  hash_table       (E * L * T, F)  — expert slabs concatenated; the expert id
                                     folds into the gather index
  base_mlp         [(E, 40, 64), (E, 64, 1+15+64)]
  semantic_head    3 x (E, 64, 64)
  rgb_head         (E, 16+15+A, 64), (E, 64, 64), (E, 64, 3)
  aabbs            (E, 2, 3) buffer; centroids (E, 3) buffer

Evaluation consumes a Routing (sorted-by-expert dispatch, fields/router.py):
hash lookup is a single gather; each MLP layer is one ragged_dot.

Architecture constants mirror ingp_field.py:72-167 with PreSight's model
config (nerfacto_nusc_ms.py:91-104): 10 levels x 4 features, 2^20 table,
res 16->16384, hidden 64, geo_feat 15, semantic 64, appearance emb 16.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..ops.hash_encoding import HashEncodingConfig, hash_encode, init_hash_table
from ..ops.math import contract_positions, sh_encoding, trunc_exp
from ..ops.mlp import apply_mlp_blocks, apply_mlp_grouped, init_mlp
from .router import PaddedRouting, Routing


@dataclasses.dataclass(frozen=True)
class INGPFieldConfig:
    num_levels: int = 10
    base_res: int = 16
    max_res: int = 16384
    log2_hashmap_size: int = 20
    features_per_level: int = 4
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    appearance_embedding_dim: int = 16  # appearance(4) + video(12)
    use_semantics: bool = True
    semantic_dim: int = 64
    hidden_dim_semantic_head: int = 64
    hash_init_scale: float = 1e-4
    hash_storage: str = "corner"

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

    @property
    def sem_dim(self) -> int:
        return self.semantic_dim if self.use_semantics else 0

    @property
    def base_out_dim(self) -> int:
        return 1 + self.geo_feat_dim + self.sem_dim


def init_ingp_field(
    key: jax.Array,
    config: INGPFieldConfig,
    num_experts: int,
    aabbs: jnp.ndarray,
    centroids: jnp.ndarray,
) -> Dict:
    """Stacked-expert parameter pytree. aabbs (E,2,3), centroids (E,3)."""
    k_hash, k_base, k_sem, k_rgb = jax.random.split(key, 4)
    params = {
        "hash_table": init_hash_table(k_hash, config.hash, num_experts),
        "base_mlp": init_mlp(
            k_base,
            in_dim=config.hash.out_dim,
            num_layers=config.num_layers,
            layer_width=config.hidden_dim,
            out_dim=config.base_out_dim,
            num_experts=num_experts,
        ),
        "rgb_head": init_mlp(
            k_rgb,
            in_dim=16 + config.geo_feat_dim + config.appearance_embedding_dim,
            num_layers=config.num_layers_color,
            layer_width=config.hidden_dim_color,
            out_dim=3,
            num_experts=num_experts,
        ),
        "aabbs": aabbs,
        "centroids": centroids,
    }
    if config.use_semantics:
        params["semantic_head"] = init_mlp(
            k_sem,
            in_dim=config.semantic_dim,
            num_layers=3,
            layer_width=config.hidden_dim_semantic_head,
            out_dim=config.semantic_dim,
            num_experts=num_experts,
        )
    return params


def density_and_embedding_sorted(
    params: Dict,
    config: INGPFieldConfig,
    positions_sorted: jnp.ndarray,  # (N, 3) world coords, sorted by expert
    routing: Routing,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Density + raw embedding for pre-sorted positions.

    Mirrors iNGPField.density_fn (ingp_field.py:170-196): AABB-normalize,
    contract, out-of-range selector, hash encode, base MLP, split density
    logit from the (geo | semantic) embedding, trunc_exp, zero out-of-range.

    Returns (density (N,), geo_feat (N, geo), sem_feat (N, sem) or None-size).
    """
    e = routing.expert_ids_sorted
    aabb = jax.lax.stop_gradient(params["aabbs"])[e]  # (N, 2, 3) buffer, not trained
    unit, selector = contract_positions(positions_sorted, aabb)
    feats = hash_encode(params["hash_table"], unit, config.hash, expert_ids=e)
    # Named so the remat policy can SAVE encodings: re-gathering the table
    # rows in the backward pass costs ~2x the forward's gather time, while
    # the saved (N, L*F) activation is small.
    feats = checkpoint_name(feats, "hash_enc")
    h = apply_mlp_grouped(params["base_mlp"], feats, routing.group_sizes)
    density_logit = h[..., 0]
    geo_feat = h[..., 1 : 1 + config.geo_feat_dim]
    sem_feat = h[..., 1 + config.geo_feat_dim :]
    density = trunc_exp(density_logit) * selector
    return density, geo_feat, sem_feat


def density_and_embedding_padded(
    params: Dict,
    config: INGPFieldConfig,
    positions_padded: jnp.ndarray,  # (n_pad, 3), block-padded by expert
    routing: PaddedRouting,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """density_and_embedding_sorted on a PaddedRouting layout: identical math
    (same rows land in the same blocks), but the grouped-MLP pad/unpad
    permutes are gone — results stay in padded slots for the other heads."""
    e = routing.expert_of_slot
    aabb = jax.lax.stop_gradient(params["aabbs"])[e]  # (n_pad, 2, 3) buffer
    unit, selector = contract_positions(positions_padded, aabb)
    feats = hash_encode(params["hash_table"], unit, config.hash, expert_ids=e)
    feats = checkpoint_name(feats, "hash_enc")
    h = apply_mlp_blocks(params["base_mlp"], feats, routing.block_expert)
    density_logit = h[..., 0]
    geo_feat = h[..., 1 : 1 + config.geo_feat_dim]
    sem_feat = h[..., 1 + config.geo_feat_dim :]
    density = trunc_exp(density_logit) * selector
    return density, geo_feat, sem_feat


def rgb_padded(
    params: Dict,
    config: INGPFieldConfig,
    directions_padded: jnp.ndarray,  # (n_pad, 3) unit
    geo_feat_padded: jnp.ndarray,  # (n_pad, geo)
    appearance_padded: Optional[jnp.ndarray],  # (n_pad, A) or None
    routing: PaddedRouting,
) -> jnp.ndarray:
    """rgb_sorted on a PaddedRouting layout (ingp_field.py:198-243)."""
    d_enc = sh_encoding(directions_padded, levels=4)
    parts = [d_enc, geo_feat_padded]
    if appearance_padded is not None:
        parts.append(appearance_padded)
    h = jnp.concatenate(parts, axis=-1)
    return apply_mlp_blocks(
        params["rgb_head"], h, routing.block_expert,
        out_activation=jax.nn.sigmoid,
    )


def semantics_padded(
    params: Dict,
    config: INGPFieldConfig,
    sem_feat_padded: jnp.ndarray,
    routing: PaddedRouting,
) -> jnp.ndarray:
    """semantics_sorted on a PaddedRouting layout."""
    return apply_mlp_blocks(
        params["semantic_head"], sem_feat_padded, routing.block_expert
    )


def rgb_sorted(
    params: Dict,
    config: INGPFieldConfig,
    directions_sorted: jnp.ndarray,  # (N, 3) unit
    geo_feat_sorted: jnp.ndarray,  # (N, geo)
    appearance_sorted: Optional[jnp.ndarray],  # (N, A) or None
    routing: Routing,
) -> jnp.ndarray:
    """RGB head (ingp_field.py:198-243): SH(4) dir encoding + geo features +
    appearance embedding -> 3-layer MLP -> sigmoid."""
    d_enc = sh_encoding(directions_sorted, levels=4)
    parts = [d_enc, geo_feat_sorted]
    if appearance_sorted is not None:
        parts.append(appearance_sorted)
    h = jnp.concatenate(parts, axis=-1)
    return apply_mlp_grouped(
        params["rgb_head"], h, routing.group_sizes,
        out_activation=jax.nn.sigmoid,
    )


def semantics_sorted(
    params: Dict,
    config: INGPFieldConfig,
    sem_feat_sorted: jnp.ndarray,
    routing: Routing,
) -> jnp.ndarray:
    """Semantic head on the semantic split of the base embedding
    (ingp_field.py:144-151, 205-211)."""
    return apply_mlp_grouped(
        params["semantic_head"], sem_feat_sorted, routing.group_sizes,
    )
