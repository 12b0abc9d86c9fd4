"""Direction-only sky background field, stacked over multi-scene experts.

Reference spec: nerfstudio-0.3.3/nerfstudio/fields/PreSight/sky_field.py:40-122
(per-ray SH(4) direction encoding + appearance embedding -> RGB MLP with
sigmoid; separate semantic head without appearance) and sky_field_ms.py:75-117
(router keyed on ray *origin*, one eval per ray).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.math import sh_encoding
from ..ops.mlp import apply_mlp_grouped, init_mlp
from .router import Routing


@dataclasses.dataclass(frozen=True)
class SkyFieldConfig:
    mlp_num_layers: int = 3
    mlp_layer_width: int = 32
    appearance_embedding_dim: int = 16
    use_semantics: bool = True
    semantic_dim: int = 64


def init_sky_field(
    key: jax.Array, config: SkyFieldConfig, num_experts: int, centroids: jnp.ndarray
) -> Dict:
    k_rgb, k_sem = jax.random.split(key)
    params = {
        "rgb_head": init_mlp(
            k_rgb,
            in_dim=16 + config.appearance_embedding_dim,
            num_layers=config.mlp_num_layers,
            layer_width=config.mlp_layer_width,
            out_dim=3,
            num_experts=num_experts,
        ),
        "centroids": centroids,
    }
    if config.use_semantics:
        params["semantic_head"] = init_mlp(
            k_sem,
            in_dim=16,
            num_layers=config.mlp_num_layers,
            layer_width=config.mlp_layer_width,
            out_dim=config.semantic_dim,
            num_experts=num_experts,
        )
    return params


def sky_outputs_sorted(
    params: Dict,
    config: SkyFieldConfig,
    directions_sorted: jnp.ndarray,  # (R, 3) per-ray unit directions
    appearance_sorted: Optional[jnp.ndarray],  # (R, A) or None
    routing: Routing,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Per-ray sky RGB (+ semantics) for rays sorted by origin-expert."""
    d_enc = sh_encoding(directions_sorted, levels=4)
    if appearance_sorted is not None:
        rgb_in = jnp.concatenate([d_enc, appearance_sorted], axis=-1)
    else:
        rgb_in = d_enc
    rgb = apply_mlp_grouped(
        params["rgb_head"], rgb_in, routing.group_sizes,
        out_activation=jax.nn.sigmoid,
    )
    semantics = None
    if config.use_semantics:
        semantics = apply_mlp_grouped(
            params["semantic_head"], d_enc, routing.group_sizes,
        )
    return rgb, semantics
