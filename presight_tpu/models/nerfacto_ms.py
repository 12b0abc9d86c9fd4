"""NerfactoNuscMS: the PreSight city-tile NeRF, assembled TPU-native.

Reference spec: nerfstudio-0.3.3/nerfstudio/models/PreSight/
nerfacto_nusc_ms.py (config :76-201, modules :212-385, forward :452-546,
losses :558-645, depth-only inference :688-734).

Everything is functional: ``init_model`` builds one parameter pytree holding
the stacked multi-scene fields, two proposal fields, the sky field, and the
appearance/video embeddings; ``forward`` is a pure function of
(params, rays, rng, schedule scalars) designed to jit end-to-end — the whole
sample->field->render->loss graph compiles into one XLA program per
(train/eval x stop_prop_grad) variant.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.ingp_field import (
    INGPFieldConfig,
    density_and_embedding_padded,
    init_ingp_field,
    rgb_padded,
    semantics_padded,
)
from ..fields.prop_field import (
    PropFieldConfig,
    init_prop_field,
    prop_density,
    prop_grid_density,
    refresh_prop_grid,
)
from ..fields.router import (
    assign_experts,
    build_routing,
    pad_rows,
    route_positions_padded,
    unpad_rows,
)
from ..fields.sky_field import SkyFieldConfig, init_sky_field, sky_outputs_sorted
from ..ops import losses as L
from ..ops.permute import sort_rows, unsort_rows
from ..ops.rays import RayBundle, RaySamples, get_weights
from ..ops.renderers import (
    render_accumulation,
    render_depth_expected,
    render_depth_median,
)
from ..ops.samplers import SpacingSpec, proposal_sample
from ..ops.stepfun import distortion_loss, interlevel_loss, z_anti_aliasing_interlevel_loss


@dataclasses.dataclass(frozen=True)
class NerfactoNuscMSConfig:
    """Mirrors NerfactoNuscMSModelConfig (nerfacto_nusc_ms.py:76-201)."""

    eval_num_rays_per_chunk: int = 1 << 15
    near_plane: float = 0.1
    far_plane: float = 1000.0
    hidden_dim: int = 64
    hidden_dim_color: int = 64
    num_levels: int = 10
    base_res: int = 16
    max_res: int = 16384
    log2_hashmap_size: int = 20
    features_per_level: int = 4
    num_proposal_samples_per_ray: Tuple[int, ...] = (128, 64)
    num_nerf_samples_per_ray: int = 64
    proposal_update_every: int = 5
    proposal_warmup: int = 1000
    num_proposal_iterations: int = 2
    use_same_proposal_network: bool = False
    """Share one proposal field across both rounds (nerfacto_nusc_ms.py:263-276)."""
    proposal_net_args_list: Tuple[Dict, ...] = (
        dict(features_per_level=1, log2_hashmap_size=20, num_levels=8,
             base_res=16, max_res=1024),
        dict(features_per_level=1, log2_hashmap_size=20, num_levels=8,
             base_res=16, max_res=4096),
    )
    piecewise_sampler_threshold: float = 1.0
    interlevel_loss_mult: float = 1.0
    enable_z_anti_aliasing: bool = True
    pulse_width: Tuple[float, ...] = (0.03, 0.003)
    distortion_loss_mult: float = 0.002
    use_proposal_weight_anneal: bool = True
    use_average_appearance_embedding: bool = True
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 1000
    use_single_jitter: bool = True
    appearance_embed_dim: int = 4
    video_embed_dim: int = 12
    use_sky_model: bool = True
    num_sky_mlp_layers: int = 3
    sky_mlp_dims: int = 32
    sky_loss_mult: float = 0.001
    use_lidar_loss: bool = True
    expected_depth_loss_mult: float = 1.0
    lidar_depth_upperbound: float = 75.0
    line_of_sight_mult: float = 0.1
    line_of_sight_decay_steps: int = 5000
    line_of_sight_start_step: int = 1000
    line_of_sight_end_step: int = 30000
    line_of_sight_max_sigma: float = 5.0
    line_of_sight_min_sigma: float = 2.0
    use_semantics: bool = True
    semantic_dim: int = 64
    semantic_loss_mult: float = 0.5
    use_monodepth_loss: bool = False
    monodepth_loss_inverse: bool = False
    monodepth_depth_upperbound: float = 40.0
    pose_scale_factor: float = 1.0  # dataparser metadata, static per run
    prop_shared_mlp: bool = False
    """Share one proposal-density MLP across experts (see
    fields/prop_field.py PropFieldConfig.shared_mlp). -tpu profiles only;
    quality-gated by the PSNR study."""
    prop_grid_res: int = 0
    """> 0 enables the cached-density-grid first proposal round (-tpu
    profiles only; see fields/prop_field.py prop_grid_density): round 1
    reads a per-expert G^3 dense grid (1 gather/sample, no MLP, no
    backward) refreshed every ``prop_grid_update_every`` steps from the
    fine proposal field. Replaces the round-1 hash field entirely; its
    interlevel-loss term (gradient-free under the cache) is dropped.
    Quality-gated by the PSNR study (QUALITY.md)."""
    prop_grid_update_every: int = 128
    prop_grid_warmup_steps: int = 1024
    prop_grid_warmup_every: int = 16
    """Early training refreshes the grid every ``prop_grid_warmup_every``
    steps (the fine prop field is still moving fast), then every
    ``prop_grid_update_every``."""
    compute_dtype: str = "float32"
    hash_storage: str = "corner"
    """'corner' = reference-exact iNGP rows; 'cell' = TPU-first one-row-per-
    cell layout (8x fewer row gathers/scatters; see ops/hash_encoding.py)."""
    remat: bool = True
    """Rematerialize field evaluations in the backward pass. The hash-grid
    gather's saved corner features dominate activation memory (8 corners x
    features x levels per sample); recomputing them trades cheap
    bandwidth-bound FLOPs for ~5-10x activation memory, letting large ray
    batches fit in 16 GB HBM."""

    @property
    def appearance_dim(self) -> int:
        return self.appearance_embed_dim + self.video_embed_dim

    @property
    def field(self) -> INGPFieldConfig:
        return INGPFieldConfig(
            num_levels=self.num_levels,
            base_res=self.base_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
            hidden_dim=self.hidden_dim,
            hidden_dim_color=self.hidden_dim_color,
            appearance_embedding_dim=self.appearance_dim,
            use_semantics=self.use_semantics,
            semantic_dim=self.semantic_dim,
            hash_storage=self.hash_storage,
        )

    @property
    def use_prop_grid(self) -> bool:
        return self.prop_grid_res > 0

    def prop(self, i: int) -> PropFieldConfig:
        args = self.proposal_net_args_list[min(i, len(self.proposal_net_args_list) - 1)]
        return PropFieldConfig(
            num_levels=args["num_levels"],
            base_res=args["base_res"],
            max_res=args["max_res"],
            log2_hashmap_size=args["log2_hashmap_size"],
            features_per_level=args["features_per_level"],
            hash_storage=self.hash_storage,
            shared_mlp=self.prop_shared_mlp,
        )

    @property
    def sky(self) -> SkyFieldConfig:
        return SkyFieldConfig(
            mlp_num_layers=self.num_sky_mlp_layers,
            mlp_layer_width=self.sky_mlp_dims,
            appearance_embedding_dim=self.appearance_dim,
            use_semantics=self.use_semantics,
            semantic_dim=self.semantic_dim,
        )

    @property
    def spacing(self) -> SpacingSpec:
        return SpacingSpec("piecewise_threshold", threshold=self.piecewise_sampler_threshold)


def init_model(
    key: jax.Array,
    config: NerfactoNuscMSConfig,
    aabbs: np.ndarray,  # (E, 2, 3)
    centroids: np.ndarray,  # (E, 3)
    num_train_cameras: int,
    num_train_videos: int,
) -> Dict:
    """Build the full parameter pytree (nerfacto_nusc_ms.py:212-385)."""
    num_experts = int(aabbs.shape[0])
    aabbs = np.asarray(aabbs, np.float32)
    centroids = np.asarray(centroids, np.float32)
    keys = jax.random.split(key, 3 + config.num_proposal_iterations)

    # Each sub-field gets its own copy of the aabb/centroid buffers: sharing
    # one jnp array across sub-trees breaks buffer donation in the jitted
    # train step ("donate the same buffer twice").
    def buf(x):
        return jnp.array(x, jnp.float32)

    # Proposal rounds backed by trained hash fields. With the cached grid
    # (-tpu profile) round 0 has no parameters at all — props[j] holds the
    # field for round j+1.
    prop_rounds = list(range(1 if config.use_prop_grid else 0,
                             config.num_proposal_iterations))
    if config.use_same_proposal_network:
        prop_rounds = prop_rounds[:1]
    params = {
        "field": init_ingp_field(keys[0], config.field, num_experts, buf(aabbs), buf(centroids)),
        "props": [
            init_prop_field(keys[1 + i], config.prop(i), num_experts, buf(aabbs), buf(centroids))
            for i in prop_rounds
        ],
    }
    if config.use_sky_model:
        params["sky"] = init_sky_field(keys[-2], config.sky, num_experts, buf(centroids))
    # torch nn.Embedding default init: N(0, 1).
    k_app, k_vid = jax.random.split(keys[-1])
    if config.appearance_embed_dim > 0:
        params["appearance_embedding"] = jax.random.normal(
            k_app, (num_train_cameras, config.appearance_embed_dim), jnp.float32
        )
    if config.video_embed_dim > 0:
        params["video_embedding"] = jax.random.normal(
            k_vid, (num_train_videos, config.video_embed_dim), jnp.float32
        )
    return params


_BUFFER_KEYS = ("aabbs", "centroids")


def param_groups(params: Dict) -> Dict:
    """Optimizer group labels mirroring Model.get_param_groups
    (nerfacto_nusc_ms.py:404-414): proposal networks in one group, all other
    trainables in 'fields'. The aabb/centroid *buffers* (registered buffers
    in the reference, not parameters) are labeled 'frozen' — the optimizer
    must pair that label with optax.set_to_zero()."""

    def label_tree(tree, group):
        if isinstance(tree, dict):
            return {
                k: ("frozen" if k in _BUFFER_KEYS else label_tree(v, group))
                for k, v in tree.items()
            }
        return jax.tree_util.tree_map(lambda _: group, tree)

    return {
        name: label_tree(sub, "proposal_networks" if name == "props" else "fields")
        for name, sub in params.items()
    }


def _embed_appearance(
    params: Dict, config: NerfactoNuscMSConfig, ray_samples: RaySamples, train: bool
) -> Optional[jnp.ndarray]:
    """Per-ray appearance embedding: train gathers by camera/video index;
    eval uses the mean embedding (nerfacto_nusc_ms.py:456-494)."""
    if config.appearance_dim == 0:
        return None
    num_rays = ray_samples.starts.shape[0]
    parts = []
    if config.appearance_embed_dim > 0:
        emb = params["appearance_embedding"]
        if train:
            parts.append(emb[ray_samples.camera_indices])
        else:
            parts.append(jnp.broadcast_to(emb.mean(axis=0), (num_rays, emb.shape[-1])))
    if config.video_embed_dim > 0:
        emb = params["video_embedding"]
        if train:
            parts.append(emb[ray_samples.video_ids])
        else:
            parts.append(jnp.broadcast_to(emb.mean(axis=0), (num_rays, emb.shape[-1])))
    return jnp.concatenate(parts, axis=-1)


def apply_collider(bundle: RayBundle, config: NerfactoNuscMSConfig) -> RayBundle:
    """NearFarCollider (scene_colliders.py:169): constant near/far planes."""
    num_rays = bundle.origins.shape[0]
    dtype = bundle.origins.dtype
    return bundle.replace(
        nears=jnp.full((num_rays,), config.near_plane, dtype),
        fars=jnp.full((num_rays,), config.far_plane, dtype),
    )


# Rematerialize everything inside the checkpointed field regions EXCEPT the
# hash-grid encodings (re-gathering table rows in the backward pass costs as
# much as the forward gather, while the saved (N, L*F) encodings are a small
# fraction of the per-sample feature activations remat is there to free) and
# the routing maps (int32; recomputing them costs two 0.5M-element argsorts).
_REMAT_POLICY = jax.checkpoint_policies.save_only_these_names(
    "hash_enc", "routing"
)


def _density_fns(params: Dict, config: NerfactoNuscMSConfig,
                 prop_grid: Optional[jnp.ndarray] = None):
    def make_field(round_idx):
        # With use_same_proposal_network, every round evaluates prop field 0
        # (nerfacto_nusc_ms.py:263-276). With the cached grid, props[j]
        # backs round j+1.
        first_round = 1 if config.use_prop_grid else 0
        if config.use_same_proposal_network:
            cfg_idx = first_round
            list_idx = 0
        else:
            cfg_idx = round_idx
            list_idx = round_idx - first_round

        def fn(prop_params, positions):
            return prop_density(prop_params, config.prop(cfg_idx), positions)

        if config.remat:
            fn = jax.checkpoint(fn, policy=_REMAT_POLICY)
        return lambda positions: fn(params["props"][list_idx], positions)

    def make_grid():
        if prop_grid is None:
            raise ValueError(
                "config.prop_grid_res > 0 requires the cached grid (pass "
                "prop_grid=refresh_prop_grid(...) through the step)"
            )
        buffers = params["props"][0] if params["props"] else params["field"]

        def fn(positions):
            return prop_grid_density(
                prop_grid,
                jax.lax.stop_gradient(buffers["centroids"]),
                jax.lax.stop_gradient(buffers["aabbs"]),
                positions, config.prop_grid_res,
            )

        return fn

    fns = []
    for i in range(config.num_proposal_iterations):
        if config.use_prop_grid and i == 0:
            fns.append(make_grid())
        else:
            fns.append(make_field(i))
    return fns


def forward(
    params: Dict,
    config: NerfactoNuscMSConfig,
    bundle: RayBundle,
    rng: jax.Array,
    anneal: jnp.ndarray,
    train: bool = True,
    stop_prop_grad: bool = False,
    prop_grid: Optional[jnp.ndarray] = None,
) -> Dict:
    """Full forward pass (nerfacto_nusc_ms.py:452-546).

    Returns rgb/accumulation/depth/expected_depth/semantics plus the
    weights/ray-samples lists needed by the interlevel and distortion losses.
    """
    bundle = apply_collider(bundle, config)

    ray_samples, weights_list, ray_samples_list = proposal_sample(
        rng,
        bundle,
        _density_fns(params, config, prop_grid),
        num_proposal_samples=config.num_proposal_samples_per_ray,
        num_nerf_samples=config.num_nerf_samples_per_ray,
        spec=config.spacing,
        anneal=anneal,
        stratified=train,
        single_jitter=config.use_single_jitter,
        stop_prop_grad=stop_prop_grad,
    )
    if config.use_prop_grid:
        # The cached-grid round is gradient-free: its interlevel term would
        # be a constant (both operands stop-gradient), so it is dropped from
        # the loss lists entirely — saving one blur_stepfun + quadratic-CDF
        # interpolation over the largest (128-bin) histogram per microbatch.
        weights_list = weights_list[1:]
        ray_samples_list = ray_samples_list[1:]

    num_rays, num_samples = ray_samples.starts.shape
    positions = ray_samples.positions().reshape(-1, 3)  # (N, 3)
    fcfg = config.field

    app = _embed_appearance(params, config, ray_samples, train)  # (R, A) or None
    ray_directions = bundle.directions  # (R, 3); per-sample via ray_of_slot

    deltas = ray_samples.deltas()

    def field_eval(field_params, positions, ray_directions, app, deltas):
        """Route -> field heads -> volume-render, all inside one (optionally
        checkpointed) region. Rendering inside the boundary matters: the
        residuals crossing it are per-RAY composites (R x {3, 64, S}) instead
        of per-SAMPLE features (R*S x 64 alone is ~4 GB at 65k rays), so
        rematerialization makes activation memory ray-bounded.

        Routing uses the composed sort+block-pad layout (PaddedRouting):
        one gather puts each per-sample array straight into its grouped-
        matmul slot, and per-ray inputs (directions, appearance) gather
        straight from their compact (R, .) arrays — the per-sample
        broadcasts and the per-head pad/unpad permutes all disappear.
        """
        from ..ops.mlp import GROUP_BLOCK

        routing = route_positions_padded(
            positions, field_params["centroids"], GROUP_BLOCK
        )
        # Save the routing maps across the remat boundary: recomputing them
        # in the backward would redo two 0.5M-element argsorts + index
        # gathers for a few MB of int32 residuals.
        from jax.ad_checkpoint import checkpoint_name

        routing = routing._replace(
            to_slot=checkpoint_name(routing.to_slot, "routing"),
            from_slot=checkpoint_name(routing.from_slot, "routing"),
        )
        ray_of_slot = routing.to_slot // num_samples  # (n_pad,)

        pos_p = pad_rows(positions, routing)
        density_p, geo_p, sem_p = density_and_embedding_padded(
            field_params, fcfg, pos_p, routing
        )
        # One fused per-ray gather: scatter/gather cost is per-ROW and
        # width-independent up to >=256 B (PERFORMANCE.md primitive table),
        # so gathering [directions | appearance] as one (R, 3+A) array
        # halves the n_pad-row gather passes vs two separate gathers.
        if app is None:
            dirs_p = ray_directions[ray_of_slot]
            app_p = None
        else:
            ray_inputs = jnp.concatenate([ray_directions, app], axis=-1)
            inputs_p = ray_inputs[ray_of_slot]
            dirs_p = inputs_p[:, :3]
            app_p = inputs_p[:, 3:]
        rgb_p = rgb_padded(
            field_params, fcfg, dirs_p, geo_p, app_p, routing,
        )
        density = unpad_rows(density_p, routing).reshape(num_rays, num_samples)
        weights = get_weights(deltas, density)
        # Render in padded space: the per-ray weighted sum is a segment-sum
        # (scatter-add into an (R, C) buffer, well inside XLA's fast
        # regime) — skips the (R*S, C) unpad gathers and the (R, S, C)
        # materializations for both heads. Padding slots carry zero weight.
        # rgb and semantics render through ONE segment-sum over a fused
        # (n_pad, 3+64) payload (same per-row wall as 3-wide): per-channel
        # sums are bitwise identical to separate renders, but the second
        # scatter pass and its backward dual gather disappear.
        w_slot = pad_rows(weights.reshape(-1), routing)
        semantics = None
        if fcfg.use_semantics:
            sem_feats_p = semantics_padded(field_params, fcfg, sem_p, routing)
            fused = jax.ops.segment_sum(
                jnp.concatenate([rgb_p, sem_feats_p], axis=-1) * w_slot[:, None],
                ray_of_slot, num_segments=num_rays,
            )
            rgb = fused[:, :3]
            semantics = fused[:, 3:]
        else:
            rgb = jax.ops.segment_sum(
                rgb_p * w_slot[:, None], ray_of_slot, num_segments=num_rays
            )
        return weights, rgb, semantics

    if config.remat:
        field_eval = jax.checkpoint(field_eval, policy=_REMAT_POLICY)

    weights, rgb, semantics_ray = field_eval(
        params["field"], positions, ray_directions, app, deltas
    )
    weights_list = weights_list + [weights]
    ray_samples_list = ray_samples_list + [ray_samples]

    depth = jax.lax.stop_gradient(render_depth_median(weights, ray_samples))
    expected_depth = render_depth_expected(weights, ray_samples)
    accumulation = jnp.clip(render_accumulation(weights), 0.0, 1.0)

    outputs: Dict = {}
    if config.use_sky_model:
        sky_routing = build_routing(
            # Routed on ray origins (sky_field_ms.py:89-98).
            assign_experts(bundle.origins, params["sky"]["centroids"]),
            params["sky"]["centroids"].shape[0],
        )
        sky_rgb_s, sky_sem_s = sky_outputs_sorted(
            params["sky"], config.sky,
            sort_rows(bundle.directions, sky_routing.order, sky_routing.inverse),
            None if app is None
            else sort_rows(app, sky_routing.order, sky_routing.inverse),
            sky_routing,
        )
        sky_rgb = unsort_rows(sky_rgb_s, sky_routing.order, sky_routing.inverse)
        rgb = rgb + (1.0 - accumulation)[:, None] * sky_rgb
        if sky_sem_s is not None:
            outputs["sky_semantics"] = unsort_rows(
                sky_sem_s, sky_routing.order, sky_routing.inverse
            )

    outputs.update(
        rgb=rgb,
        accumulation=accumulation,
        depth=depth,
        expected_depth=expected_depth,
    )

    if config.use_semantics:
        semantics = semantics_ray
        if config.use_sky_model and "sky_semantics" in outputs:
            semantics = semantics + (1.0 - accumulation)[:, None] * outputs["sky_semantics"]
        outputs["semantics"] = semantics

    outputs["weights_list"] = weights_list
    outputs["ray_samples_list"] = ray_samples_list
    return outputs


def make_prop_grid(params: Dict, config: NerfactoNuscMSConfig) -> Optional[jnp.ndarray]:
    """Refresh the cached round-0 density grid from the fine proposal field.

    Returns None when the config doesn't use the grid. The result feeds the
    ``prop_grid`` argument of forward/forward_depth; refresh cadence is a
    host-side schedule (config.prop_grid_update_every)."""
    if not config.use_prop_grid:
        return None
    if not params["props"]:
        raise ValueError(
            "use_prop_grid requires a fine proposal field to derive the "
            "cached grid from (num_proposal_iterations >= 2)")
    # With the cached grid, props[0] always backs round 1 (the fine field),
    # whether or not the proposal network is shared across rounds.
    num_experts = params["field"]["centroids"].shape[0]
    return refresh_prop_grid(
        params["props"][0], config.prop(1),
        config.prop_grid_res, num_experts,
    )


def prop_grid_refresh_due(config: NerfactoNuscMSConfig, step: int) -> bool:
    """Host-side refresh schedule: every warmup_every steps early (the fine
    prop field is still moving fast), then every update_every."""
    if not config.use_prop_grid:
        return False
    every = (config.prop_grid_warmup_every
             if step < config.prop_grid_warmup_steps
             else config.prop_grid_update_every)
    return step % max(every, 1) == 0


def forward_depth(
    params: Dict,
    config: NerfactoNuscMSConfig,
    bundle: RayBundle,
    rng: jax.Array,
    threshold: float = 0.5,
    prop_grid: Optional[jnp.ndarray] = None,
) -> Dict:
    """Density-only inference used by prior extraction
    (nerfacto_nusc_ms.py:688-734 get_depth): proposal sampling + main-field
    density + median/expected depth, no color/semantic heads."""
    bundle = apply_collider(bundle, config)
    ray_samples, _, _ = proposal_sample(
        rng,
        bundle,
        _density_fns(params, config, prop_grid),
        num_proposal_samples=config.num_proposal_samples_per_ray,
        num_nerf_samples=config.num_nerf_samples_per_ray,
        spec=config.spacing,
        anneal=jnp.asarray(1.0, jnp.float32),
        stratified=False,
        single_jitter=config.use_single_jitter,
        stop_prop_grad=True,
    )
    num_rays, num_samples = ray_samples.starts.shape
    positions = ray_samples.positions().reshape(-1, 3)
    density = _field_density_flat(params, config, positions).reshape(
        num_rays, num_samples
    )
    weights = get_weights(ray_samples.deltas(), density)
    return {
        "depth": render_depth_median(weights, ray_samples, threshold),
        "expected_depth": render_depth_expected(weights, ray_samples),
    }


def _field_heads_padded(params: Dict, config: NerfactoNuscMSConfig,
                        flat_positions: jnp.ndarray):
    """(density_p, geo_p, sem_p, routing) on the fused sort+pad layout —
    the shared entry for the inference/extraction paths."""
    from ..ops.mlp import GROUP_BLOCK

    routing = route_positions_padded(
        flat_positions, params["field"]["centroids"], GROUP_BLOCK
    )
    pos_p = pad_rows(flat_positions, routing)
    density_p, geo_p, sem_p = density_and_embedding_padded(
        params["field"], config.field, pos_p, routing
    )
    return density_p, geo_p, sem_p, routing


def _field_density_flat(params: Dict, config: NerfactoNuscMSConfig,
                        flat: jnp.ndarray) -> jnp.ndarray:
    density_p, _, _, routing = _field_heads_padded(params, config, flat)
    return unpad_rows(density_p, routing)


def field_density(params: Dict, config: NerfactoNuscMSConfig, positions: jnp.ndarray) -> jnp.ndarray:
    """Main-field density at world positions (extraction path,
    extract_priors.py:130-137)."""
    shape = positions.shape[:-1]
    return _field_density_flat(params, config, positions.reshape(-1, 3)).reshape(shape)


def field_semantics(params: Dict, config: NerfactoNuscMSConfig, positions: jnp.ndarray) -> jnp.ndarray:
    """Main-field semantic features at world positions
    (ingp_field.py:253-266 semantic_fn via the MS router)."""
    shape = positions.shape[:-1]
    flat = positions.reshape(-1, 3)
    _, _, sem_p, routing = _field_heads_padded(params, config, flat)
    sem = semantics_padded(params["field"], config.field, sem_p, routing)
    return unpad_rows(sem, routing).reshape(*shape, -1)


def point_queries(
    params: Dict,
    config: NerfactoNuscMSConfig,
    positions: jnp.ndarray,
    prop_grid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extraction phase 2, fused: mean density over (proposal nets + main
    field) and [0,1]-clipped semantic features at world positions, in ONE
    program sharing ONE field routing (extract_priors.py:130-138 runs these
    as separate queries; the density/semantic heads here reuse the same
    padded layout, removing two of the three routing passes)."""
    shape = positions.shape[:-1]
    flat = positions.reshape(-1, 3)
    density_p, _, sem_p, routing = _field_heads_padded(params, config, flat)
    sem_p = semantics_padded(params["field"], config.field, sem_p, routing)
    densities = [unpad_rows(density_p, routing)]
    for fn in _density_fns(params, config, prop_grid):
        densities.append(fn(flat))
    mean_density = sum(densities) / len(densities)
    feats = jnp.clip(unpad_rows(sem_p, routing), 0.0, 1.0)
    return mean_density.reshape(shape), feats.reshape(*shape, -1)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def compute_losses(
    outputs: Dict,
    batch: Dict,
    config: NerfactoNuscMSConfig,
    sigma: jnp.ndarray,
    los_mult: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Training losses (nerfacto_nusc_ms.py:558-645). ``sigma`` and
    ``los_mult`` are the host-side line-of-sight schedule values."""
    loss_dict: Dict[str, jnp.ndarray] = {}

    if "rgb" in batch:
        loss_dict["rgb_loss"] = L.rgb_loss(outputs["rgb"], batch["rgb"])

    if config.use_sky_model and "sky" in batch:
        loss_dict["sky_loss"] = config.sky_loss_mult * L.sky_loss(
            outputs["accumulation"], batch["sky"]
        )

    needs_depth = (config.use_lidar_loss or config.use_monodepth_loss) and "depth" in batch
    if needs_depth:
        final_samples: RaySamples = outputs["ray_samples_list"][-1]
        psf = config.pose_scale_factor
        ray_steps = final_samples.steps() / psf
        predicted_depth = outputs["expected_depth"] / psf
        upper = (
            config.lidar_depth_upperbound
            if config.use_lidar_loss
            else config.monodepth_depth_upperbound
        )
        if config.use_lidar_loss:
            loss_dict["expected_depth_loss"] = (
                config.expected_depth_loss_mult
                * L.expected_depth_loss(batch["depth"], predicted_depth, upper)
            )
            sky_mask = None
        else:
            loss_dict["expected_depth_loss"] = (
                config.expected_depth_loss_mult
                * L.expected_monodepth_loss(
                    batch["depth"], predicted_depth, batch["sky"], upper,
                    config.monodepth_loss_inverse,
                )
            )
            sky_mask = batch["sky"]
        loss_dict["line_of_sight_loss"] = los_mult * L.line_of_sight_loss(
            outputs["weights_list"][-1], batch["depth"], ray_steps, sigma,
            sky_mask, upper,
        )

    if config.use_semantics and "features" in batch:
        loss_dict["semantic_loss"] = config.semantic_loss_mult * L.semantic_loss(
            outputs["semantics"], batch["features"], clip=True
        )

    if config.enable_z_anti_aliasing:
        # With the cached-grid first round, forward() drops round 0 from the
        # lists; keep the per-round pulse widths aligned.
        pulse_width = (config.pulse_width[1:] if config.use_prop_grid
                       else config.pulse_width)
        il = z_anti_aliasing_interlevel_loss(
            outputs["weights_list"], outputs["ray_samples_list"], pulse_width
        )
    else:
        il = interlevel_loss(outputs["weights_list"], outputs["ray_samples_list"])
    loss_dict["interlevel_loss"] = config.interlevel_loss_mult * il
    loss_dict["distortion_loss"] = config.distortion_loss_mult * distortion_loss(
        outputs["weights_list"], outputs["ray_samples_list"]
    )
    return loss_dict


# ---------------------------------------------------------------------------
# Host-side schedules (plain numpy; feed scalars into the jitted step)
# ---------------------------------------------------------------------------


def anneal_at(config: NerfactoNuscMSConfig, step: int) -> float:
    """Proposal-weight anneal (nerfacto_nusc_ms.py:425-441, zip-NeRF eq.18)."""
    if not config.use_proposal_weight_anneal:
        return 1.0
    n = config.proposal_weights_anneal_max_num_iters
    train_frac = float(np.clip(step / n, 0.0, 1.0))
    b = config.proposal_weights_anneal_slope
    return b * train_frac / ((b - 1.0) * train_frac + 1.0)


def line_of_sight_sigma_at(config: NerfactoNuscMSConfig, step: int) -> float:
    """(nerfacto_nusc_ms.py:387-396)."""
    start, end = config.line_of_sight_start_step, config.line_of_sight_end_step
    frac = float(np.clip((step - start) / max(end - start, 1), 0.0, 1.0))
    return config.line_of_sight_max_sigma - frac * (
        config.line_of_sight_max_sigma - config.line_of_sight_min_sigma
    )


def line_of_sight_mult_at(config: NerfactoNuscMSConfig, step: int) -> float:
    """(nerfacto_nusc_ms.py:398-403)."""
    if step <= config.line_of_sight_start_step:
        return 0.0
    times = step // config.line_of_sight_decay_steps
    return config.line_of_sight_mult / (2.0 ** times)


class ProposalUpdateSchedule:
    """Host-side replica of ProposalNetworkSampler's update bookkeeping
    (ray_samplers.py:560-612 + nerfacto_nusc_ms.py:299-305 update_schedule):
    proposal densities carry gradients only on 'updated' steps."""

    def __init__(self, config: NerfactoNuscMSConfig):
        self._cfg = config
        self._steps_since_update = 0

    def updated(self, step: int) -> bool:
        sched = float(
            np.clip(
                np.interp(
                    step, [0, self._cfg.proposal_warmup], [0, self._cfg.proposal_update_every]
                ),
                1,
                self._cfg.proposal_update_every,
            )
        )
        is_updated = self._steps_since_update > sched or step < 10
        return bool(is_updated)

    def step_cb(self, step: int, was_updated: bool) -> None:
        # The reference resets the counter inside generate_ray_samples
        # (before the AFTER-iteration increment), so an update iteration
        # ends with the counter at 1, not 0.
        if was_updated:
            self._steps_since_update = 0
        self._steps_since_update += 1
