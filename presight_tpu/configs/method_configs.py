"""Named method configs — the registry behind the `ns-train <method>` CLI.

Reference spec: nerfstudio-0.3.3/nerfstudio/configs/method_configs.py:67-510.
Generates the same 36 named TrainerConfigs:
  {location}-{camera|monodepth}-dino-c{i}
for boston-seaport (8 tiles, 16 aabbs), singapore-queenstown (4, 12),
singapore-onenorth (4, 16), singapore-hollandvillage (2, 8) —
pose_rescale_factor=0.05, 65,536 rays/batch, 100k iters, Adam 1e-2
(eps 1e-15, wd 1e-5) with warmup-multistep schedule — plus a CPU-runnable
`synthetic-demo` method over the generated fixture.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict

from ..data.datamanager import DataManagerConfig
from ..data.dataparser import DataParserConfig
from ..engine.optimizers import OptimizerGroupConfig
from ..engine.trainer import PipelineConfig, TrainerConfig
from ..models.nerfacto_ms import NerfactoNuscMSConfig

DATA_ROOT = Path("data/nuScenes")
POSE_RESCALE_FACTOR = 0.05
BS_SCALE = 8
MAX_ITERATIONS = 100_000

_TILES = {
    "boston-seaport": (8, 16),
    "singapore-queenstown": (4, 12),
    "singapore-onenorth": (4, 16),
    "singapore-hollandvillage": (2, 8),
}


def _optimizers(max_iterations: int) -> Dict[str, OptimizerGroupConfig]:
    common = dict(
        lr=1e-2, eps=1e-15, weight_decay=1e-5,
        max_steps=max_iterations,
        warmup_steps=max_iterations // 10,
        milestones=(max_iterations // 4, max_iterations // 2, max_iterations * 3 // 4),
        gamma=0.33,
    )
    return {
        "proposal_networks": OptimizerGroupConfig(**common),
        "fields": OptimizerGroupConfig(**common),
    }


def _base_model(max_iterations: int) -> NerfactoNuscMSConfig:
    return NerfactoNuscMSConfig(
        near_plane=0.1 * POSE_RESCALE_FACTOR,
        far_plane=1000.0 * POSE_RESCALE_FACTOR,
        piecewise_sampler_threshold=100.0 * POSE_RESCALE_FACTOR,
        proposal_weights_anneal_max_num_iters=max_iterations // 10,
        proposal_warmup=max_iterations // 10,
        pose_scale_factor=POSE_RESCALE_FACTOR,
    )


def _tile_config(location: str, tile: int, num_aabbs: int, depth: str,
                 max_iterations: int = MAX_ITERATIONS) -> TrainerConfig:
    name = f"{location}-{depth}-dino-c{tile}"
    if depth == "monodepth":
        # method_configs.py:76-128
        model = dataclasses.replace(
            _base_model(max_iterations),
            use_lidar_loss=False,
            use_monodepth_loss=True,
            expected_depth_loss_mult=0.1,
            line_of_sight_mult=0.01,
            monodepth_depth_upperbound=25.0,
            line_of_sight_decay_steps=max_iterations,
            line_of_sight_start_step=max_iterations // 20,
            line_of_sight_end_step=max_iterations,
            line_of_sight_max_sigma=6.0,
            line_of_sight_min_sigma=4.0,
            distortion_loss_mult=0.01,
        )
        depth_type = "monodepth"
    else:
        # method_configs.py:133-171 ("camera": RGB + sky + DINO, no depth)
        model = dataclasses.replace(_base_model(max_iterations), use_lidar_loss=False)
        depth_type = "none"
    return TrainerConfig(
        method_name=f"{location}-{depth}",
        experiment_name=name,
        output_dir=Path("outputs"),
        max_num_iterations=max_iterations,
        pipeline=PipelineConfig(
            dataparser=DataParserConfig(
                data_dir=DATA_ROOT,
                location=location,
                centroid_name=str(tile),
                num_aabbs=num_aabbs,
                depth_type=depth_type,
            ),
            datamanager=DataManagerConfig(
                train_num_rays_per_batch=8192 * BS_SCALE,
            ),
            model=model,
        ),
        optimizers=_optimizers(max_iterations),
    )


def _synthetic_demo() -> TrainerConfig:
    """CPU-runnable end-to-end demo on the generated synthetic fixture
    (BASELINE config 1 shape)."""
    iters = 200
    model = dataclasses.replace(
        _base_model(iters),
        num_levels=6, max_res=1024, log2_hashmap_size=14, features_per_level=2,
        hidden_dim=32, hidden_dim_color=32,
        num_proposal_samples_per_ray=(48, 24), num_nerf_samples_per_ray=24,
        proposal_net_args_list=(
            dict(features_per_level=1, log2_hashmap_size=12, num_levels=5,
                 base_res=16, max_res=256),
            dict(features_per_level=1, log2_hashmap_size=12, num_levels=5,
                 base_res=16, max_res=512),
        ),
        use_lidar_loss=True,
        proposal_warmup=iters // 4,
        proposal_weights_anneal_max_num_iters=iters // 4,
        line_of_sight_start_step=iters // 4,
        line_of_sight_end_step=iters,
        line_of_sight_decay_steps=iters,
    )
    return TrainerConfig(
        method_name="synthetic-demo",
        experiment_name="synthetic-demo",
        max_num_iterations=iters,
        steps_per_save=100,
        pipeline=PipelineConfig(
            dataparser=DataParserConfig(
                data_dir=Path("data/synthetic"),
                location="synthetic-city",
                num_aabbs=2,
                depth_type="lidar",
                centroids_dir=Path("data/synthetic/centroids"),
                # Hold out eval images so the eval-batch / eval-image /
                # PSNR-study paths are exercised end-to-end on the fixture
                # (the real tile configs keep the reference's 1.0).
                train_split_fraction=0.9,
            ),
            datamanager=DataManagerConfig(
                train_num_rays_per_batch=2048,
                images_per_chunk=16,
                chunk_ratio=0.2,
            ),
            model=model,
        ),
        optimizers=_optimizers(iters),
    )


def _tpu_profile(cfg: TrainerConfig) -> TrainerConfig:
    """TPU-first variant of a tile config (PERFORMANCE.md): 'shared' hash
    storage — cell rows (one gather per sample-level), per-level table
    leaves sized so every backward scatter output stays inside XLA's fast
    (<= ~8 MB, ~16 ns/row) regime, experts folded into the hash — plus a
    5-level x 8-feature encoding split (same 40-dim encoding as the
    reference's 10x4). Same capabilities and losses; throughput-optimized
    for v5e's scatter-size cliff (see ops/hash_encoding.py)."""
    model = dataclasses.replace(
        cfg.pipeline.model,
        hash_storage="shared",
        prop_shared_mlp=True,
        # Scan microbatching already bounds activations to one microbatch,
        # so rematerializing the field interior buys little memory and costs
        # ~28% of the step re-running MLPs/render in the backward (measured
        # on v5e at 8x8192-ray microbatches; PERFORMANCE.md round 2).
        remat=False,
        # 2^17 rows x 80 floats per level slab (main field); 4 levels x 10
        # features — the same 40-wide encoding as the reference's 10x4,
        # with 20% fewer main-table rows and one fewer backward scatter
        # than a 5x8 split (QUALITY.md round 3 'grid-lean4'), at 4x the
        # round-3 rows: the capacity bump measured FREE at the fused
        # profile and BEATS the log2-15 baseline's depth RMSE (QUALITY.md
        # round 3c 'grid-s64-n48-cap4x').
        log2_hashmap_size=17,
        num_levels=4,
        features_per_level=10,
        # Cached-density-grid first proposal round (QUALITY.md round 3:
        # matches prop-lean within seed noise at 16 experts): round 1 reads
        # a per-expert 64^3 cell grid refreshed from the fine prop field —
        # one gather/sample, no MLP, no backward. 64 first-round samples
        # (QUALITY 'grid-s64'): the cached histogram is band-limited by the
        # grid resolution, so the reference's 128 stratified samples
        # oversample it — 64 halves the largest per-step row count at
        # quality indistinguishable from 128 across 3 seeds.
        prop_grid_res=64,
        # Round-2 (fine prop) samples 64 -> 32: the round-4 proposal-
        # quadrature sweep showed the two rounds are NOT symmetric — the
        # grid round localizes the surface from the full ray domain (cutting
        # it degrades depth: p32x64 +0.43 m disjoint; the p16x16 control
        # +1.65 m) while the fine round only refines inside that band and
        # is quality-free down to 32 (depth RMSE 3.95-3.97 vs the baseline's
        # 3.89-4.03 seed band; PSNR/SSIM dead-even). QUALITY.md round 4.
        num_proposal_samples_per_ray=(64, 32),
        # 48 final (render) samples: ~77% of the fused step scales with
        # this count. Gated by the round-3c quadrature sweep — n48 holds
        # PSNR, SSIM AND depth RMSE inside the n64 baseline's seed noise
        # while the deliberately-broken n12 control degrades depth RMSE by
        # +0.64 m (3.6x spread), so the fixture has power on this axis.
        num_nerf_samples_per_ray=48,
        proposal_net_args_list=(
            # 'prop-lean' (QUALITY.md): half the levels at double features —
            # same encoding width and params, half the proposal gathers.
            # 2^16 rows x 32 floats = 8.4 MB per level slab.
            dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                 base_res=16, max_res=1024),
            dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                 base_res=16, max_res=4096),
        ),
    )
    return dataclasses.replace(
        cfg,
        experiment_name=cfg.experiment_name + "-tpu",
        method_name=cfg.method_name + "-tpu",
        # 1024 measured fastest at the round-3 profile shapes
        # (PERFORMANCE.md microbatch sweep: 71.8k vs 55.7k at 16384).
        microbatch_rays=1024,
        pipeline=dataclasses.replace(cfg.pipeline, model=model),
    )


def build_method_configs() -> Dict[str, TrainerConfig]:
    configs: Dict[str, TrainerConfig] = {}
    for location, (num_tiles, num_aabbs) in _TILES.items():
        for depth in ("monodepth", "camera"):
            for i in range(num_tiles):
                cfg = _tile_config(location, i, num_aabbs, depth)
                configs[cfg.experiment_name] = cfg
                tpu_cfg = _tpu_profile(cfg)
                configs[tpu_cfg.experiment_name] = tpu_cfg
    configs["synthetic-demo"] = _synthetic_demo()
    return configs


method_configs = build_method_configs()
