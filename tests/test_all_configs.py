"""Every registered method config instantiates without data.

Mirrors the reference's config-instantiation pyramid layer
(occupancy/tests/test_runtime/test_config.py builds every mmdet3d config
without data; nerfstudio test_train.py:32-60 smoke-runs every registered
method): all 73 method_configs shape-initialize the full model pytree
(jax.eval_shape — no FLOPs, no table allocation), label every leaf for the
optimizer, and survive a config.yml round-trip.
"""

import dataclasses

import jax
import numpy as np
import pytest

from presight_tpu.configs.config_io import from_dict, to_dict
from presight_tpu.configs.method_configs import method_configs
from presight_tpu.engine import make_optimizer
from presight_tpu.models import init_model, param_groups


@pytest.mark.parametrize("name", sorted(method_configs))
def test_config_instantiates(name):
    cfg = method_configs[name]
    mcfg = cfg.pipeline.model

    E = 2
    rng = np.random.RandomState(0)
    centroids = rng.randn(E, 3).astype(np.float32)
    aabbs = np.stack([np.stack([c - 5.0, c + 5.0]) for c in centroids])

    shapes = jax.eval_shape(
        lambda: init_model(jax.random.PRNGKey(0), mcfg, aabbs, centroids,
                           num_train_cameras=7, num_train_videos=3)
    )
    leaves = jax.tree_util.tree_leaves(shapes)
    assert leaves, name

    labels = param_groups(shapes)
    label_leaves = jax.tree_util.tree_leaves(labels)
    assert len(label_leaves) == len(leaves)
    assert set(label_leaves) <= {"proposal_networks", "fields", "frozen"}
    # The optimizer builds against these groups (concrete init not needed
    # for the structural check).
    make_optimizer(cfg.optimizers, labels)

    # config.yml round-trip preserves the full dataclass tree.
    restored = from_dict(to_dict(cfg))
    assert restored == cfg


def test_tpu_variants_cover_every_tile():
    names = set(method_configs)
    tiles = {n for n in names if n != "synthetic-demo" and not n.endswith("-tpu")}
    assert tiles, "no tile configs registered"
    missing = {n for n in tiles if f"{n}-tpu" not in names}
    assert not missing, f"tiles without a -tpu variant: {sorted(missing)}"
    for n in tiles:
        base, tpu = method_configs[n], method_configs[f"{n}-tpu"]
        # Same trainer surface; only profile fields may differ.
        assert tpu.max_num_iterations == base.max_num_iterations
        assert tpu.pipeline.model.use_semantics == base.pipeline.model.use_semantics
        assert dataclasses.asdict(tpu.optimizers["fields"]) == dataclasses.asdict(
            base.optimizers["fields"])


def test_bench_headline_matches_tpu_profile():
    """Drift guard: the bench.py headline rung (what BENCH_r*.json measures)
    must carry the same gated model profile as the `-tpu` method configs
    (what users train with). QUALITY.md's gates license ONE profile; if
    either side moves without the other, the perf claim and the shipped
    configs silently diverge."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    import bench

    # Shape-only build: patch out the heavy parts? Not needed — bench.build
    # allocates concrete tables (~200 MB at log2 17), acceptable once.
    tpu_cfg = method_configs["boston-seaport-camera-dino-c0-tpu"].pipeline.model
    *_, bench_cfg = bench.build(2, 15, 256, bench.HEADLINE)
    for field in (
        "hash_storage", "prop_shared_mlp", "log2_hashmap_size", "num_levels",
        "features_per_level", "prop_grid_res", "num_proposal_samples_per_ray",
        "num_nerf_samples_per_ray", "proposal_net_args_list",
    ):
        assert getattr(bench_cfg, field) == getattr(tpu_cfg, field), (
            field, getattr(bench_cfg, field), getattr(tpu_cfg, field))


def test_reference_named_stage3_configs_build_reference_topology():
    """Parity-named stage-3 configs default to the reference topology
    (VERDICT r3: 'parity-named things should default to parity topology,
    with the toy knob for tests'). Reference values:
    bevdet-occ-r50d-8x4-24e_wcamprior_randomdrop.py:70-141 and
    smn_wcamprior_480_100x50_24e_randomdrop.py:17-165."""
    from presight_tpu.configs.stage3_configs import map_configs, occ_configs

    occ = occ_configs["bevdet-occ-r50d-8x4-24e_wcamprior_randomdrop"]()
    assert occ.backbone == "resnet" and occ.resnet_depth == 50
    assert occ.resnet_base_width == 64          # full-width ResNet-50
    assert occ.bev_neck == "lssfpn3d"
    assert occ.view_out_channels == 32          # numC_Trans
    assert occ.neck_channels == 256             # CustomFPN out
    assert occ.input_size == (256, 704)
    assert occ.grid_config["x"] == (-40.0, 40.0, 0.4)
    assert occ.grid_config["depth"] == (1.0, 45.0, 0.5)
    assert occ.temporal and occ.stereo          # BEVStereo4DOCC, num_adj=1
    assert occ.prior_fusion == "voxel" and occ.prior_in_channels == 68
    assert occ.num_classes == 18

    smn = map_configs["smn_wcamprior_480_100x50_24e_randomdrop"]()
    assert smn.backbone == "resnet" and smn.dcn  # DCNv2 stages 3-4
    assert smn.bev_hw == (50, 100) and smn.roi_size == (100.0, 50.0)
    assert smn.img_size == (480, 800)
    assert smn.embed_dim == 256                 # bev_embed_dims
    assert smn.num_queries == 100 and smn.num_points == 20
    assert smn.num_classes == 3                 # cat2id
    assert smn.topk_propagate == 33             # num_queries // 3
    assert smn.num_levels == 3 and smn.num_z_anchors == 4
    assert smn.streaming_bev
    assert smn.enc_layers == 1                  # BEVFormerEncoder :109
    assert smn.dec_layers == 6                  # MapTransformerDecoder :172
    assert smn.num_heads == 8                   # :182,189

    raster = map_configs["nusc_raster_wcamprior_480_100x50_24e_randomdrop"]()
    assert raster.bev_hw == (50, 100) and raster.embed_dim == 256
    # The raster config shares the smn BEVFormerBackbone exactly
    # (nusc_raster_...py:71-103).
    assert raster.backbone == "resnet" and raster.dcn
    assert raster.num_levels == 3 and raster.num_z_anchors == 4
    assert raster.enc_layers == 1 and raster.num_heads == 8

    # Toy entries stay available but are explicitly toy-named.
    assert occ_configs["bevdet-occ-toy"]().backbone == "simple"
    assert map_configs["smn-toy"]().backbone == "simple"


def test_reference_occ_config_shape_initializes():
    """The reference-scale occ model shape-initializes end to end
    (jax.eval_shape: no FLOPs/allocation) — catches topology wiring errors
    (channel math between ResNet stages, FPN, LSS, CustomResNet3D,
    LSSFPN3D) without paying a full-scale forward."""
    import jax.numpy as jnp

    from presight_tpu.configs.stage3_configs import occ_configs

    model = occ_configs["bevdet-occ-r50d-8x4-24e_wcamprior_randomdrop"]()
    B, N = 1, 6
    H, W = model.input_size
    imgs = jax.ShapeDtypeStruct((B, N, 3, H, W), jnp.float32)
    mat4 = jax.ShapeDtypeStruct((B, N, 4, 4), jnp.float32)
    mat3 = jax.ShapeDtypeStruct((B, N, 3, 3), jnp.float32)
    vec3 = jax.ShapeDtypeStruct((B, N, 3), jnp.float32)
    bda = jax.ShapeDtypeStruct((B, 4, 4), jnp.float32)
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(model.init, rng, imgs, mat4, mat3, mat3, vec3, bda)
    n_params = sum(
        int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes)
    )
    # ResNet-50 trunk alone is ~23.5M; the full model lands well above.
    assert n_params > 20_000_000, n_params
