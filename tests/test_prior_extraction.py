"""Prior extraction tests: voxel downsample parity vs a naive Open3D-style
reference and the end-to-end pickle schema golden check."""

import pickle

import numpy as np
import pytest

from presight_tpu.prior.voxelize import hit_quantile_filter, voxel_downsample, voxel_keys


def naive_voxel_downsample(points, voxel_size, colors, features):
    """Direct transcription of Open3D voxel_down_sample_and_trace +
    extract_priors.py:178-190 (loop over voxels)."""
    min_bound = points.min(axis=0) - 1.0
    ijk = np.floor((points - min_bound) / voxel_size).astype(np.int64)
    buckets = {}
    for i, key in enumerate(map(tuple, ijk)):
        buckets.setdefault(key, []).append(i)
    pts, cols, feats, hits = [], [], [], []
    for key in sorted(buckets):
        idx = np.asarray(buckets[key])
        pts.append(points[idx].mean(axis=0))
        cols.append(colors[idx].mean(axis=0))
        feats.append(features[idx].astype(np.float64).mean(axis=0).astype(np.float16))
        hits.append(len(idx))
    return (np.stack(pts), np.stack(cols), np.stack(feats), np.asarray(hits))


def test_voxel_downsample_matches_naive():
    rng = np.random.RandomState(0)
    points = rng.randn(2000, 3).astype(np.float64) * 5
    colors = rng.rand(2000, 3).astype(np.float32)
    features = rng.rand(2000, 8).astype(np.float16)

    out = voxel_downsample(points, 0.4, colors=colors, features=features)
    ref_p, ref_c, ref_f, ref_h = naive_voxel_downsample(points, 0.4, colors, features)

    # Both sorted by flat key; naive sorted by ijk tuple. Flat key ordering
    # == tuple ordering for non-negative ijk (guaranteed by min_bound).
    assert len(out["points"]) == len(ref_p)
    np.testing.assert_allclose(out["points"], ref_p, rtol=1e-6)
    np.testing.assert_allclose(out["colors"], ref_c, rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(out["hits"], ref_h)
    np.testing.assert_allclose(
        out["features"].astype(np.float32), ref_f.astype(np.float32), atol=2e-3
    )


def test_hit_quantile_filter():
    voxels = {"points": np.arange(30).reshape(10, 3).astype(np.float32),
              "hits": np.arange(1, 11)}
    out = hit_quantile_filter(voxels, 0.2)
    thr = np.quantile(np.arange(1, 11), 0.2)
    assert (out["hits"] > thr).all()
    assert len(out["points"]) == len(out["hits"])


def test_extraction_end_to_end(tmp_path):
    """Tiny model + synthetic fixture -> extracted_priors.pkl with the exact
    reference schema (extract_priors.py:199-208)."""
    import jax

    from presight_tpu.data.dataparser import DataParserConfig, make_camera_params, parse
    from presight_tpu.data.synthetic import generate_scene
    from presight_tpu.models import NerfactoNuscMSConfig, init_model
    from presight_tpu.prior.extraction import extract_voxels

    scene_dir = generate_scene(tmp_path / "nusc", num_frames=2, height=24, width=40)
    out = parse(
        DataParserConfig(
            data_dir=scene_dir, location="synthetic-city", num_aabbs=2,
            pose_scale_factor=0.05, depth_type="lidar",
            centroids_dir=scene_dir / "centroids",
        ),
        split="train",
    )
    config = NerfactoNuscMSConfig(
        near_plane=0.1 * 0.05, far_plane=1000.0 * 0.05,
        piecewise_sampler_threshold=100.0 * 0.05,
        num_levels=4, base_res=4, max_res=64, log2_hashmap_size=10,
        features_per_level=2, hidden_dim=16, hidden_dim_color=16,
        num_proposal_samples_per_ray=(16, 8), num_nerf_samples_per_ray=8,
        proposal_net_args_list=(
            dict(features_per_level=1, log2_hashmap_size=9, num_levels=3,
                 base_res=4, max_res=32),
            dict(features_per_level=1, log2_hashmap_size=9, num_levels=3,
                 base_res=4, max_res=64),
        ),
        sky_mlp_dims=16, semantic_dim=64, pose_scale_factor=0.05,
    )
    params = init_model(jax.random.PRNGKey(0), config, out.aabbs, out.centroids,
                        len(out.items), out.num_videos)
    cameras = make_camera_params(out.items)

    result = extract_voxels(
        params=params, config=config, items=out.items, cameras=cameras,
        pose_scale_factor=out.pose_scale_factor,
        origin=out.pose_transformation, dino_to_rgb=out.dino_to_rgb,
        output_dir=tmp_path / "priors", frame_interval=1,
        camera_scaling_factor=1.0, density_threshold=0.0,  # random net: keep all
        hit_thr_ratio=0.2,
    )

    with open(tmp_path / "priors" / "extracted_priors.pkl", "rb") as f:
        loaded = pickle.load(f)
    # Exact reference schema: keys, dtypes, shapes.
    assert set(loaded) == {"points", "features", "colors", "hits", "origin"}
    n = len(loaded["points"])
    assert loaded["points"].dtype == np.float32 and loaded["points"].shape == (n, 3)
    assert loaded["features"].dtype == np.float16 and loaded["features"].shape == (n, 64)
    assert loaded["colors"].dtype == np.float32 and loaded["colors"].shape == (n, 3)
    assert loaded["hits"].shape == (n,)
    assert loaded["origin"].dtype == np.float32 and loaded["origin"].shape == (3,)
    assert n > 0
    # Features respect the clip range; colors in [0,1].
    assert float(loaded["features"].max()) <= 1.0
    assert float(loaded["features"].min()) >= 0.0
    assert (loaded["colors"] >= 0).all() and (loaded["colors"] <= 1).all()
    # PLY preview exists and parses.
    ply = (tmp_path / "priors" / "priors_for_vis.ply").read_text().splitlines()
    assert ply[0] == "ply" and int(ply[2].split()[-1]) == n


def test_downstream_loader_contract(tmp_path):
    """Transcribe the downstream NuscPrior load transform
    (occupancy/mmdet3d/datasets/prior_utils/city_prior.py:46-79): add origin,
    negate x/y — verifies our pickle feeds it without modification."""
    points = np.array([[1.0, 2.0, 0.5], [-3.0, 4.0, 1.0]], np.float32)
    origin = np.array([10.0, 20.0, 0.0], np.float32)
    prior = {"points": points, "features": np.zeros((2, 64), np.float16),
             "colors": np.zeros((2, 3), np.float32),
             "hits": np.array([5, 7]), "origin": origin}
    p = tmp_path / "extracted_priors.pkl"
    with open(p, "wb") as f:
        pickle.dump(prior, f)
    with open(p, "rb") as f:
        loaded = pickle.load(f)
    # Downstream: world = points + origin, then negate x,y (nerfstudio ->
    # nuScenes coords).
    world = loaded["points"] + loaded["origin"]
    world[:, :2] *= -1
    hits_norm = loaded["hits"] / loaded["hits"].mean()
    assert world.shape == (2, 3) and hits_norm.shape == (2,)
