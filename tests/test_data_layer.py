"""Data layer tests: synthetic fixture -> dataparser -> chunk dataset ->
datamanager -> device batch -> one train step."""

import numpy as np
import pytest

from presight_tpu.data import constants as K
from presight_tpu.data.dataparser import DataParserConfig, make_camera_params, parse
from presight_tpu.data.datamanager import DataManager
from presight_tpu.data.dataset import PixelChunkDataset
from presight_tpu.data.synthetic import generate_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc")
    return generate_scene(root)


def _config(scene_dir, **kw):
    defaults = dict(
        data_dir=scene_dir,
        location="synthetic-city",
        centroid_name="0",
        num_aabbs=2,
        pose_scale_factor=0.05,
        depth_type="lidar",
        train_split_fraction=0.9,
        centroids_dir=scene_dir / "centroids",
    )
    defaults.update(kw)
    return DataParserConfig(**defaults)


def test_dataparser_outputs(scene_dir):
    out = parse(_config(scene_dir), split="train")
    n_total = 2 * 6 * 6  # scenes x frames x cameras
    assert len(out.all_items) == n_total
    assert len(out.items) == int(np.ceil(n_total * 0.9))
    assert out.centroids.shape == (2, 3)
    assert out.aabbs.shape == (2, 2, 3)
    assert out.predicted_labels.shape == (n_total,)
    assert out.dino_to_rgb is not None
    assert out.num_videos == 2
    # Poses are zero-mean (pre-scale) and scaled.
    t = np.stack([it.c2w[:3, 3] for it in out.all_items])
    np.testing.assert_allclose(t.mean(0), 0.0, atol=1e-3)
    # AABBs contain their cluster's translations.
    for e in range(2):
        sel = out.predicted_labels == e
        pts = t[sel]
        frac_in = ((pts >= out.aabbs[e, 0]) & (pts <= out.aabbs[e, 1])).all(-1).mean()
        assert frac_in > 0.85

    # camera directions: nerfstudio convention -> forward is -z column of c2w
    item = out.all_items[0]
    fwd = -item.c2w[:3, 2]
    assert abs(np.linalg.norm(fwd) - 1.0) < 1e-5


def test_dataparser_eval_split(scene_dir):
    train = parse(_config(scene_dir), split="train")
    val = parse(_config(scene_dir), split="val")
    assert len(train.items) + len(val.items) == len(train.all_items)
    assert all(it.is_val for it in val.items)
    assert not any(it.is_val for it in train.items)


def test_chunk_dataset(scene_dir):
    out = parse(_config(scene_dir), split="train")
    labels = out.predicted_labels[[i for i, it in enumerate(out.all_items) if not it.is_val]]
    ds = PixelChunkDataset(
        out.items, labels, split="train", images_per_chunk=8, chunk_ratio=0.05,
    )
    chunk = ds.load_chunk(step=0)
    n = len(chunk)
    assert n > 0
    d = chunk.data
    assert d[K.RGB].shape == (n, 3)
    assert d[K.RAY_INDEX].shape == (n, 3)
    assert d[K.FEATURES].shape[1] == 64
    assert d[K.SKY].min() >= 0 and d[K.SKY].max() <= 1
    # No dynamic-class pixels survive masking.
    assert not np.isin(d[K.SEG], [13]).any()
    # Ego-truck mask: CAM_BACK bottom ninth excluded.
    # ray rows are within image bounds
    assert d[K.RAY_INDEX][:, 1].max() < 45
    assert d[K.RAY_INDEX][:, 2].max() < 80
    # Deterministic per step
    chunk2 = ds.load_chunk(step=0)
    np.testing.assert_array_equal(chunk.data[K.RAY_INDEX], chunk2.data[K.RAY_INDEX])


def test_datamanager_and_train_step(scene_dir):
    import jax
    import jax.numpy as jnp

    from presight_tpu.engine import (
        OptimizerGroupConfig,
        StepScalars,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from presight_tpu.models import NerfactoNuscMSConfig, init_model, param_groups

    out = parse(_config(scene_dir), split="train")
    labels = out.predicted_labels[[i for i, it in enumerate(out.all_items) if not it.is_val]]
    ds = PixelChunkDataset(out.items, labels, split="train", images_per_chunk=8,
                           chunk_ratio=0.05)
    dm = DataManager(ds, batch_size=256)
    cameras = make_camera_params(out.items)

    config = NerfactoNuscMSConfig(
        near_plane=0.1 * 0.05, far_plane=1000.0 * 0.05,
        piecewise_sampler_threshold=100.0 * 0.05,
        num_levels=4, base_res=4, max_res=128, log2_hashmap_size=10,
        features_per_level=2, hidden_dim=16, hidden_dim_color=16,
        num_proposal_samples_per_ray=(16, 8), num_nerf_samples_per_ray=8,
        proposal_net_args_list=(
            dict(features_per_level=1, log2_hashmap_size=9, num_levels=3,
                 base_res=4, max_res=32),
            dict(features_per_level=1, log2_hashmap_size=9, num_levels=3,
                 base_res=4, max_res=64),
        ),
        sky_mlp_dims=16, semantic_dim=64, use_lidar_loss=True,
        pose_scale_factor=0.05,
    )
    params = init_model(jax.random.PRNGKey(0), config, out.aabbs, out.centroids,
                        len(out.items), out.num_videos)
    groups = {"proposal_networks": OptimizerGroupConfig(), "fields": OptimizerGroupConfig()}
    tx = make_optimizer(groups, param_groups(params))
    state = init_train_state(params, tx)
    step = make_train_step(config, tx, stop_prop_grad=False, donate=False)
    scalars = StepScalars(jnp.asarray(1.0), jnp.asarray(5.0), jnp.asarray(0.0))

    losses = []
    for i in range(3):
        np_batch = dm.next_batch()
        batch = {
            "ray_index": jnp.asarray(np_batch[K.RAY_INDEX]),
            "rgb": jnp.asarray(np_batch[K.RGB]),
            "sky": jnp.asarray(np_batch[K.SKY]),
            "depth": jnp.asarray(np_batch[K.DEPTH]),
            "features": jnp.asarray(np_batch[K.FEATURES]),
        }
        state, metrics = step(state, cameras, batch, jax.random.PRNGKey(i), scalars)
        losses.append(float(metrics["total_loss"]))
    dm.close()
    assert np.isfinite(losses).all()


def test_visualize_kmeans_writes_png(tmp_path, scene_dir):
    """The tile-assignment diagnostic plot (dataparser.py:375-414 analog)
    renders per-video tracks + centroids + AABBs to a PNG."""
    from presight_tpu.data.dataparser import visualize_kmeans

    out = parse(_config(scene_dir), "train")
    p = visualize_kmeans(out, tmp_path / "kmeans.png")
    assert p.exists() and p.stat().st_size > 1000
