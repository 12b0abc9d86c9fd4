"""Device-resident ray store (data/device_store.py): batches gathered
on-device by ray_index must be bitwise identical to the host chunk
pipeline's rows, and the Trainer must produce the same training
trajectory with the store on as with it off."""

import numpy as np
import pytest

from presight_tpu.data import constants as K
from presight_tpu.data.dataparser import DataParserConfig, parse
from presight_tpu.data.datamanager import DataManager
from presight_tpu.data.dataset import PixelChunkDataset
from presight_tpu.data.device_store import DeviceRayStore
from presight_tpu.data.synthetic import generate_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    return generate_scene(root)


def _parse(scene_dir):
    return parse(
        DataParserConfig(
            data_dir=scene_dir, centroids_dir=scene_dir / "centroids",
            location="synthetic-city", centroid_name="0", num_aabbs=2,
            pose_scale_factor=0.05, depth_type="lidar",
            train_split_fraction=0.9,
        ),
        split="train",
    )


def test_store_batches_match_host_rows(scene_dir):
    out = _parse(scene_dir)
    labels = out.predicted_labels[
        [i for i, it in enumerate(out.all_items) if not it.is_val]
    ]
    ds = PixelChunkDataset(out.items, labels, split="train",
                           images_per_chunk=8, chunk_ratio=0.05)
    dm = DataManager(ds, batch_size=256)
    store = DeviceRayStore.maybe_build(out.items, load_features=True,
                                       cap_mb=512)
    assert store is not None and store.features is not None
    for _ in range(4):
        np_batch = dm.next_batch()
        dev = store.batch(np_batch[K.RAY_INDEX], True)
        np.testing.assert_array_equal(np.asarray(dev["rgb"]),
                                      np_batch[K.RGB])
        np.testing.assert_array_equal(np.asarray(dev["sky"]),
                                      np_batch[K.SKY])
        np.testing.assert_array_equal(np.asarray(dev["depth"]),
                                      np_batch[K.DEPTH])
        np.testing.assert_array_equal(np.asarray(dev["features"]),
                                      np_batch[K.FEATURES])
    dm.close()


def test_store_cache_and_cap(scene_dir):
    out = _parse(scene_dir)
    a = DeviceRayStore.maybe_build(out.items, True, 512)
    b = DeviceRayStore.maybe_build(out.items, True, 512)
    assert a is b  # one upload per dataset identity
    assert DeviceRayStore.maybe_build(out.items, True, 0) is None
    tiny = DeviceRayStore.maybe_build(out.items, True, 1)
    assert tiny is None  # over the cap


def test_store_cache_keyed_on_resolution(scene_dir):
    """Same files at a different (H, W) must NOT hit a stale store: the
    jitted gather bakes in the stride (advisor r3, device_store.py:128)."""
    out_full = parse(
        DataParserConfig(
            data_dir=scene_dir, centroids_dir=scene_dir / "centroids",
            location="synthetic-city", centroid_name="0", num_aabbs=2,
            pose_scale_factor=0.05, depth_type="lidar",
            train_split_fraction=0.9, image_downscale_factor=1,
        ),
        split="train",
    )
    out_half = parse(
        DataParserConfig(
            data_dir=scene_dir, centroids_dir=scene_dir / "centroids",
            location="synthetic-city", centroid_name="0", num_aabbs=2,
            pose_scale_factor=0.05, depth_type="lidar",
            train_split_fraction=0.9, image_downscale_factor=0.5,
        ),
        split="train",
    )
    a = DeviceRayStore.maybe_build(out_full.items, True, 512)
    b = DeviceRayStore.maybe_build(out_half.items, True, 512)
    assert a is not None and b is not None
    assert a is not b
    assert (b.H, b.W) == (out_half.items[0].H, out_half.items[0].W)
    # Eviction: only the most recent store stays cached, so rebuilding the
    # full-res one re-stages rather than returning the evicted object.
    c = DeviceRayStore.maybe_build(out_full.items, True, 512)
    assert c is not a and DeviceRayStore.maybe_build(out_full.items, True,
                                                     512) is c


def test_eval_batch_bypasses_store(scene_dir, tmp_path):
    """Eval-split ray_index is split-local; routing it through the
    train-only store gathers unrelated train rows (advisor r3 high,
    trainer.py:467). The eval path must return the host pipeline's values
    verbatim."""
    import dataclasses

    from presight_tpu.configs.method_configs import method_configs
    from presight_tpu.engine.trainer import Trainer

    base = method_configs["synthetic-demo"]
    cfg = dataclasses.replace(
        base,
        max_num_iterations=1,
        steps_per_save=1000, steps_per_eval_batch=2,
        steps_per_eval_image=10 ** 9,
        device_ray_store_mb=512,
        experiment_name="devstore-evalpath",
        output_dir=tmp_path, timestamp="t",
        pipeline=dataclasses.replace(
            base.pipeline,
            dataparser=dataclasses.replace(
                base.pipeline.dataparser,
                data_dir=scene_dir,
                centroids_dir=scene_dir / "centroids",
            ),
            datamanager=dataclasses.replace(
                base.pipeline.datamanager, train_num_rays_per_batch=128
            ),
        ),
    )
    tr = Trainer(cfg)
    tr.setup()
    assert tr._device_store is not None and tr._eval_dm is not None
    np_batch = tr._eval_dm.next_batch()
    batch = tr._make_batch(np_batch, use_store=False)
    np.testing.assert_array_equal(np.asarray(batch["rgb"]), np_batch[K.RGB])
    np.testing.assert_array_equal(np.asarray(batch["depth"]),
                                  np_batch[K.DEPTH])
    # And the cadence path itself runs clean.
    tr._eval_batch(step=2)
    tr.datamanager.close()
    tr._eval_dm.close()


def test_trainer_trajectory_identical_with_store(scene_dir, tmp_path):
    """The store is a transfer-layout change only: with it forced on vs
    off, the same config/seed must produce identical step metrics."""
    import dataclasses

    from presight_tpu.configs.method_configs import method_configs

    base = method_configs["synthetic-demo"]
    losses = []
    for cap in (512, 0):
        cfg = dataclasses.replace(
            base,
            max_num_iterations=4,
            steps_per_save=1000, steps_per_eval_batch=0,
            steps_per_eval_image=10 ** 9,
            device_ray_store_mb=cap,
            experiment_name=f"devstore-{cap}",
            output_dir=tmp_path, timestamp="t",
            pipeline=dataclasses.replace(
                base.pipeline,
                dataparser=dataclasses.replace(
                    base.pipeline.dataparser,
                    data_dir=scene_dir,
                    centroids_dir=scene_dir / "centroids",
                ),
                datamanager=dataclasses.replace(
                    base.pipeline.datamanager, train_num_rays_per_batch=128
                ),
            ),
        )
        from presight_tpu.engine.trainer import Trainer

        tr = Trainer(cfg)
        tr.setup()
        assert (tr._device_store is not None) == (cap > 0)
        tr.train()
        import jax
        import jax.numpy as jnp

        losses.append(float(sum(
            jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(
                tr.state.params)
        )))
        tr.datamanager.close()
    assert losses[0] == losses[1]


def test_mesh_store_batches_match_host_shard(scene_dir):
    """Under the 8-device mesh the store replicates its tables, ships a
    host-sharded ray_index, and each device's gathered shard is bitwise
    what shard_batch of the host pipeline's values would have placed
    there (the DistributedSampler analog, my_datamanager.py:206-219)."""
    import jax

    from presight_tpu.parallel import make_mesh

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    out = _parse(scene_dir)
    labels = out.predicted_labels[
        [i for i, it in enumerate(out.all_items) if not it.is_val]
    ]
    ds = PixelChunkDataset(out.items, labels, split="train",
                           load_features=True)
    dm = DataManager(ds, batch_size=128, seed=3)
    store = DeviceRayStore.maybe_build(out.items, True, 512, mesh=mesh)
    assert store is not None and store.mesh is mesh
    # Distinct cache entry from any single-device store over the same files.
    single = DeviceRayStore.maybe_build(out.items, True, 512)
    assert single is not store
    try:
        for _ in range(3):
            np_batch = dm.next_batch()
            got = store.batch(np_batch[K.RAY_INDEX], True)
            # Batch axis sharded over the mesh, zero ICI per step.
            assert "data" in str(got["rgb"].sharding.spec)
            assert len(got["rgb"].addressable_shards) == 8
            np.testing.assert_array_equal(np.asarray(got["rgb"]),
                                          np_batch[K.RGB])
            np.testing.assert_array_equal(np.asarray(got["sky"]),
                                          np_batch[K.SKY])
            np.testing.assert_array_equal(np.asarray(got["depth"]),
                                          np_batch[K.DEPTH])
            np.testing.assert_array_equal(np.asarray(got["features"]),
                                          np_batch[K.FEATURES])
            # Per-device shard content == the host slice for that device.
            shard0 = got["rgb"].addressable_shards[0]
            np.testing.assert_array_equal(np.asarray(shard0.data),
                                          np_batch[K.RGB][:128 // 8])
    finally:
        dm.close()


def test_trainer_trajectory_identical_with_store_on_mesh(scene_dir, tmp_path):
    """Data-parallel run over 8 devices: the sharded store must reproduce
    the host-pipeline trajectory exactly (same standard as the
    single-device trajectory test)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from presight_tpu.configs.method_configs import method_configs
    from presight_tpu.engine.trainer import Trainer

    base = method_configs["synthetic-demo"]
    sums = []
    for cap in (512, 0):
        cfg = dataclasses.replace(
            base,
            max_num_iterations=4,
            steps_per_save=1000, steps_per_eval_batch=0,
            steps_per_eval_image=10 ** 9,
            device_ray_store_mb=cap,
            num_devices=8,
            experiment_name=f"devstore-mesh-{cap}",
            output_dir=tmp_path, timestamp="t",
            pipeline=dataclasses.replace(
                base.pipeline,
                dataparser=dataclasses.replace(
                    base.pipeline.dataparser,
                    data_dir=scene_dir,
                    centroids_dir=scene_dir / "centroids",
                ),
                datamanager=dataclasses.replace(
                    base.pipeline.datamanager, train_num_rays_per_batch=128
                ),
            ),
        )
        tr = Trainer(cfg)
        tr.setup()
        assert tr.mesh is not None
        assert (tr._device_store is not None) == (cap > 0)
        tr.train()
        sums.append(float(sum(
            jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(
                tr.state.params)
        )))
    assert sums[0] == sums[1]


def test_chunk_store_batches_match_host_rows(scene_dir):
    """Chunk-granularity store (dataset over the whole-dataset cap): the
    DataManager's device batches must be bitwise identical to the host
    pipeline's rows across chunk rotations, and the prefetched chunk's
    staging must double-buffer (at most two chunks resident)."""
    from presight_tpu.data.device_store import ChunkDeviceStore

    out = _parse(scene_dir)
    labels = out.predicted_labels[
        [i for i, it in enumerate(out.all_items) if not it.is_val]
    ]

    def make_ds():
        return PixelChunkDataset(out.items, labels, split="train",
                                 images_per_chunk=4, chunk_ratio=0.05)

    dm_host = DataManager(make_ds(), batch_size=64, seed=3)
    store = ChunkDeviceStore(cap_mb=512)
    dm_dev = DataManager(make_ds(), batch_size=64, seed=3, chunk_store=store)
    # Enough batches to rotate chunks at least twice.
    for _ in range(12):
        host = dm_host.next_batch()
        dev = dm_dev.next_batch()
        assert not isinstance(dev[K.RGB], np.ndarray)  # device tensors
        for k in host:
            np.testing.assert_array_equal(np.asarray(dev[k]), host[k],
                                          err_msg=k)
        assert len(store._staged) <= 2
    dm_host.close()
    dm_dev.close()


def test_chunk_store_over_cap_falls_back_to_host(scene_dir):
    from presight_tpu.data.device_store import ChunkDeviceStore

    out = _parse(scene_dir)
    ds = PixelChunkDataset(out.items, None, split="train",
                           images_per_chunk=4, chunk_ratio=0.05,
                           load_features=False)
    store = ChunkDeviceStore(cap_mb=0)
    store.cap_bytes = 1  # even one padded chunk exceeds this
    dm = DataManager(ds, batch_size=64, seed=3, chunk_store=store)
    b = dm.next_batch()
    assert isinstance(b[K.RGB], np.ndarray)  # transparent host fallback
    assert not store.enabled and not store._staged
    dm.close()


def test_chunk_store_mesh_sharded_batches(scene_dir):
    """Under the 8-device mesh the chunk store's batch tensors must be
    batch-axis sharded and bitwise equal to the host rows."""
    import jax

    from presight_tpu.data.device_store import ChunkDeviceStore
    from presight_tpu.parallel import make_mesh

    out = _parse(scene_dir)
    ds = PixelChunkDataset(out.items, None, split="train",
                           images_per_chunk=4, chunk_ratio=0.05,
                           load_features=False)
    ds2 = PixelChunkDataset(out.items, None, split="train",
                            images_per_chunk=4, chunk_ratio=0.05,
                            load_features=False)
    mesh = make_mesh(8)
    store = ChunkDeviceStore(cap_mb=512, mesh=mesh)
    dm_dev = DataManager(ds, batch_size=64, seed=5, chunk_store=store)
    dm_host = DataManager(ds2, batch_size=64, seed=5)
    for _ in range(3):
        dev = dm_dev.next_batch()
        host = dm_host.next_batch()
        for k in host:
            np.testing.assert_array_equal(np.asarray(dev[k]), host[k],
                                          err_msg=k)
        shard_axes = {d.sharding.spec[0] for d in dev.values()}
        assert shard_axes == {"data"}, shard_axes
    dm_dev.close()
    dm_host.close()


def test_trainer_trajectory_identical_with_chunk_store(scene_dir, tmp_path):
    """A dataset OVER the whole-dataset cap must still train through
    HBM-resident chunk batches (DeviceRayStore declines, ChunkDeviceStore
    engages) with a trajectory identical to the host pipeline's."""
    import dataclasses

    from presight_tpu.configs.method_configs import method_configs

    out = _parse(scene_dir)
    it0 = out.items[0]
    full_mb = (max(it.image_index for it in out.items) + 1) * it0.H * it0.W \
        * (3 + 1 + 1 + 64) * 4 / 2 ** 20
    cap = int(full_mb)  # DeviceRayStore needs strictly more than this

    base = method_configs["synthetic-demo"]
    sums = []
    for cap_mb in (cap, 0):
        cfg = dataclasses.replace(
            base,
            max_num_iterations=4,
            steps_per_save=1000, steps_per_eval_batch=0,
            steps_per_eval_image=10 ** 9,
            device_ray_store_mb=cap_mb,
            experiment_name=f"chunkstore-{cap_mb}",
            output_dir=tmp_path, timestamp="t",
            pipeline=dataclasses.replace(
                base.pipeline,
                dataparser=dataclasses.replace(
                    base.pipeline.dataparser,
                    data_dir=scene_dir,
                    centroids_dir=scene_dir / "centroids",
                ),
                datamanager=dataclasses.replace(
                    base.pipeline.datamanager, train_num_rays_per_batch=128,
                    images_per_chunk=4,
                ),
            ),
        )
        from presight_tpu.engine.trainer import Trainer

        tr = Trainer(cfg)
        tr.setup()
        if cap_mb > 0:
            assert tr._device_store is None  # over the whole-dataset cap
            assert tr._chunk_store is not None
        tr.train()
        if cap_mb > 0:
            assert tr._chunk_store.enabled and tr._chunk_store._staged, \
                "chunk store never staged a chunk (cap too small for test?)"
        import jax
        import jax.numpy as jnp

        sums.append(float(sum(
            jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(
                tr.state.params)
        )))
        tr.datamanager.close()
    assert sums[0] == sums[1]
