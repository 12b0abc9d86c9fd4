"""Stage-3 infos -> batch pipeline (data/stage3_pipeline.py): the devkit
fixture's priorsplit infos feed real train_occ steps end-to-end — image
loading + ida/bda aug replay + occ GT + adjacent-frame queue + prior
voxelization (reference nuscenes_dataset.py:176-310 + pipelines/loading.py
+ prior_points.py)."""

import pickle
from pathlib import Path

import numpy as np
import pytest

from tests.test_dataprep_scripts import FakeNusc


@pytest.fixture(scope="module")
def stage3_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc_stage3")
    nusc = FakeNusc(root, ["scene-9999"], frames_per_scene=4)

    from presight_tpu.scripts.create_priorsplit_infos import (
        create_priorsplit_infos,
    )

    occ_root = root / "occ3d-nus"
    paths = create_priorsplit_infos(root, nusc=nusc,
                                    occ_root=str(occ_root))

    # Occ3D-shaped GT at the toy grid (20, 20, 8), classes 0..17.
    rng = np.random.RandomState(0)
    with open(paths["train"], "rb") as f:
        infos = pickle.load(f)["infos"]
    for info in infos:
        d = Path(info["occ_path"])
        d.mkdir(parents=True, exist_ok=True)
        np.savez(
            d / "labels.npz",
            semantics=rng.randint(0, 18, (20, 20, 8)).astype(np.uint8),
            mask_lidar=np.ones((20, 20, 8), np.uint8),
            mask_camera=(rng.rand(20, 20, 8) > 0.1).astype(np.uint8),
        )

    # A city prior pickle near the fixture's ego track (ego x in 0..3).
    city = "singapore-onenorth"
    pdir = root / "camera_priors" / city
    pdir.mkdir(parents=True)
    n = 500
    pts = np.stack([
        rng.uniform(-6, 6, n), rng.uniform(-6, 6, n), rng.uniform(-0.5, 2.5, n)
    ], -1).astype(np.float32)
    with open(pdir / f"{city}-c0.pkl", "wb") as f:
        pickle.dump({
            "points": pts,
            "features": rng.rand(n, 64).astype(np.float16),
            "colors": rng.rand(n, 3).astype(np.float32),
            "hits": rng.randint(1, 20, n).astype(np.int64),
            "origin": np.zeros(3, np.float32),
        }, f)
    return root, paths["train"]


def test_dataset_batches_have_contract_shapes(stage3_root):
    root, infos_path = stage3_root
    from presight_tpu.data.stage3_pipeline import (
        IdaAugConfig, Stage3OccDataset,
    )
    from presight_tpu.prior.consume import CityPriors, VoxelizePriorPoints

    pr = [-8.0, -8.0, -1.0, 8.0, 8.0, 3.0]
    priors = CityPriors(str(root), {"singapore-onenorth": 1}, pr)
    vox = VoxelizePriorPoints(pc_range=pr, voxel_size=[0.8, 0.8, 0.5])
    ds = Stage3OccDataset(
        infos_path, ida=IdaAugConfig(input_size=(32, 64)), is_train=True,
        temporal=True, priors=priors, voxelizer=vox,
    )
    assert len(ds) == 4
    rng = np.random.RandomState(0)
    b = ds.batch([1, 2], rng, pad_prior_to=256)
    assert b["imgs"].shape == (2, 6, 3, 32, 64)
    assert b["sensor2ego"].shape == (2, 6, 4, 4)
    assert b["cam2imgs"].shape == (2, 6, 3, 3)
    assert b["post_rots"].shape == (2, 6, 3, 3)
    assert b["post_trans"].shape == (2, 6, 3)
    assert b["bda"].shape == (2, 4, 4)
    assert b["voxel_semantics"].shape == (2, 20, 20, 8)
    assert b["mask_camera"].shape == (2, 20, 20, 8)
    # Temporal queue: adjacent frame with shared ida augs + aligned geometry.
    assert b["prev_imgs"].shape == (2, 6, 3, 32, 64)
    assert b["prev_sensor2ego"].shape == (2, 6, 4, 4)
    assert b["k2s_sensor"].shape == (2, 6, 4, 4)
    assert b["prev2curr"].shape == (2, 3, 3)
    # Prior voxels padded with validity mask; the fixture's cloud is inside
    # pc_range so some voxels must survive the crop.
    assert b["prior_feats"].shape == (2, 256, 68)
    assert b["prior_coords"].shape == (2, 256, 3)
    assert b["prior_valid"].any()
    for k, v in b.items():
        assert np.isfinite(np.asarray(v, np.float64)).all(), k

    # The key frame's sensor->keyego of camera 0 at the key frame is the
    # plain sensor2ego (global2keyego @ keyego2global == I).
    info = ds.infos[1]
    from presight_tpu.data.stage3_pipeline import quat_to_mat4

    cam0 = info["cams"]["CAM_FRONT_LEFT"]
    s2e = quat_to_mat4(cam0["sensor2ego_rotation"],
                       cam0["sensor2ego_translation"])
    e2g_cam = quat_to_mat4(cam0["ego2global_rotation"],
                           cam0["ego2global_translation"])
    # keyego is camera 0's ego pose by construction (bevdet.py:91).
    expect = np.linalg.inv(e2g_cam) @ e2g_cam @ s2e
    np.testing.assert_allclose(b["sensor2ego"][0, 0], expect, atol=1e-5)

    # Eval mode is deterministic: identity-ish augs, no flips.
    ds_eval = Stage3OccDataset(infos_path,
                               ida=IdaAugConfig(input_size=(32, 64)),
                               is_train=False)
    b1 = ds_eval.batch([0], np.random.RandomState(1))
    b2 = ds_eval.batch([0], np.random.RandomState(2))
    np.testing.assert_array_equal(b1["imgs"], b2["imgs"])
    np.testing.assert_array_equal(b1["bda"], np.eye(4)[None])


def test_train_occ_cli_trains_from_infos(stage3_root, tmp_path):
    """VERDICT round-4 item 8 done-criterion: the D6 chain executes real
    train steps from infos pickles (not toy batches), with the prior
    voxelization on."""
    root, infos_path = stage3_root
    from presight_tpu.scripts.train_occ import main

    rc = main([
        "--infos", str(infos_path),
        "--prior-root", str(root),
        "--prior-city-parts", "singapore-onenorth:1",
        "--iters", "2", "--batch-size", "2",
        "--out", str(tmp_path / "occ"),
        "--seed", "0",
    ])
    assert rc == 0
    ckpts = list((tmp_path / "occ").glob("occ-step-*.pkl"))
    assert len(ckpts) == 1


def test_train_map_cli_trains_from_samples(stage3_root, tmp_path):
    """The D7 chain executes real streaming train steps from a mapping ann
    pickle (images + ego2img + vectorized map_geoms + prior voxels) via
    Stage3MapDataset."""
    root, infos_path = stage3_root
    rng = np.random.RandomState(0)

    # Build a mapping-style ann from the fixture's camera files: two
    # consecutive samples of one scene.
    with open(infos_path, "rb") as f:
        infos = pickle.load(f)["infos"]
    samples = []
    for info in infos[:2]:
        cams = {}
        for name, c in info["cams"].items():
            ego2cam = np.linalg.inv(
                np.eye(4)
            )  # fixture extrinsic: identity ego2cam keeps taps in-frame
            cams[name] = {
                "img_fpath": c["data_path"],
                "intrinsics": np.asarray(c["cam_intrinsic"], np.float64),
                "extrinsics": ego2cam,
            }
        samples.append({
            "token": info["token"],
            "scene_name": info["scene_name"],
            "location": info["map_location"],
            "e2g_translation": info["ego2global_translation"],
            "e2g_rotation": info["ego2global_rotation"],
            "cams": cams,
            "map_geoms": {
                0: [rng.uniform(-20, 20, (5, 2))],
                1: [rng.uniform(-10, 10, (3, 2)),
                    rng.uniform(-10, 10, (4, 2))],
            },
        })
    ann_path = tmp_path / "map_ann.pkl"
    with open(ann_path, "wb") as f:
        pickle.dump({"samples": samples}, f)

    from presight_tpu.scripts.train_map import main

    rc = main([
        "--samples", str(ann_path),
        "--prior-root", str(root),
        "--prior-city-parts", "singapore-onenorth:1",
        "--iters", "1",
        "--out", str(tmp_path / "map"),
    ])
    assert rc == 0
    assert list((tmp_path / "map").glob("map-step-*.pkl"))
