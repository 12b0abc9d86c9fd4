"""Executed tests for the stage-1/stage-3 data-prep scripts (N16-N18, D11).

A synthetic nuscenes-devkit-shaped fixture (FakeNusc: .scene + .get) drives
create_nuscenes_infos (incl. the lidar-depth path) and the priorsplit info
converter; the DINO and SegFormer extraction scripts run end-to-end with
RANDOM locally-saved weights (zero-egress image, so pretrained tensors are
out of scope — the executed code paths are identical).
"""

import json
import pickle
from pathlib import Path

import numpy as np
import pytest

CAMS = ["CAM_FRONT", "CAM_FRONT_LEFT", "CAM_FRONT_RIGHT",
        "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]


class FakeNusc:
    """Minimal devkit-table stand-in: .scene list + .get(table, token)."""

    def __init__(self, root: Path, scene_names, frames_per_scene=2,
                 location="singapore-onenorth"):
        self.root = root
        self.tables = {t: {} for t in
                       ("sample", "sample_data", "calibrated_sensor",
                        "ego_pose", "scene", "log")}
        self.scene = []
        rng = np.random.RandomState(0)
        intrinsic = [[40.0, 0, 32.0], [0, 40.0, 16.0], [0, 0, 1.0]]

        for si, name in enumerate(scene_names):
            log_tok = f"log-{si}"
            self.tables["log"][log_tok] = {"token": log_tok,
                                           "location": location}
            sample_toks = [f"s{si}-{f}" for f in range(frames_per_scene)]
            scene_rec = {
                "token": f"scene-tok-{si}", "name": name,
                "first_sample_token": sample_toks[0], "log_token": log_tok,
            }
            self.scene.append(scene_rec)
            self.tables["scene"][scene_rec["token"]] = scene_rec

            for f, stok in enumerate(sample_toks):
                ts = 1_000_000 * (si * 100 + f)
                data = {}
                # lidar sample_data
                ltok = f"{stok}-lidar"
                lfile = f"sweeps/LIDAR_TOP/{ltok}.pcd.bin"
                (root / lfile).parent.mkdir(parents=True, exist_ok=True)
                pts = rng.randn(50, 5).astype(np.float32)
                # cluster the cloud in front of CAM_FRONT (+x in the ego
                # frame) so depth rasterization has hits
                pts[:, 0] = np.abs(pts[:, 0]) * 4 + 4 + 10 * si + f
                pts[:, 1] *= 0.5
                pts[:, 2] = np.abs(pts[:, 2]) * 0.8 + 1.0
                pts.tofile(root / lfile)
                cs_tok = f"{ltok}-cs"
                ego_tok = f"{ltok}-ego"
                self.tables["calibrated_sensor"][cs_tok] = {
                    "rotation": [1.0, 0, 0, 0], "translation": [0.0, 0, 1.8],
                    "camera_intrinsic": [],
                }
                self.tables["ego_pose"][ego_tok] = {
                    "rotation": [1.0, 0, 0, 0],
                    "translation": [float(10 * si + f), 0.0, 0.0],
                }
                self.tables["sample_data"][ltok] = {
                    "token": ltok, "filename": lfile, "timestamp": ts,
                    "calibrated_sensor_token": cs_tok, "ego_pose_token": ego_tok,
                    "is_key_frame": True, "height": 0, "width": 0,
                    "sample_token": stok,
                    "next": f"{sample_toks[f+1]}-lidar" if f + 1 < frames_per_scene else "",
                }
                data["LIDAR_TOP"] = ltok

                for cam in CAMS:
                    ctok = f"{stok}-{cam}"
                    cfile = f"samples/{cam}/{ctok}.jpg"
                    (root / cfile).parent.mkdir(parents=True, exist_ok=True)
                    from PIL import Image

                    Image.fromarray(
                        (rng.rand(32, 64, 3) * 255).astype(np.uint8)
                    ).save(root / cfile)
                    ccs, cego = f"{ctok}-cs", f"{ctok}-ego"
                    self.tables["calibrated_sensor"][ccs] = {
                        "rotation": [0.5, -0.5, 0.5, -0.5],
                        "translation": [1.5, 0.0, 1.5],
                        "camera_intrinsic": intrinsic,
                    }
                    self.tables["ego_pose"][cego] = {
                        "rotation": [1.0, 0, 0, 0],
                        "translation": [float(10 * si + f), 0.0, 0.0],
                    }
                    self.tables["sample_data"][ctok] = {
                        "token": ctok, "filename": cfile, "timestamp": ts,
                        "calibrated_sensor_token": ccs, "ego_pose_token": cego,
                        "is_key_frame": True, "height": 32, "width": 64,
                        "sample_token": stok,
                        "next": f"{sample_toks[f+1]}-{cam}" if f + 1 < frames_per_scene else "",
                    }
                    data[cam] = ctok

                self.tables["sample"][stok] = {
                    "token": stok, "data": data, "timestamp": ts,
                    "scene_token": scene_rec["token"],
                    "next": sample_toks[f + 1] if f + 1 < frames_per_scene else "",
                }

    def get(self, table, token):
        return self.tables[table][token]


@pytest.fixture(scope="module")
def fake_nusc(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc")
    # one train-city scene + one scene from each priorsplit bucket
    split = json.loads(
        (Path("presight_tpu/data/splits/nusc_presight_split.json")).read_text()
    )
    # "scene-9999" is in no split bucket -> lands in train
    names = ["scene-9999", split["onenorth_val"][0],
             split["onenorth_val_prior"][0], split["POSE_FAIL_SCENES"][0]]
    return root, FakeNusc(root, names)


def test_create_nuscenes_infos_on_fixture(fake_nusc):
    root, nusc = fake_nusc
    from presight_tpu.scripts.create_nuscenes_infos import create_nuscenes_infos

    create_nuscenes_infos(root, scenes=["scene-9999"], process_lidar=True,
                          nusc=nusc)
    pkl = root / "PreSight" / "scene-9999.pkl"
    assert pkl.exists()
    with open(pkl, "rb") as f:
        items = pickle.load(f)
    assert len(items) == 12  # 6 cameras x 2 frames
    rec = items[0]
    for key in ("channel", "filename", "ego2global", "cam2ego",
                "cam_intrinsic", "height", "width", "timestamp",
                "is_key_frame", "scene_name", "lidar_depth_filename",
                "segmentation_filename", "dino_filename"):
        assert key in rec, key
    assert rec["ego2global"].shape == (4, 4)
    # lidar depth npz written and image-shaped
    depth = np.load(rec["lidar_depth_filename"])["arr_0"]
    assert depth.shape == (32, 64)
    assert (depth > 0).any()


def test_priorsplit_converter_on_fixture(fake_nusc):
    root, nusc = fake_nusc
    from presight_tpu.scripts.create_priorsplit_infos import (
        create_priorsplit_infos, split_scenes,
    )

    names = [s["name"] for s in nusc.scene]
    split = split_scenes(names)
    assert split["train"] == ["scene-9999"]
    assert len(split["val"]) == 1 and len(split["prior"]) == 1
    # the pose-fail scene lands nowhere
    assert sum(map(len, split.values())) == 3

    paths = create_priorsplit_infos(root, nusc=nusc)
    with open(paths["train"], "rb") as f:
        train = pickle.load(f)
    with open(paths["val"], "rb") as f:
        val = pickle.load(f)
    assert len(train["infos"]) == 2 and len(val["infos"]) == 2
    info = train["infos"][0]
    for key in ("token", "scene_name", "map_location", "lidar_path",
                "ego2global_rotation", "occ_path", "cams"):
        assert key in info, key
    assert set(info["cams"]) == set(CAMS)
    assert info["cams"]["CAM_FRONT"]["cam_intrinsic"].shape == (3, 3)
    # city-disjointness: no val scene token appears in train
    train_scenes = {i["scene_name"] for i in train["infos"]}
    val_scenes = {i["scene_name"] for i in val["infos"]}
    assert not train_scenes & val_scenes


def test_dino_extraction_runs_with_random_weights(fake_nusc, tmp_path):
    root, _ = fake_nusc
    import torch

    from presight_tpu.scripts import extract_dino_features as D

    rng = np.random.RandomState(0)

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.02)

    sd = {
        "patch_embed.proj.weight": t(D.VIT_DIM, 3, D.PATCH, D.PATCH),
        "patch_embed.proj.bias": t(D.VIT_DIM),
        "cls_token": t(1, 1, D.VIT_DIM),
        "pos_embed": t(1, 28 * 28 + 1, D.VIT_DIM),
    }
    for i in range(D.VIT_DEPTH):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": t(D.VIT_DIM), p + "norm1.bias": t(D.VIT_DIM),
            p + "attn.qkv.weight": t(3 * D.VIT_DIM, D.VIT_DIM),
            p + "attn.qkv.bias": t(3 * D.VIT_DIM),
            p + "attn.proj.weight": t(D.VIT_DIM, D.VIT_DIM),
            p + "attn.proj.bias": t(D.VIT_DIM),
            p + "norm2.weight": t(D.VIT_DIM), p + "norm2.bias": t(D.VIT_DIM),
            p + "mlp.fc1.weight": t(4 * D.VIT_DIM, D.VIT_DIM),
            p + "mlp.fc1.bias": t(4 * D.VIT_DIM),
            p + "mlp.fc2.weight": t(D.VIT_DIM, 4 * D.VIT_DIM),
            p + "mlp.fc2.bias": t(D.VIT_DIM),
        })
    weights = tmp_path / "dino_random.pth"
    torch.save(sd, weights)

    # flatten one camera dir into data-dir/samples as the script expects
    data_dir = tmp_path / "data"
    (data_dir / "samples").mkdir(parents=True)
    for i, src in enumerate(sorted((root / "samples" / "CAM_FRONT").glob("*.jpg"))):
        (data_dir / "samples" / f"img{i}.jpg").write_bytes(src.read_bytes())

    rc = D.main([
        "--mode", "get_reduction_matrix", "--data-dir", str(data_dir),
        "--weights", str(weights), "--image-size", "32", "64",
        "--batch-size", "2",
    ])
    assert rc == 0
    assert (data_dir / "dino_features" / "pca_results.pkl").exists()
    assert (data_dir / "dino_features" / "dino_to_rgb.pkl").exists()

    rc = D.main([
        "--mode", "get_dino", "--data-dir", str(data_dir),
        "--weights", str(weights), "--image-size", "32", "64",
        "--batch-size", "2",
    ])
    assert rc == 0
    npz = sorted((data_dir / "dino_features").glob("img*.npz"))
    assert npz
    feats = np.load(npz[0])["arr_0"]
    assert feats.dtype == np.float16 and feats.shape[-1] == 64


def test_segmentation_extraction_runs_with_random_weights(fake_nusc, tmp_path):
    pytest.importorskip("transformers")
    root, _ = fake_nusc
    from transformers import (SegformerConfig, SegformerForSemanticSegmentation,
                              SegformerImageProcessor)

    cfg = SegformerConfig(
        num_channels=3, num_encoder_blocks=2, depths=[1, 1],
        sr_ratios=[4, 2], hidden_sizes=[8, 16], num_attention_heads=[1, 2],
        decoder_hidden_size=16, num_labels=19,
    )
    model = SegformerForSemanticSegmentation(cfg)
    wdir = tmp_path / "segformer-random"
    model.save_pretrained(wdir)
    SegformerImageProcessor(size={"height": 32, "width": 64}).save_pretrained(wdir)

    from presight_tpu.scripts import extract_segmentation as S

    data_dir = tmp_path / "data"
    (data_dir / "samples").mkdir(parents=True)
    for i, src in enumerate(sorted((root / "samples" / "CAM_FRONT").glob("*.jpg"))):
        (data_dir / "samples" / f"img{i}.jpg").write_bytes(src.read_bytes())

    rc = S.main(["--data-dir", str(data_dir), "--weights", str(wdir),
                 "--batch-size", "2"])
    assert rc == 0
    npz = sorted((data_dir / "segmentation").glob("img*.npz"))
    assert npz
    seg = np.load(npz[0])["arr_0"]
    assert seg.dtype == np.uint8
    assert seg.max() < 19


def test_segformer_jnp_parity_vs_torch(tmp_path):
    """The pure-jnp SegFormer (C10) matches transformers' torch model
    bit-tight on random weights: full 4-stage MiT encoder (all sr ratios,
    multi-head, Mix-FFN depthwise) + all-MLP decode head."""
    pytest.importorskip("transformers")
    import torch
    from transformers import SegformerConfig, SegformerForSemanticSegmentation

    from presight_tpu.scripts.segformer_jnp import (
        convert_segformer_weights, load_segformer_snapshot, segformer_logits)

    cfg = SegformerConfig(
        num_channels=3, num_encoder_blocks=4, depths=[1, 1, 2, 1],
        sr_ratios=[8, 4, 2, 1], hidden_sizes=[8, 16, 24, 32],
        num_attention_heads=[1, 2, 4, 8], decoder_hidden_size=16,
        num_labels=19,
    )
    model = SegformerForSemanticSegmentation(cfg).eval()
    wdir = tmp_path / "segformer-parity"
    model.save_pretrained(wdir)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.logits.numpy().transpose(0, 2, 3, 1)

    config, sd = load_segformer_snapshot(wdir)
    params = convert_segformer_weights(config, sd)
    out = np.asarray(segformer_logits(params, x))

    assert out.shape == ref.shape
    scale = max(1.0, float(np.abs(ref).max()))
    assert np.abs(out - ref).max() < 1e-3 * scale


def test_segmentation_extraction_torch_impl(fake_nusc, tmp_path):
    """--impl torch keeps the transformers-CPU fallback working."""
    pytest.importorskip("transformers")
    root, _ = fake_nusc
    from transformers import (SegformerConfig, SegformerForSemanticSegmentation,
                              SegformerImageProcessor)

    cfg = SegformerConfig(
        num_channels=3, num_encoder_blocks=2, depths=[1, 1],
        sr_ratios=[4, 2], hidden_sizes=[8, 16], num_attention_heads=[1, 2],
        decoder_hidden_size=16, num_labels=19,
    )
    wdir = tmp_path / "segformer-random"
    SegformerForSemanticSegmentation(cfg).save_pretrained(wdir)
    SegformerImageProcessor(size={"height": 32, "width": 64}).save_pretrained(wdir)

    from presight_tpu.scripts import extract_segmentation as S

    data_dir = tmp_path / "data"
    (data_dir / "samples").mkdir(parents=True)
    for i, src in enumerate(sorted((root / "samples" / "CAM_FRONT").glob("*.jpg"))):
        (data_dir / "samples" / f"img{i}.jpg").write_bytes(src.read_bytes())

    rc = S.main(["--data-dir", str(data_dir), "--weights", str(wdir),
                 "--batch-size", "2", "--impl", "torch"])
    assert rc == 0
    npz = sorted((data_dir / "segmentation").glob("img*.npz"))
    assert npz and np.load(npz[0])["arr_0"].dtype == np.uint8
