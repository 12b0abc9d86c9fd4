"""Priorsplit info-pickle converter (stage-3 data prep, D11).

Reference spec: occupancy/tools/create_data_bevdet.py:88-173 +
tools/data_converter/nuscenes_converter.py:55-110 + nusc_presight_split.py —
the city-disjoint "priorsplit": VAL scenes live in onenorth+hollandvillage,
PRIOR scenes (used to build the val cities' priors) are excluded from both
train and val, pose-fail scenes are dropped everywhere; per-sample info
dicts carry the camera geometry, ego poses, scene/occ bookkeeping consumed
by the BEVDet-Occ chain (presight_tpu/occupancy) and the prior lookup
(map location -> CityPriors).

Usage:
  python -m presight_tpu.scripts.create_priorsplit_infos \
      --data-root data/nuscenes [--version v1.0-trainval] \
      [--extra-tag presight-priorsplit]

``nusc`` injection (tests): any object with .scene and .get(table, token).
"""

from __future__ import annotations

import argparse
import json
import pickle
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from .create_nuscenes_infos import quat_translation_to_matrix

CAM_CHANNELS = [
    "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
    "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
]

_SPLIT_JSON = Path(__file__).parent.parent / "data" / "splits" / "nusc_presight_split.json"


def priorsplit_scene_sets() -> Tuple[set, set, set]:
    """(val, prior, fail) scene-name sets (nusc_presight_split.py:38-70)."""
    d = json.loads(_SPLIT_JSON.read_text())
    val = set(d["onenorth_val"]) | set(d["holland_val"])
    prior = set(d["onenorth_val_prior"]) | set(d["holland_val_prior"])
    fail = set(d["POSE_FAIL_SCENES"])
    return val, prior, fail


def split_scenes(scene_names: List[str]) -> Dict[str, List[str]]:
    """3-way priorsplit (nuscenes_converter.py:67-82): train = everything
    except VAL + PRIOR + fails; val = VAL minus fails; prior scenes are in
    neither (their images built the val-city priors)."""
    val, prior, fail = priorsplit_scene_sets()
    out = {
        "train": [s for s in scene_names if s not in val | prior | fail],
        "val": [s for s in scene_names if s in val and s not in fail],
        "prior": [s for s in scene_names if s in prior and s not in fail],
    }
    overlap = set(out["train"]) & set(out["val"])
    assert not overlap, f"train/val overlap: {sorted(overlap)[:5]}"
    return out


def _sample_info(nusc, sample, data_root: Path, occ_root: str) -> Dict:
    """Per-sample info dict: the subset of mmdet3d's _fill_trainval_infos
    fields the occupancy chain consumes, plus occ_path/scene bookkeeping
    (create_data_bevdet.py:105-135)."""
    scene = nusc.get("scene", sample["scene_token"])
    log = nusc.get("log", scene["log_token"])
    lidar_sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
    lidar_cs = nusc.get("calibrated_sensor", lidar_sd["calibrated_sensor_token"])
    lidar_ego = nusc.get("ego_pose", lidar_sd["ego_pose_token"])

    info = {
        "token": sample["token"],
        "scene_token": sample["scene_token"],
        "scene_name": scene["name"],
        "map_location": log["location"],
        "timestamp": sample["timestamp"],
        "lidar_path": str(data_root / lidar_sd["filename"]),
        "lidar2ego_rotation": list(lidar_cs["rotation"]),
        "lidar2ego_translation": list(lidar_cs["translation"]),
        "ego2global_rotation": list(lidar_ego["rotation"]),
        "ego2global_translation": list(lidar_ego["translation"]),
        "occ_path": f"{occ_root}/gts/{scene['name']}/{sample['token']}",
        "cams": {},
    }
    for channel in CAM_CHANNELS:
        if channel not in sample["data"]:
            continue
        sd = nusc.get("sample_data", sample["data"][channel])
        cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
        ego = nusc.get("ego_pose", sd["ego_pose_token"])
        info["cams"][channel] = {
            "data_path": str(data_root / sd["filename"]),
            "sample_data_token": sd["token"],
            "sensor2ego_rotation": list(cs["rotation"]),
            "sensor2ego_translation": list(cs["translation"]),
            "ego2global_rotation": list(ego["rotation"]),
            "ego2global_translation": list(ego["translation"]),
            "cam_intrinsic": np.asarray(cs["camera_intrinsic"], np.float64),
            "timestamp": sd["timestamp"],
        }
    return info


def create_priorsplit_infos(
    data_root: Path,
    version: str = "v1.0-trainval",
    extra_tag: str = "presight-priorsplit",
    occ_root: str = "occ3d-nus",
    nusc=None,
) -> Dict[str, Path]:
    if nusc is None:
        try:
            from nuscenes.nuscenes import NuScenes
        except ImportError as e:  # pragma: no cover - devkit not bundled
            raise SystemExit(
                "nuscenes-devkit is required; tests inject a synthetic nusc"
            ) from e

        nusc = NuScenes(version=version, dataroot=str(data_root), verbose=True)

    data_root = Path(data_root)
    scene_names = [s["name"] for s in nusc.scene]
    split = split_scenes(scene_names)
    name_to_scene = {s["name"]: s for s in nusc.scene}

    def walk(scene_list: List[str]) -> List[Dict]:
        infos = []
        for name in scene_list:
            scene = name_to_scene[name]
            tok = scene["first_sample_token"]
            while tok:
                sample = nusc.get("sample", tok)
                infos.append(_sample_info(nusc, sample, data_root, occ_root))
                tok = sample["next"]
        infos.sort(key=lambda i: i["timestamp"])
        return infos

    out_paths = {}
    for part in ("train", "val"):
        infos = walk(split[part])
        payload = {"infos": infos, "metadata": {"version": version}}
        path = data_root / f"{extra_tag}_infos_{part}.pkl"
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        out_paths[part] = path
        print(f"{part}: {len(split[part])} scenes, {len(infos)} samples -> {path}")
    print(f"prior scenes (excluded from both): {len(split['prior'])}")
    return out_paths


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-root", type=Path, required=True)
    parser.add_argument("--version", default="v1.0-trainval")
    parser.add_argument("--extra-tag", default="presight-priorsplit")
    parser.add_argument("--occ-root", default="occ3d-nus")
    args = parser.parse_args(argv)
    create_priorsplit_infos(args.data_root, args.version, args.extra_tag,
                            args.occ_root)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
