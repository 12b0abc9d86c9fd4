"""Stage-1 data prep: per-scene annotation pickles (+ lidar depth maps).

Reference spec: nerfstudio-0.3.3/nerfstudio/scripts/datasets/
create_nuscenes_infos.py:44-207 — walk every scene x camera sample_data
chain, compute ego2global / cam2ego poses, optionally accumulate lidar
sweeps around each frame and project them into per-pixel depth npz maps,
and dump `PreSight/{scene}.pkl` sample_data lists (the schema consumed by
our dataparser and documented in data/synthetic.py).

Requires nuscenes-devkit (not bundled in this image); the projection math
(`sweep_to_image`, :152-186 equivalent) is devkit-free and unit-tested.

Usage:
  python -m presight_tpu.scripts.create_nuscenes_infos --data-dir data/nuScenes \
      [--version v1.0-trainval] [--process-lidar] [--scenes scene-0001 ...]
"""

from __future__ import annotations

import argparse
import os
import pickle
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def quat_translation_to_matrix(rotation_quat, translation) -> np.ndarray:
    """(w,x,y,z) quaternion + translation -> 4x4 pose."""
    from ..prior.consume import _quat_to_rotmat

    m = np.eye(4)
    m[:3, :3] = _quat_to_rotmat(rotation_quat)
    m[:3, 3] = np.asarray(translation, np.float64)
    return m


def project_points_to_image(
    points_sensor: np.ndarray,  # (N, 3) in camera frame (OpenCV: z forward)
    intrinsic: np.ndarray,  # (3, 3)
    width: int,
    height: int,
    min_dist: float = 1.0,
):
    """Project camera-frame points to pixels; returns (cols, rows, depths)
    for points in front of the camera and inside the image
    (create_nuscenes_infos.py sweep_to_image projection, :152-186)."""
    depths = points_sensor[:, 2]
    pts = points_sensor / np.maximum(depths[:, None], 1e-9)
    uv = pts @ intrinsic.T
    cols = uv[:, 0]
    rows = uv[:, 1]
    valid = (
        (depths > min_dist)
        & (cols >= 0) & (cols < width)
        & (rows >= 0) & (rows < height)
    )
    return cols[valid].astype(np.int64), rows[valid].astype(np.int64), depths[valid]


def depth_map_from_points(cols, rows, depths, width: int, height: int) -> np.ndarray:
    """Rasterize projected points into a min-depth-per-pixel map; -1 where
    empty (matches the reference's npz depth-map convention)."""
    depth_map = np.full((height, width), np.inf, np.float32)
    np.minimum.at(depth_map, (rows, cols), depths.astype(np.float32))
    depth_map[np.isinf(depth_map)] = -1.0
    return depth_map


def create_nuscenes_infos(
    data_dir: Path,
    version: str = "v1.0-trainval",
    scenes: Optional[List[str]] = None,
    process_lidar: bool = False,
    sweep_window_s: float = 0.1,
    nusc=None,
) -> None:
    """``nusc`` accepts any object with the devkit's table interface
    (.scene list + .get(table, token)); tests inject a synthetic one."""
    if nusc is None:
        try:
            from nuscenes.nuscenes import NuScenes
        except ImportError as e:  # pragma: no cover - devkit not bundled
            raise SystemExit(
                "nuscenes-devkit is required for create_nuscenes_infos; install it "
                "or prepare the per-scene pickles elsewhere (schema documented in "
                "presight_tpu/data/synthetic.py)."
            ) from e

        nusc = NuScenes(version=version, dataroot=str(data_dir), verbose=True)
    out_dir = Path(data_dir) / "PreSight"
    out_dir.mkdir(parents=True, exist_ok=True)
    cam_channels = ["CAM_FRONT", "CAM_FRONT_LEFT", "CAM_FRONT_RIGHT",
                    "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]

    for scene in nusc.scene:
        if scenes and scene["name"] not in scenes:
            continue
        sample_data_list: List[Dict] = []
        first_sample = nusc.get("sample", scene["first_sample_token"])
        for channel in cam_channels:
            sd_token = first_sample["data"][channel]
            while sd_token:
                sd = nusc.get("sample_data", sd_token)
                cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
                ego = nusc.get("ego_pose", sd["ego_pose_token"])
                ego2global = quat_translation_to_matrix(ego["rotation"], ego["translation"])
                cam2ego = quat_translation_to_matrix(cs["rotation"], cs["translation"])
                rec = dict(
                    channel=channel,
                    filename=str(Path(data_dir) / sd["filename"]),
                    segmentation_filename=str(
                        Path(data_dir) / "segmentation"
                        / (Path(sd["filename"]).stem + ".npz")),
                    dino_filename=str(
                        Path(data_dir) / "dino_features"
                        / (Path(sd["filename"]).stem + ".npz")),
                    lidar_depth_filename=str(
                        Path(data_dir) / "lidar_depth"
                        / (Path(sd["filename"]).stem + ".npz")),
                    ego2global=ego2global,
                    cam2ego=cam2ego,
                    cam_intrinsic=np.asarray(cs["camera_intrinsic"], np.float64),
                    height=sd["height"],
                    width=sd["width"],
                    timestamp=sd["timestamp"],
                    is_key_frame=sd["is_key_frame"],
                    scene_name=scene["name"],
                )
                sample_data_list.append(rec)
                if process_lidar:
                    _write_lidar_depth(nusc, data_dir, sd, rec, sweep_window_s)
                sd_token = sd["next"]
        with open(out_dir / f"{scene['name']}.pkl", "wb") as f:
            pickle.dump(sample_data_list, f)
        print(f"wrote {scene['name']}: {len(sample_data_list)} sample_datas")


def load_lidar_points(path: str) -> np.ndarray:
    """nuScenes lidar .pcd.bin: flat float32 (x, y, z, intensity, ring)."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, 5)[:, :3]


def _write_lidar_depth(nusc, data_dir, cam_sd, rec, window_s):
    """Accumulate lidar sweeps within +-window_s of the camera timestamp and
    rasterize per-pixel depth (create_nuscenes_infos.py:44-99)."""
    sample = nusc.get("sample", cam_sd["sample_token"])
    lidar_token = sample["data"]["LIDAR_TOP"]
    cam_pose = rec["ego2global"] @ rec["cam2ego"]
    world2cam = np.linalg.inv(cam_pose)

    points_world = []
    sd = nusc.get("sample_data", lidar_token)
    # Walk back/forward collecting sweeps near the camera timestamp.
    tokens = [lidar_token]
    t = sd
    while t["next"]:
        t = nusc.get("sample_data", t["next"])
        if abs(t["timestamp"] - cam_sd["timestamp"]) / 1e6 > window_s:
            break
        tokens.append(t["token"])
    for tok in tokens:
        sd_l = nusc.get("sample_data", tok)
        if abs(sd_l["timestamp"] - cam_sd["timestamp"]) / 1e6 > window_s:
            continue
        pts_l = load_lidar_points(os.path.join(str(data_dir), sd_l["filename"]))
        cs = nusc.get("calibrated_sensor", sd_l["calibrated_sensor_token"])
        ego = nusc.get("ego_pose", sd_l["ego_pose_token"])
        l2e = quat_translation_to_matrix(cs["rotation"], cs["translation"])
        e2g = quat_translation_to_matrix(ego["rotation"], ego["translation"])
        pts = (e2g @ l2e @ np.vstack([pts_l.T, np.ones(len(pts_l))]))[:3].T
        points_world.append(pts)
    if not points_world:
        return
    pts_cam = (world2cam @ np.hstack(
        [np.concatenate(points_world), np.ones((sum(len(p) for p in points_world), 1))]
    ).T)[:3].T
    cols, rows, depths = project_points_to_image(
        pts_cam, rec["cam_intrinsic"], rec["width"], rec["height"]
    )
    depth_map = depth_map_from_points(cols, rows, depths, rec["width"], rec["height"])
    out = Path(rec["lidar_depth_filename"])
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, depth_map)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", type=Path, required=True)
    parser.add_argument("--version", default="v1.0-trainval")
    parser.add_argument("--scenes", nargs="*", default=None)
    parser.add_argument("--process-lidar", action="store_true")
    args = parser.parse_args(argv)
    create_nuscenes_infos(args.data_dir, args.version, args.scenes, args.process_lidar)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
