"""nuScenes multi-scene dataparser.

Reference spec: nerfstudio-0.3.3/nerfstudio/data/PreSight/
mynuscenes_ms_dataparser.py:48-414. Responsibilities:

  * read `{location}_centroids.json` (tile id -> scene names) and the
    per-scene `PreSight/{scene}.pkl` sample_data lists produced by
    create_nuscenes_infos (N16)
  * build camera poses: ego2global @ cam2ego -> rotate to OpenCV frame ->
    OpenCV-camera -> nerfstudio-camera -> rotate to z-up (:106-175)
  * k-means cluster the ego translations into `num_aabbs` sub-fields; AABB
    per cluster from the 5%/95% pose quantiles +-15m xy / -5+15m z (:229-276)
  * normalize poses to zero-mean translation, then scale everything by
    pose_scale_factor (:283-300)
  * linspace train/eval split over snapshots (:306-339)

Output feeds the chunk dataset and the on-device CameraParams table.
k-means is pinned (random_state=0, n_init='auto'-equivalent, max_iter=500)
so tile assignment is deterministic (SURVEY.md §7.3.8).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import pickle
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from .constants import NUSCENES_CAMERAS
from .image_metadata import ImageMetadata

# Rotate the nuScenes world frame so cameras land in an OpenCV-style frame
# (mynuscenes_ms_dataparser.py:106-121).
_TRANSFORM1 = np.array(
    [[0, -1, 0, 0],
     [0, 0, -1, 0],
     [1, 0, 0, 0],
     [0, 0, 0, 1]], dtype=np.float32)
# Rotate back to z-up for the viewer/world (:121-128).
_TRANSFORM2 = np.array(
    [[0, 0, 1, 0],
     [0, 1, 0, 0],
     [-1, 0, 0, 0],
     [0, 0, 0, 1]], dtype=np.float32)


def opencv_to_nerfstudio(pose: np.ndarray) -> np.ndarray:
    """ego/cam pose -> nerfstudio camera pose (:162-172)."""
    pose = _TRANSFORM1 @ pose
    pose = pose.copy()
    pose[0:3, 1:3] *= -1
    pose = pose[np.array([1, 0, 2, 3]), :]
    pose[2, :] *= -1
    pose = _TRANSFORM2 @ pose
    return pose


@dataclasses.dataclass(frozen=True)
class DataParserConfig:
    data_dir: Path = Path("data/nuScenes")
    location: str = "singapore-onenorth"
    centroid_name: str = "0"
    scene_names: Optional[Tuple[str, ...]] = None  # overrides centroid json
    cameras: Tuple[str, ...] = NUSCENES_CAMERAS
    train_split_fraction: float = 1.0
    num_aabbs: int = 1
    image_downscale_factor: float = 1.0
    pose_scale_factor: float = 0.05
    pose_normalize: bool = True
    use_gt_masks: bool = False
    depth_type: str = "none"  # lidar | monodepth | none
    centroids_dir: Optional[Path] = None  # dir holding {location}_centroids.json


@dataclasses.dataclass
class DataparserOutputs:
    items: List[ImageMetadata]  # this split's items
    all_items: List[ImageMetadata]
    pose_scale_factor: float
    pose_transformation: np.ndarray  # (3,) world mean subtracted pre-scale
    centroids: np.ndarray  # (E, 3) scaled
    aabbs: np.ndarray  # (E, 2, 3) scaled
    predicted_labels: Optional[np.ndarray]  # (num_images,) k-means tile per image
    dino_to_rgb: Optional[Dict]
    num_videos: int


def _kmeans_cluster(translations: np.ndarray, num_aabbs: int):
    """Deterministic k-means (:229-245)."""
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=num_aabbs, random_state=0, n_init="auto", max_iter=500)
    km.fit(translations)
    centroids = km.cluster_centers_.astype(np.float32)
    labels = km.predict(translations).astype(np.int64)
    return centroids, labels


def _cluster_aabbs(translations: np.ndarray, centroids: np.ndarray, labels: np.ndarray):
    """Per-cluster AABB from pose quantiles (:252-276)."""
    aabbs = []
    for i in range(centroids.shape[0]):
        p = translations[labels == i]
        # torch.quantile uses linear interpolation, same as np default.
        hi = np.quantile(p, 0.95, axis=0)
        lo = np.quantile(p, 0.05, axis=0)
        aabb = np.array(
            [[lo[0] - 15, lo[1] - 15, lo[2] - 5],
             [hi[0] + 15, hi[1] + 15, hi[2] + 15]], dtype=np.float32)
        aabbs.append(aabb)
    return np.stack(aabbs)


def parse(config: DataParserConfig, split: str = "train") -> DataparserOutputs:
    data_dir = str(config.data_dir)

    if config.scene_names is not None:
        scene_names = list(config.scene_names)
    else:
        cdir = config.centroids_dir or Path(data_dir) / "centroids"
        with open(os.path.join(str(cdir), f"{config.location}_centroids.json")) as f:
            scene_names = json.load(f)[config.centroid_name]

    sample_data_list = []
    for scene_name in scene_names:
        with open(os.path.join(data_dir, "PreSight", f"{scene_name}.pkl"), "rb") as f:
            sample_data_list.extend(pickle.load(f))
    sample_data_list.sort(key=lambda x: x["timestamp"])

    dino_to_rgb = None
    for dname in ("dino_features", "dino_features_fp16"):
        p = os.path.join(data_dir, dname, "dino_to_rgb.pkl")
        if os.path.exists(p):
            with open(p, "rb") as f:
                dino_to_rgb = pickle.load(f)
            break

    cameras = [c if c.startswith("CAM_") else "CAM_" + c for c in config.cameras]

    all_items: List[ImageMetadata] = []
    for i, sd in enumerate(sample_data_list):
        if sd["channel"] not in cameras:
            continue
        pose = np.asarray(sd["ego2global"], np.float32) @ np.asarray(sd["cam2ego"], np.float32)
        pose = opencv_to_nerfstudio(pose)

        depth_fpath = sd.get("lidar_depth_filename", None)
        if config.depth_type == "monodepth" and depth_fpath is not None:
            depth_fpath = depth_fpath.replace("lidar_depth", "monodepth")

        H = int(sd["height"] * config.image_downscale_factor)
        W = int(sd["width"] * config.image_downscale_factor)
        scale = np.array(
            [[W / sd["width"], 0, 0], [0, H / sd["height"], 0], [0, 0, 1]], np.float32
        )
        intrinsic = scale @ np.asarray(sd["cam_intrinsic"], np.float32)

        all_items.append(ImageMetadata(
            image_path=sd["filename"],
            c2w=pose,
            W=W,
            H=H,
            intrinsics=intrinsic,
            image_index=len(all_items),
            time=sd["timestamp"],
            video_id=scene_names.index(sd["scene_name"]),
            is_key_frame=bool(sd.get("is_key_frame", False)),
            mask_path=sd.get("mask_filename") if config.use_gt_masks else None,
            seg_path=sd.get("segmentation_filename"),
            depth_path=depth_fpath if config.depth_type != "none" else None,
            feature_path=sd.get("dino_filename"),
        ))

    poses = np.stack([it.c2w for it in all_items])  # (N, 4, 4)
    translations = poses[:, :3, 3]

    if split == "train":
        centroids, labels = _kmeans_cluster(translations, config.num_aabbs)
        aabbs = _cluster_aabbs(translations, centroids, labels)
    else:
        centroids = np.zeros((config.num_aabbs, 3), np.float32)
        aabbs = np.zeros((config.num_aabbs, 2, 3), np.float32)
        labels = None

    if config.pose_normalize:
        mean = translations.mean(axis=0)
    else:
        mean = np.zeros(3, np.float32)
    psf = config.pose_scale_factor
    poses[:, :3, 3] = (poses[:, :3, 3] - mean) * psf
    aabbs = (aabbs - mean) * psf
    centroids = (centroids - mean) * psf
    for i, it in enumerate(all_items):
        it.c2w = poses[i]

    # Linspace train/eval split over snapshots (:306-339).
    n = len(all_items)
    n_train = math.ceil(n * config.train_split_fraction)
    i_train = np.linspace(0, n - 1, n_train, dtype=int)
    i_eval = np.setdiff1d(np.arange(n), i_train)
    eval_set = set(i_eval.tolist())

    train_count, val_count = 0, 0
    for i, it in enumerate(all_items):
        if i in eval_set:
            it.is_val = True
            it.image_index = val_count
            val_count += 1
        else:
            it.is_val = False
            it.image_index = train_count
            train_count += 1

    if split == "train":
        idx = i_train
    elif split in ("val", "test"):
        idx = i_eval
    else:
        idx = np.arange(n)
    items = [all_items[i] for i in idx]

    return DataparserOutputs(
        items=items,
        all_items=all_items,
        pose_scale_factor=psf,
        pose_transformation=mean.astype(np.float32),
        centroids=centroids.astype(np.float32),
        aabbs=aabbs.astype(np.float32),
        predicted_labels=labels,
        dino_to_rgb=dino_to_rgb,
        num_videos=len(scene_names),
    )


def make_camera_params(items: List[ImageMetadata]):
    """Build the on-device camera table from this split's items."""
    import jax.numpy as jnp

    from .cameras import CameraParams

    c2w = np.stack([it.c2w[:3, :4] for it in items]).astype(np.float32)
    fx = np.array([it.intrinsics[0, 0] for it in items], np.float32)
    fy = np.array([it.intrinsics[1, 1] for it in items], np.float32)
    cx = np.array([it.intrinsics[0, 2] for it in items], np.float32)
    cy = np.array([it.intrinsics[1, 2] for it in items], np.float32)
    vid = np.array([it.video_id for it in items], np.int32)
    return CameraParams(
        c2w=jnp.asarray(c2w), fx=jnp.asarray(fx), fy=jnp.asarray(fy),
        cx=jnp.asarray(cx), cy=jnp.asarray(cy), video_ids=jnp.asarray(vid),
    )


def visualize_kmeans(outputs: DataparserOutputs, out_path: Path,
                     map_ax=None) -> Path:
    """Tile-assignment diagnostic plot (mynuscenes_ms_dataparser.py:375-414):
    per-video ego tracks colored per scene, red 'x' centroids, red AABB
    rectangles, nerfstudio->nuScenes coordinate flip (negated x/y). The
    reference draws over the nuScenes drivable-area map; pass a prepared
    ``map_ax`` for that (the devkit is optional here), otherwise a plain
    axes is used.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if map_ax is None:
        _fig, ax = plt.subplots(figsize=(10, 10))
    else:
        ax = map_ax
    rng = np.random.default_rng(0)

    track: List[List[float]] = []
    items = outputs.items
    for i, item in enumerate(items):
        track.append(list(item.c2w[:3, 3]))
        if i == len(items) - 1 or items[i + 1].video_id != item.video_id:
            p = np.asarray(track)[:, :2]
            ax.plot(-p[:, 0], -p[:, 1], "o-", color=list(rng.random(3)),
                    alpha=0.3, linewidth=2, markersize=2)
            track = []

    c = np.asarray(outputs.centroids)
    ax.plot(-c[:, 0], -c[:, 1], "x", color="r", markersize=8)
    for aabb in np.asarray(outputs.aabbs):
        xs = [aabb[0][0], aabb[1][0], aabb[1][0], aabb[0][0], aabb[0][0]]
        ys = [aabb[0][1], aabb[0][1], aabb[1][1], aabb[1][1], aabb[0][1]]
        ax.plot([-x for x in xs], [-y for y in ys], "-", color="r", linewidth=1)
    ax.set_aspect("equal")
    ax.grid(True, which="both")
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(out_path, dpi=150)
    plt.close("all")
    return out_path
