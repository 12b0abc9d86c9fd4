"""Stage-3 infos -> training batches: the host-side data pipeline that
feeds ``train_occ`` from priorsplit infos pickles.

Reference spec (all host-side numpy here; nothing in this module touches
the device):
  * occupancy/mmdet3d/datasets/nuscenes_dataset.py:176-310 — infos loading
    (sorted by timestamp, load_interval), per-sample input dict, the
    adjacent-frame queue (get_adj_info: same-scene previous samples, the
    stereo extra frame), and the prior crop hook.
  * occupancy/mmdet3d/datasets/pipelines/loading.py:866-1283 —
    PrepareImageInputs (ida augs: resize/crop/flip/rotate with the exact
    post_rot/post_tran homography composition :896-917; adjacent frames
    REUSE the key frame's aug :1117-1133), mmlabNormalize :855-862 (note:
    the executed reference opens images with PIL (RGB) and then calls
    mmcv's imnormalize with to_rgb=True, which channel-reverses — the
    reversal is mirrored verbatim, not "fixed"), LoadOccGTFromFile :18-40,
    BEVAug :1184-1283 (bda matrix + voxel-label flips).
  * occupancy/mmdet3d/models/detectors/bevdet.py:80-98, 433-470 — the
    sweep-sensor -> key-ego alignment and the stereo curr->adjacent-sensor
    transform; done HERE (numpy float64) because our jitted model takes
    the aligned matrices directly.
  * prior crop + voxelization: prior/consume.py (CityPriors /
    VoxelizePriorPoints), already parity-tested against the reference's
    executed city_prior.py.
"""

from __future__ import annotations

import dataclasses
import pickle
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

CAM_CHANNELS = (
    "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
    "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT",
)

_IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


@dataclasses.dataclass(frozen=True)
class IdaAugConfig:
    """data_config of the occ configs
    (bevdet-occ-r50d-8x4-24e_wcamprior_randomdrop.py:36-55)."""

    cams: Tuple[str, ...] = CAM_CHANNELS
    n_cams: int = 6
    input_size: Tuple[int, int] = (256, 704)  # (fH, fW)
    resize: Tuple[float, float] = (-0.06, 0.11)
    crop_h: Tuple[float, float] = (0.0, 0.0)
    flip: bool = True
    rot: Tuple[float, float] = (-5.4, 5.4)
    resize_test: float = 0.0


@dataclasses.dataclass(frozen=True)
class BdaAugConfig:
    """bda_aug_conf (config :57-62)."""

    rot_lim: Tuple[float, float] = (-0.0, 0.0)
    scale_lim: Tuple[float, float] = (1.0, 1.0)
    flip_dx_ratio: float = 0.5
    flip_dy_ratio: float = 0.5


def quat_to_mat4(rotation: Sequence[float], translation: Sequence[float]) -> np.ndarray:
    """(w, x, y, z) quaternion + translation -> 4x4 float64 transform
    (loading.py:987-1008 get_sensor_transforms)."""
    from ..prior.consume import _quat_to_rotmat

    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = _quat_to_rotmat(rotation)
    m[:3, 3] = np.asarray(translation, np.float64)
    return m


def load_infos(path: Path, load_interval: int = 1) -> List[Dict]:
    """nuscenes_dataset.py:226-240 load_annotations."""
    with open(path, "rb") as f:
        data = pickle.load(f)
    infos = sorted(data["infos"], key=lambda e: e["timestamp"])
    return infos[::load_interval]


def sample_ida(rng: np.random.RandomState, H: int, W: int,
               cfg: IdaAugConfig, is_train: bool):
    """loading.py:950-986 sample_augmentation (the non-random_crop_height
    branch the shipped configs use)."""
    fH, fW = cfg.input_size
    if is_train:
        resize = float(fW) / float(W)
        resize += rng.uniform(*cfg.resize)
        resize_dims = (int(W * resize), int(H * resize))
        newW, newH = resize_dims
        crop_h = int((1 - rng.uniform(*cfg.crop_h)) * newH) - fH
        crop_w = int(rng.uniform(0, max(0, newW - fW)))
        crop = (crop_w, crop_h, crop_w + fW, crop_h + fH)
        flip = bool(cfg.flip and rng.choice([0, 1]))
        rotate = rng.uniform(*cfg.rot)
    else:
        resize = float(fW) / float(W) + cfg.resize_test
        resize_dims = (int(W * resize), int(H * resize))
        newW, newH = resize_dims
        crop_h = int((1 - np.mean(cfg.crop_h)) * newH) - fH
        crop_w = int(max(0, newW - fW) / 2)
        crop = (crop_w, crop_h, crop_w + fW, crop_h + fH)
        flip = False
        rotate = 0.0
    return resize, resize_dims, crop, flip, rotate


def _rot2(deg: float) -> np.ndarray:
    h = deg / 180.0 * np.pi
    return np.array([[np.cos(h), np.sin(h)], [-np.sin(h), np.cos(h)]],
                    np.float64)


def img_transform(img, resize, resize_dims, crop, flip, rotate,
                  post_rot=None, post_tran=None):
    """loading.py:896-937 (PIL branch): apply the pixel transform AND
    compose the post-homography. Returns (PIL image, post_rot 2x2,
    post_tran 2)."""
    img = img.resize(resize_dims)
    img = img.crop(crop)
    if flip:
        from PIL import Image

        img = img.transpose(method=Image.FLIP_LEFT_RIGHT)
    img = img.rotate(rotate)

    post_rot = np.eye(2) if post_rot is None else np.asarray(post_rot, np.float64)
    post_tran = np.zeros(2) if post_tran is None else np.asarray(post_tran, np.float64)
    post_rot = post_rot * resize
    post_tran = post_tran - np.asarray(crop[:2], np.float64)
    if flip:
        A = np.array([[-1.0, 0.0], [0.0, 1.0]])
        b = np.array([crop[2] - crop[0], 0.0])
        post_rot = A @ post_rot
        post_tran = A @ post_tran + b
    A = _rot2(rotate)
    b = np.array([crop[2] - crop[0], crop[3] - crop[1]], np.float64) / 2.0
    b = A @ (-b) + b
    post_rot = A @ post_rot
    post_tran = A @ post_tran + b
    return img, post_rot, post_tran


def normalize_img(img) -> np.ndarray:
    """loading.py:855-862 executed behavior: channel reversal (mmcv
    to_rgb=True applied to a PIL-RGB array) then ImageNet mean/std;
    (H, W, 3) -> (3, H, W) float32."""
    a = np.asarray(img, np.float32)[..., ::-1]
    a = (a - _IMAGENET_MEAN) / _IMAGENET_STD
    return np.ascontiguousarray(a.transpose(2, 0, 1))


def load_occ_gt(occ_path: str):
    """LoadOccGTFromFile (loading.py:18-40): labels.npz with semantics +
    lidar/camera visibility masks."""
    import os

    z = np.load(os.path.join(occ_path, "labels.npz"))
    return (z["semantics"], z["mask_lidar"].astype(bool),
            z["mask_camera"].astype(bool))


def sample_bda(rng: np.random.RandomState, cfg: BdaAugConfig, is_train: bool):
    """loading.py:1191-1206."""
    if is_train:
        rotate = rng.uniform(*cfg.rot_lim)
        scale = rng.uniform(*cfg.scale_lim)
        flip_dx = rng.uniform() < cfg.flip_dx_ratio
        flip_dy = rng.uniform() < cfg.flip_dy_ratio
    else:
        rotate, scale, flip_dx, flip_dy = 0.0, 1.0, False, False
    return rotate, scale, flip_dx, flip_dy


def bda_matrix(rotate: float, scale: float, flip_dx: bool, flip_dy: bool) -> np.ndarray:
    """loading.py:1208-1239 bev_transform's rot_mat as a 4x4 (the shipped
    configs train without bda translation, tran_lim = [0,0,0])."""
    ang = rotate / 180.0 * np.pi
    rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float64)
    sc = np.eye(3) * scale
    flip = np.eye(3)
    if flip_dx:
        flip = flip @ np.diag([-1.0, 1.0, 1.0])
    if flip_dy:
        flip = flip @ np.diag([1.0, -1.0, 1.0])
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = flip @ (sc @ rot)
    return m


class Stage3OccDataset:
    """Infos -> BEVDetOcc training samples (NuscDatasetOccpancy analog,
    nuscenes_dataset.py:176-310 + the loading pipeline above).

    ``temporal``: also load the adjacent frame (same ida augs, reference
    loading.py:1117-1133) and emit the aligned geometry the 4D/stereo
    chain consumes (prev_imgs, prev_sensor2ego, k2s_sensor, prev2curr).
    """

    def __init__(self, infos, ida: IdaAugConfig = IdaAugConfig(),
                 bda: BdaAugConfig = BdaAugConfig(), is_train: bool = True,
                 temporal: bool = False,
                 multi_adj_frame_id_cfg: Tuple[int, int, int] = (1, 2, 1),
                 priors=None, voxelizer=None,
                 prior_random_drop: Optional[bool] = None):
        self.infos = (load_infos(infos) if isinstance(infos, (str, Path))
                      else list(infos))
        self.ida = ida
        self.bda = bda
        self.is_train = is_train
        self.temporal = temporal
        self.multi_adj_frame_id_cfg = multi_adj_frame_id_cfg
        self.priors = priors
        self.voxelizer = voxelizer

    def __len__(self) -> int:
        return len(self.infos)

    def get_adj_info(self, index: int) -> List[Dict]:
        """nuscenes_dataset.py:296-310 (non-stereo id list; the stereo
        extra frame shares index spacing 1 in the shipped config)."""
        info = self.infos[index]
        adj = []
        for select_id in range(*self.multi_adj_frame_id_cfg):
            sel = max(index - select_id, 0)
            if self.infos[sel]["scene_token"] != info["scene_token"]:
                adj.append(info)
            else:
                adj.append(self.infos[sel])
        return adj

    def _cam_entry(self, info: Dict, cam: str) -> Dict:
        return info["cams"][cam]

    def sample(self, index: int, rng: np.random.RandomState) -> Dict[str, np.ndarray]:
        from PIL import Image

        info = self.infos[index]
        cams = self.ida.cams[: self.ida.n_cams]
        imgs, s2es, e2gs, intrins, prots, ptrans = [], [], [], [], [], []
        adj = self.get_adj_info(index) if self.temporal else []
        adj_imgs = [[] for _ in adj]
        adj_s2es, adj_e2gs = [[] for _ in adj], [[] for _ in adj]

        for cam in cams:
            entry = self._cam_entry(info, cam)
            img = Image.open(entry["data_path"])
            ida = sample_ida(rng, img.height, img.width, self.ida,
                             self.is_train)
            resize, resize_dims, crop, flip, rotate = ida
            img_t, post_rot2, post_tran2 = img_transform(
                img, resize, resize_dims, crop, flip, rotate)
            post_rot = np.eye(3)
            post_tran = np.zeros(3)
            post_rot[:2, :2] = post_rot2
            post_tran[:2] = post_tran2

            imgs.append(normalize_img(img_t))
            intrins.append(np.asarray(entry["cam_intrinsic"], np.float64))
            prots.append(post_rot)
            ptrans.append(post_tran)
            s2es.append(quat_to_mat4(entry["sensor2ego_rotation"],
                                     entry["sensor2ego_translation"]))
            e2gs.append(quat_to_mat4(entry["ego2global_rotation"],
                                     entry["ego2global_translation"]))

            # Adjacent frames reuse the key frame's ida transform
            # (loading.py:1117-1133).
            for j, ainfo in enumerate(adj):
                aentry = self._cam_entry(ainfo, cam)
                aimg = Image.open(aentry["data_path"])
                aimg_t, _, _ = img_transform(aimg, resize, resize_dims, crop,
                                             flip, rotate)
                adj_imgs[j].append(normalize_img(aimg_t))
                adj_s2es[j].append(quat_to_mat4(
                    aentry["sensor2ego_rotation"],
                    aentry["sensor2ego_translation"]))
                adj_e2gs[j].append(quat_to_mat4(
                    aentry["ego2global_rotation"],
                    aentry["ego2global_translation"]))

        rotate_bda, scale_bda, flip_dx, flip_dy = sample_bda(
            rng, self.bda, self.is_train)
        bda = bda_matrix(rotate_bda, scale_bda, flip_dx, flip_dy)

        s2e = np.stack(s2es)          # (N, 4, 4) sweep sensor -> sweep ego
        e2g = np.stack(e2gs)
        # Key-ego alignment (bevdet.py:90-95): all geometry the view
        # transformer consumes is sensor -> KEY ego.
        keyego2global = e2g[0]
        global2keyego = np.linalg.inv(keyego2global)
        sensor2keyego = global2keyego[None] @ e2g @ s2e

        out = {
            "imgs": np.stack(imgs).astype(np.float32),
            "sensor2ego": sensor2keyego.astype(np.float32),
            "cam2imgs": np.stack(intrins).astype(np.float32),
            "post_rots": np.stack(prots).astype(np.float32),
            "post_trans": np.stack(ptrans).astype(np.float32),
            "bda": bda.astype(np.float32),
        }

        if "occ_path" in info:
            try:
                sem, mask_lidar, mask_camera = load_occ_gt(info["occ_path"])
                # BEVAug voxel-label flips (loading.py:1268-1276).
                if flip_dx:
                    sem, mask_lidar, mask_camera = (
                        sem[::-1].copy(), mask_lidar[::-1].copy(),
                        mask_camera[::-1].copy())
                if flip_dy:
                    sem, mask_lidar, mask_camera = (
                        sem[:, ::-1].copy(), mask_lidar[:, ::-1].copy(),
                        mask_camera[:, ::-1].copy())
                out["voxel_semantics"] = sem
                out["mask_camera"] = mask_camera
            except FileNotFoundError:
                pass

        if self.temporal and adj:
            a_s2e = np.stack(adj_s2es[0])
            a_e2g = np.stack(adj_e2gs[0])
            out["prev_imgs"] = np.stack(adj_imgs[0]).astype(np.float32)
            out["prev_sensor2ego"] = (
                global2keyego[None] @ a_e2g @ a_s2e).astype(np.float32)
            # Stereo curr -> adjacent-sensor transform (bevdet.py:453-466).
            out["k2s_sensor"] = (
                np.linalg.inv(a_e2g @ a_s2e) @ e2g @ s2e).astype(np.float32)
            # 2D ego motion for the BEV shift (prev ego -> curr ego in the
            # BEV plane): rotation+translation of keyego <- prev keyego.
            prev2curr4 = global2keyego @ adj_e2gs[0][0]
            p2c = np.eye(3)
            p2c[:2, :2] = prev2curr4[:2, :2]
            p2c[:2, 2] = prev2curr4[:2, 3]
            out["prev2curr"] = p2c.astype(np.float32)

        if self.priors is not None and self.voxelizer is not None:
            location = info.get("map_location", info.get("location"))
            pts = self.priors.get_prior_points(
                location, info["ego2global_translation"],
                info["ego2global_rotation"])
            vox = self.voxelizer(pts, rotate_bda=rotate_bda,
                                 flip_dx=flip_dx, flip_dy=flip_dy,
                                 scale_ratio=scale_bda, rng=rng)
            out["prior_voxels"] = vox["prior_voxels"]
            out["prior_voxels_coords"] = vox["prior_voxels_coords"]
        return out

    def batch(self, indices: Sequence[int], rng: np.random.RandomState,
              pad_prior_to: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Stack samples into the train_occ batch contract; variable-count
        prior voxels pad to a fixed V with a validity mask (the jitted
        model takes (B, V, C) prior_feats + (B, V, 3) coords + (B, V)
        prior_valid)."""
        samples = [self.sample(i, rng) for i in indices]
        out: Dict[str, np.ndarray] = {}
        for k in samples[0]:
            if k in ("prior_voxels", "prior_voxels_coords"):
                continue
            out[k] = np.stack([s[k] for s in samples])
        if "prior_voxels" in samples[0]:
            counts = [len(s["prior_voxels"]) for s in samples]
            V = pad_prior_to or max(max(counts), 1)
            C = samples[0]["prior_voxels"].shape[-1] if counts[0] else (
                self.voxelizer and
                (68 if self.voxelizer.load_features else 5)) or 68
            B = len(samples)
            feats = np.zeros((B, V, C), np.float32)
            coords = np.zeros((B, V, 3), np.int32)
            valid = np.zeros((B, V), bool)
            for b, s in enumerate(samples):
                n = min(len(s["prior_voxels"]), V)
                if n:
                    feats[b, :n] = s["prior_voxels"][:n]
                    coords[b, :n] = s["prior_voxels_coords"][:n]
                    valid[b, :n] = True
            out["prior_feats"] = feats
            out["prior_coords"] = coords
            out["prior_valid"] = valid
        return out


# ---------------------------------------------------------------------------
# Mapping (D7) side: ann samples -> StreamMapNet training clips.
# ---------------------------------------------------------------------------

_MAP_MEAN_BGR = np.array([103.530, 116.280, 123.675], np.float32)


def normalize_img_map(img) -> np.ndarray:
    """online-mapping img_norm_cfg (smn config :14): BGR mean subtraction,
    unit std, to_rgb=False. The reference reads images with mmcv (BGR); a
    PIL-RGB array therefore channel-reverses first. (3, H, W) float32."""
    a = np.asarray(img, np.float32)[..., ::-1] - _MAP_MEAN_BGR
    return np.ascontiguousarray(a.transpose(2, 0, 1))


def interp_fixed_num(line: np.ndarray, sample_num: int) -> np.ndarray:
    """VectorizeMap.interp_fixed_num (vectorize.py:50-64) without shapely:
    arc-length-uniform linear interpolation of a polyline (P_in, 2) to
    exactly ``sample_num`` points."""
    line = np.asarray(line, np.float64)
    seg = np.linalg.norm(np.diff(line, axis=0), axis=-1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1]
    want = np.linspace(0.0, total, sample_num)
    if total == 0:
        return np.repeat(line[:1], sample_num, axis=0)
    return np.stack([np.interp(want, cum, line[:, d]) for d in range(line.shape[1])], -1)


def normalize_line(line: np.ndarray, roi_size) -> np.ndarray:
    """vectorize.py:122-140: shift by roi/2 and squeeze into (0, 1)."""
    origin = -np.array([roi_size[0] / 2.0, roi_size[1] / 2.0])
    out = line.copy()
    out[:, :2] = out[:, :2] - origin
    eps = 1e-5
    out[:, :2] = out[:, :2] / np.array([roi_size[0], roi_size[1]])
    out[:, :2] = np.clip(out[:, :2], eps, 1.0 - eps)
    return out


class Stage3MapDataset:
    """Mapping ann samples -> train_map clips (NuscDataset analog,
    online-mapping/plugin/datasets/nusc_dataset.py:13-120 + the resize/
    normalize/vectorize pipeline).

    The reference extracts map geometry online from the nuScenes map
    expansion (NuscMapExtractor). That geometry layer needs the map JSONs,
    which cannot ship here — so each ann sample carries its polylines
    directly under ``map_geoms`` ({label: [poly (P, 2) arrays in ego
    meters]}), which is exactly NuscMapExtractor's output contract; the
    vectorize step (fixed-num arc-length resample + roi normalization,
    vectorize.py) runs here verbatim.

    Samples: {token, scene_name, location, e2g_translation, e2g_rotation,
    cams: {name: {img_fpath, intrinsics 3x3, extrinsics 4x4 ego2cam}},
    map_geoms}. Consecutive same-scene samples form streaming clips.
    """

    def __init__(self, samples, img_size=(480, 800), roi_size=(100, 50),
                 sample_num: int = 20, max_gt: int = 24,
                 clip_len: int = 2, priors=None, voxelizer=None,
                 is_train: bool = True):
        if isinstance(samples, (str, Path)):
            with open(samples, "rb") as f:
                samples = pickle.load(f)
            if isinstance(samples, dict):
                samples = samples.get("samples", samples.get("infos"))
        self.samples = list(samples)
        self.img_size = tuple(img_size)
        self.roi_size = tuple(roi_size)
        self.sample_num = sample_num
        self.max_gt = max_gt
        self.clip_len = clip_len
        self.priors = priors
        self.voxelizer = voxelizer
        self.is_train = is_train

    def __len__(self) -> int:
        return len(self.samples)

    def clips(self) -> List[List[int]]:
        """Consecutive same-scene index windows (the streaming sampler)."""
        out = []
        for i in range(len(self.samples) - self.clip_len + 1):
            window = self.samples[i : i + self.clip_len]
            if len({s["scene_name"] for s in window}) == 1:
                out.append(list(range(i, i + self.clip_len)))
        return out

    def _frame(self, index: int) -> Dict[str, np.ndarray]:
        from PIL import Image

        s = self.samples[index]
        th, tw = self.img_size
        imgs, ego2imgs = [], []
        for cam in s["cams"].values():
            img = Image.open(cam["img_fpath"])
            sw = tw / img.width
            sh = th / img.height
            img = img.resize((tw, th))
            K = np.asarray(cam["intrinsics"], np.float64)
            ego2cam = np.asarray(cam["extrinsics"], np.float64)
            viewpad = np.eye(4)
            viewpad[:3, :3] = K
            ego2img = viewpad @ ego2cam
            # ResizeMultiViewImages change_intrinsics (transform.py:135-180).
            scale = np.diag([sw, sh, 1.0, 1.0])
            ego2imgs.append(scale @ ego2img)
            imgs.append(normalize_img_map(img))

        # Vectorized GT in ego meters (map_losses normalizes by roi itself:
        # gt/roi + 0.5), fixed-num arc-length resampled, capped at max_gt.
        gt_lines = np.zeros((self.max_gt, self.sample_num, 2), np.float32)
        gt_labels = np.full((self.max_gt,), -1, np.int32)
        half = np.array([self.roi_size[0] / 2.0, self.roi_size[1] / 2.0])
        g = 0
        for label, geoms in sorted(s.get("map_geoms", {}).items()):
            for poly in geoms:
                if g >= self.max_gt:
                    break
                line = interp_fixed_num(np.asarray(poly, np.float64),
                                        self.sample_num)
                gt_lines[g] = np.clip(line[:, :2], -half, half)
                gt_labels[g] = int(label)
                g += 1

        out = {
            "imgs": np.stack(imgs).astype(np.float32),
            "lidar2img": np.stack(ego2imgs).astype(np.float32),
            "gt_lines": gt_lines[:g] if g else np.zeros((0, self.sample_num, 2), np.float32),
            "gt_labels": gt_labels[:g] if g else np.zeros((0,), np.int32),
        }
        if self.priors is not None and self.voxelizer is not None:
            pts = self.priors.get_prior_points(
                s["location"], s["e2g_translation"], s["e2g_rotation"])
            vox = self.voxelizer(pts)
            out["prior_voxels"] = vox["prior_voxels"]
            out["prior_voxels_coords"] = vox["prior_voxels_coords"]
        return out

    def _prev2curr(self, prev_idx: int, curr_idx: int) -> np.ndarray:
        """2D ego motion prev ego -> curr ego for the BEV warp."""
        p, c = self.samples[prev_idx], self.samples[curr_idx]
        p_e2g = quat_to_mat4(p["e2g_rotation"], p["e2g_translation"])
        c_e2g = quat_to_mat4(c["e2g_rotation"], c["e2g_translation"])
        m = np.linalg.inv(c_e2g) @ p_e2g
        out = np.eye(3)
        out[:2, :2] = m[:2, :2]
        out[:2, 2] = m[:2, 3]
        return out

    def clip(self, indices: Sequence[int],
             pad_prior_to: Optional[int] = None) -> List[Dict[str, np.ndarray]]:
        frames = []
        for j, idx in enumerate(indices):
            f = self._frame(idx)
            f["prev2curr"] = (
                self._prev2curr(indices[j - 1], idx) if j else np.eye(3)
            ).astype(np.float32)
            if "prior_voxels" in f:
                V = pad_prior_to or max(len(f["prior_voxels"]), 1)
                C = f["prior_voxels"].shape[-1] if len(f["prior_voxels"]) else 68
                feats = np.zeros((V, C), np.float32)
                coords = np.zeros((V, 3), np.int32)
                valid = np.zeros((V,), bool)
                n = min(len(f["prior_voxels"]), V)
                if n:
                    feats[:n] = f.pop("prior_voxels")[:n]
                    coords[:n] = f.pop("prior_voxels_coords")[:n]
                    valid[:n] = True
                else:
                    f.pop("prior_voxels"), f.pop("prior_voxels_coords")
                f["prior_feats"] = feats
                f["prior_coords"] = coords
                f["prior_valid"] = valid
            frames.append(f)
        return frames
