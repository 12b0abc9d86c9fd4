"""Per-image record with lazy numpy loaders.

Reference spec: nerfstudio-0.3.3/nerfstudio/data/PreSight/image_metadata.py:
23-169. Loads are host-side numpy (the TPU never sees whole images during
training — pixels are subsampled on the host and shipped as flat batches):

  * RGB jpg, LANCZOS resize to (W, H), float32 in [0, 1]
  * dynamic-object mask (optional png; plus the hard-coded ego-truck mask on
    CAM_BACK's bottom 1/9)
  * per-pixel depth npz (nearest-exact resize), -1 where absent
  * segmentation class-map npz uint8
  * DINO feature npz (H, W, 64) float16 -> float32
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np


def _nearest_resize(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """nearest-exact resize matching F.interpolate(mode='nearest-exact'):
    sample at (i + 0.5) * scale - 0.5 rounded to nearest."""
    if arr.shape[0] == h and arr.shape[1] == w:
        return arr
    rows = np.clip(np.round((np.arange(h) + 0.5) * arr.shape[0] / h - 0.5), 0,
                   arr.shape[0] - 1).astype(np.int64)
    cols = np.clip(np.round((np.arange(w) + 0.5) * arr.shape[1] / w - 0.5), 0,
                   arr.shape[1] - 1).astype(np.int64)
    return arr[rows][:, cols]


def _is_back_cam(path: str) -> bool:
    return "CAM_BACK" in path and "CAM_BACK_RIGHT" not in path and "CAM_BACK_LEFT" not in path


@dataclasses.dataclass
class ImageMetadata:
    image_path: str
    c2w: np.ndarray  # (4, 4) or (3, 4), nerfstudio convention, scaled poses
    W: int
    H: int
    intrinsics: np.ndarray  # (3, 3)
    image_index: int
    time: int
    video_id: int
    is_val: bool = False
    is_key_frame: bool = False
    depth_path: Optional[str] = None
    mask_path: Optional[str] = None
    seg_path: Optional[str] = None
    feature_path: Optional[str] = None

    def load_image(self) -> np.ndarray:
        from PIL import Image

        img = Image.open(self.image_path).convert("RGB")
        if img.size != (self.W, self.H):
            img = img.resize((self.W, self.H), Image.LANCZOS)
        return np.asarray(img, dtype=np.float32) / 255.0

    def load_mask(self) -> np.ndarray:
        """True = valid pixel. Includes the ego-truck mask for CAM_BACK
        (image_metadata.py:63-94)."""
        if self.mask_path is None:
            mask = np.ones((self.H, self.W), dtype=bool)
        else:
            from PIL import Image

            m = np.asarray(Image.open(self.mask_path))
            m = _nearest_resize(m.astype(np.uint8), self.H, self.W)
            mask = m > 0
        if _is_back_cam(self.image_path):
            truck_height = int(self.H / 9)
            mask[-truck_height:] = False
        return mask

    def load_depth(self) -> np.ndarray:
        if self.depth_path is None:
            return -np.ones((self.H, self.W), dtype=np.float32)
        d = np.load(self.depth_path)
        if isinstance(d, np.lib.npyio.NpzFile):
            d = d["arr_0"]
        return _nearest_resize(np.asarray(d, np.float32), self.H, self.W)

    def load_segmentation(self) -> np.ndarray:
        if self.seg_path is None:
            return np.zeros((self.H, self.W), dtype=np.uint8)
        s = np.load(self.seg_path)
        if isinstance(s, np.lib.npyio.NpzFile):
            s = s["arr_0"]
        return _nearest_resize(np.asarray(s, np.uint8), self.H, self.W)

    def load_features(self) -> np.ndarray:
        if self.feature_path is None:
            return np.zeros((self.H, self.W, 0), dtype=np.float32)
        f = np.load(self.feature_path)
        if isinstance(f, np.lib.npyio.NpzFile):
            f = f["arr_0"]
        f = np.asarray(f, np.float32)
        if f.shape[0] != self.H or f.shape[1] != self.W:
            rows = np.clip(np.round((np.arange(self.H) + 0.5) * f.shape[0] / self.H - 0.5),
                           0, f.shape[0] - 1).astype(np.int64)
            cols = np.clip(np.round((np.arange(self.W) + 0.5) * f.shape[1] / self.W - 0.5),
                           0, f.shape[1] - 1).astype(np.int64)
            f = f[rows][:, cols]
        return f
