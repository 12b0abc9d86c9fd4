"""ctypes bindings for the native voxelization kernels (voxelize.cpp).

Builds libvoxelize.so on first import if missing (g++ available in the
image); every entry point has a pure-numpy fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libvoxelize.so"
_SRC_PATH = _DIR / "voxelize.cpp"

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(_SRC_PATH), "-o", str(_LIB_PATH)],
                check=True, capture_output=True,
            )
        except Exception:  # noqa: BLE001 - no toolchain: fall back to numpy
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    lib.voxel_accum_create.restype = ctypes.c_void_p
    lib.voxel_accum_create.argtypes = [ctypes.c_int64, ctypes.c_int]
    lib.voxel_accum_destroy.argtypes = [ctypes.c_void_p]
    lib.voxel_accum_add.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_double, ctypes.c_void_p,
    ]
    lib.voxel_accum_size.restype = ctypes.c_int64
    lib.voxel_accum_size.argtypes = [ctypes.c_void_p]
    lib.voxel_accum_finalize.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 5
    lib.points_to_voxel_first_come.restype = ctypes.c_int64
    lib.points_to_voxel_first_come.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: Optional[np.ndarray]):
    return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None


class VoxelAccumulator:
    """Streaming voxel mean-downsample (C6 replacement). Feed per-frame
    point batches; finalize returns key-sorted per-voxel means + hits,
    matching prior/voxelize.voxel_downsample exactly."""

    def __init__(self, voxel_size: float, min_bound: np.ndarray,
                 feature_dim: int = 0, with_colors: bool = True):
        lib = _load()
        if lib is None:
            raise RuntimeError("native voxelize library unavailable")
        self._lib = lib
        self._handle = lib.voxel_accum_create(feature_dim, 1 if with_colors else 0)
        self.voxel_size = float(voxel_size)
        self.min_bound = np.ascontiguousarray(min_bound, np.float64)
        self.feature_dim = feature_dim
        self.with_colors = with_colors

    def add(self, points: np.ndarray, colors: Optional[np.ndarray] = None,
            features: Optional[np.ndarray] = None) -> None:
        points = np.ascontiguousarray(points, np.float64)
        colors_c = np.ascontiguousarray(colors, np.float32) if colors is not None else None
        feats_c = np.ascontiguousarray(features, np.float32) if features is not None else None
        self._lib.voxel_accum_add(
            self._handle, _ptr(points), _ptr(colors_c), _ptr(feats_c),
            len(points), self.voxel_size, _ptr(self.min_bound),
        )

    def finalize(self) -> Dict[str, np.ndarray]:
        v = self._lib.voxel_accum_size(self._handle)
        points = np.empty((v, 3), np.float64)
        hits = np.empty((v,), np.int64)
        keys = np.empty((v,), np.int64)
        colors = np.empty((v, 3), np.float32) if self.with_colors else None
        feats = np.empty((v, self.feature_dim), np.float32) if self.feature_dim else None
        self._lib.voxel_accum_finalize(
            self._handle, _ptr(points), _ptr(colors), _ptr(feats), _ptr(hits), _ptr(keys),
        )
        out = {"points": points, "hits": hits, "keys": keys}
        if colors is not None:
            out["colors"] = colors
        if feats is not None:
            out["features"] = feats.astype(np.float16)
        return out

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.voxel_accum_destroy(self._handle)
            self._handle = None


def points_to_voxel(
    points: np.ndarray,
    voxel_size,
    coors_range,
    max_points: int = 16,
    max_voxels: int = 100_000,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """First-come voxelization (C5 / prior_points.py:232-298 semantics).

    Returns (voxels (V, max_points, ndim), coors (V, 3) zyx, counts (V,)).
    """
    points = np.ascontiguousarray(points, np.float32)
    n, ndim = points.shape
    vs = np.ascontiguousarray(voxel_size, np.float32)
    cr = np.ascontiguousarray(coors_range, np.float32)
    lib = _load()
    if lib is not None:
        voxels = np.zeros((max_voxels, max_points, ndim), np.float32)
        coors = np.zeros((max_voxels, 3), np.int32)
        counts = np.zeros((max_voxels,), np.int32)
        v = lib.points_to_voxel_first_come(
            _ptr(points), n, ndim, _ptr(vs), _ptr(cr), max_points, max_voxels,
            _ptr(voxels), _ptr(coors), _ptr(counts),
        )
        return voxels[:v], coors[:v], counts[:v]
    return _points_to_voxel_numpy(points, vs, cr, max_points, max_voxels)


def _points_to_voxel_numpy(points, voxel_size, coors_range, max_points, max_voxels):
    """Pure-numpy fallback with identical first-come semantics."""
    grid = np.round((coors_range[3:] - coors_range[:3]) / voxel_size).astype(np.int32)
    c = np.floor((points[:, :3] - coors_range[:3]) / voxel_size).astype(np.int32)
    ok = ((c >= 0) & (c < grid)).all(axis=1)
    voxels = np.zeros((max_voxels, max_points, points.shape[1]), np.float32)
    coors = np.zeros((max_voxels, 3), np.int32)
    counts = np.zeros((max_voxels,), np.int32)
    key_to_vid = {}
    v = 0
    for i in np.nonzero(ok)[0]:
        key = (int(c[i, 2]), int(c[i, 1]), int(c[i, 0]))
        vid = key_to_vid.get(key)
        if vid is None:
            if v >= max_voxels:
                continue
            vid = v
            key_to_vid[key] = vid
            coors[vid] = key
            v += 1
        if counts[vid] < max_points:
            voxels[vid, counts[vid]] = points[i]
            counts[vid] += 1
    return voxels[:v], coors[:v], counts[:v]
