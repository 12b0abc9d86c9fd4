"""Voxel downsampling — the Open3D `voxel_down_sample_and_trace` replacement.

Reference spec: nerfstudio-0.3.3/nerfstudio/scripts/extract_priors.py:216-245
(Open3D voxel_down_sample_and_trace at voxel_size=0.4, min_bound =
points.min(0) - 1.0) and :178-197 (per-voxel mean color, float64-accumulated
mean feature, hit counts, hit-quantile filter). The reference needs up to
300 GB host RAM for this step (docs/building_priors.md:65); here it is a
sort/segment reduction over integer voxel keys — O(N log N) time, O(N)
memory, identical bucketing (floor((p - min_bound) / voxel_size)) and
identical outputs (per-voxel mean of points / colors / features).

Runs in numpy on the host (the merge is memory-bound, not FLOP-bound) with
optionally device-reduced per-chunk partials; `segment_mean_by_voxel` is the
single primitive either way.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def voxel_keys(points: np.ndarray, voxel_size: float, min_bound: np.ndarray) -> np.ndarray:
    """Open3D bucketing: int voxel coords -> flat int64 key."""
    ijk = np.floor((points - min_bound) / voxel_size).astype(np.int64)
    # Flat key with generous per-axis range (city tiles are km-scale; 2^21
    # voxels/axis at 0.4 m = 838 km).
    return (ijk[:, 0] << 42) | (ijk[:, 1] << 21) | ijk[:, 2]


def voxel_downsample(
    points: np.ndarray,
    voxel_size: float,
    colors: Optional[np.ndarray] = None,
    features: Optional[np.ndarray] = None,
    min_bound: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Group points into voxels; per-voxel means + hit counts.

    Returns dict with 'points' (V,3) f64 means, 'hits' (V,) int64, and when
    provided 'colors' (V,3) means and 'features' (V,D) float64-accumulated
    means cast to float16 (matching extract_priors.py:178-190 semantics).
    """
    if len(points) == 0:
        out = {
            "points": np.zeros((0, 3), np.float64),
            "hits": np.zeros((0,), np.int64),
            "keys": np.zeros((0,), np.int64),
        }
        if colors is not None:
            out["colors"] = np.zeros((0, colors.shape[-1]), np.float64)
        if features is not None:
            out["features"] = np.zeros((0, features.shape[-1]), np.float16)
        return out
    if min_bound is None:
        min_bound = points.min(axis=0) - 1.0
    keys = voxel_keys(points, voxel_size, min_bound)
    order = np.argsort(keys, kind="stable")
    keys_sorted = keys[order]
    uniq_keys, start, counts = np.unique(
        keys_sorted, return_index=True, return_counts=True
    )
    seg_ids = np.repeat(np.arange(len(uniq_keys)), counts)

    def seg_mean(values: np.ndarray, dtype=np.float64) -> np.ndarray:
        acc = np.zeros((len(uniq_keys), values.shape[-1]), dtype)
        np.add.at(acc, seg_ids, values[order].astype(dtype))
        return acc / counts[:, None]

    out = {
        "points": seg_mean(points),
        "hits": counts.astype(np.int64),
        "keys": uniq_keys,
    }
    if colors is not None:
        out["colors"] = seg_mean(colors)
    if features is not None:
        # Reference accumulates features in float64 then casts to f16
        # (extract_priors.py:183).
        out["features"] = seg_mean(features).astype(np.float16)
    return out


def hit_quantile_filter(
    voxels: Dict[str, np.ndarray], hit_thr_ratio: float = 0.2
) -> Dict[str, np.ndarray]:
    """Keep voxels with hits > quantile(hits, ratio)
    (extract_priors.py:191-197)."""
    hits = voxels["hits"]
    if len(hits) == 0:
        return voxels
    thr = np.quantile(hits, hit_thr_ratio)
    sel = hits > thr
    return {k: v[sel] for k, v in voxels.items()}
