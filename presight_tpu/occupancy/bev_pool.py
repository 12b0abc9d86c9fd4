"""bev_pool_v2: lift-splat pillar pooling, TPU-native.

Reference spec: occupancy/mmdet3d/ops/bev_pool_v2/src/bev_pool_cuda.cu:21-140
and the rank preparation in
occupancy/mmdet3d/models/necks/view_transformer.py:229-288 — every frustum
point contributes depth_prob * image_feature into its BEV voxel; the CUDA
kernel sums per-voxel intervals of rank-sorted points with a custom
forward/backward.

TPU design: the reference's dynamic machinery (filter in-bounds points,
argsort by voxel rank, unique-interval segmentation, custom grads) exists
because CUDA atomics over intervals need it. On TPU the same contraction is
one static-shape jnp.segment_sum over ALL frustum points with out-of-range
points routed to a dump row: XLA differentiates it exactly (the transpose of
segment_sum is a gather), no sorting, no dynamic shapes. The depth x feature
outer product stays unmaterialized per (D, C) tile inside the fused scatter
computation where XLA can manage it.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bev_pool_v2(
    depth: jnp.ndarray,  # (B, N, D, H, W) depth distribution (softmaxed)
    feat: jnp.ndarray,  # (B, N, H, W, C) image features
    coor: jnp.ndarray,  # (B, N, D, H, W, 3) frustum points, lidar/ego coords
    grid_lower_bound: Sequence[float],
    grid_interval: Sequence[float],
    grid_size: Tuple[int, int, int],  # (X, Y, Z) voxel counts
) -> jnp.ndarray:
    """Pool depth-weighted image features into the BEV voxel grid.

    Returns (B, C, Z, Y, X) — the reference wrapper's layout
    (bev_pool.py's bev_feat.permute before collapse).
    """
    B, N, D, H, W = depth.shape
    C = feat.shape[-1]
    gx, gy, gz = int(grid_size[0]), int(grid_size[1]), int(grid_size[2])

    lb = jnp.asarray(grid_lower_bound, depth.dtype)
    iv = jnp.asarray(grid_interval, depth.dtype)
    vox = jnp.floor((coor - lb) / iv).astype(jnp.int32)  # (B,N,D,H,W,3)
    inb = (
        (vox[..., 0] >= 0) & (vox[..., 0] < gx)
        & (vox[..., 1] >= 0) & (vox[..., 1] < gy)
        & (vox[..., 2] >= 0) & (vox[..., 2] < gz)
    )
    batch_idx = jnp.arange(B, dtype=jnp.int32).reshape(B, 1, 1, 1, 1)
    # Flat rank in (b, z, y, x) order (view_transformer.py:269-272).
    rank = (
        (batch_idx * gz + vox[..., 2]) * gy + vox[..., 1]
    ) * gx + vox[..., 0]
    num_cells = B * gz * gy * gx
    rank = jnp.where(inb, rank, num_cells)  # dump row for out-of-range

    # weighted[b,n,d,h,w,c] = depth * feat (broadcast over d / c).
    weighted = depth[..., None] * feat[:, :, None]  # (B,N,D,H,W,C)
    out = jax.ops.segment_sum(
        weighted.reshape(-1, C), rank.reshape(-1), num_segments=num_cells + 1
    )
    bev = out[:-1].reshape(B, gz, gy, gx, C)
    return jnp.transpose(bev, (0, 4, 1, 2, 3))  # (B, C, Z, Y, X)


def bev_pool_v2_reference(depth, feat, coor, grid_lower_bound, grid_interval,
                          grid_size) -> np.ndarray:
    """Pure-numpy loop oracle of the CUDA kernel semantics, for tests."""
    depth = np.asarray(depth)
    feat = np.asarray(feat)
    coor = np.asarray(coor)
    B, N, D, H, W = depth.shape
    C = feat.shape[-1]
    gx, gy, gz = (int(g) for g in grid_size)
    out = np.zeros((B, C, gz, gy, gx), np.float64)
    vox = np.floor(
        (coor - np.asarray(grid_lower_bound)) / np.asarray(grid_interval)
    ).astype(np.int64)
    for b in range(B):
        for n in range(N):
            for d in range(D):
                for h in range(H):
                    for w in range(W):
                        x, y, z = vox[b, n, d, h, w]
                        if 0 <= x < gx and 0 <= y < gy and 0 <= z < gz:
                            out[b, :, z, y, x] += (
                                depth[b, n, d, h, w] * feat[b, n, h, w]
                            )
    return out.astype(np.float32)
