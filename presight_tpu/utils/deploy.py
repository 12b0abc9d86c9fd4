"""bf16 deployment-mode casting for stage-3 inference.

The measured deployment lever on v5e for the stage-3 chains is bf16
(PERFORMANCE.md round 5: BEVFormer-raster 14.4 -> 19.6 FPS, StreamMapNet
15.1 -> 18.9): params and feature tensors (images, BEV features, prior
voxel features, propagated queries) move to bf16 for 2x MXU rate and
half the HBM traffic, while geometry (poses, intrinsics, lidar2img,
reference points, ego-motion warps) stays fp32 — bf16's 8-bit mantissa
cannot represent pixel coordinates at 480x800, so casting geometry
corrupts the sampling grids rather than merely losing precision.

This is the same split the reference ships for fp16 deployments of its
mmdet3d-based chains (occupancy configs use fp16 only on conv/backbone
weights, never on the geometric inputs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["bf16_cast"]


def bf16_cast(tree):
    """Cast every float32 leaf of a pytree to bfloat16.

    Use on params and FEATURE tensors only; keep geometry tensors out of
    the casted set (see module docstring). Non-float32 leaves (ints,
    bools, already-bf16) pass through unchanged.
    """
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        tree,
    )
