"""Camera rays on-device: the TPU-native RayGenerator.

Reference spec: nerfstudio-0.3.3/nerfstudio/cameras/cameras.py:320-958
(generate_rays, perspective path at :741-746 + normalization) and
model_components/ray_generators.py:26-61 (RayGenerator: (cam,row,col) index
-> RayBundle). The nerfstudio camera convention: image y down, camera looks
along -z, pixel centers at +0.5; camera-space direction
[(x-cx)/fx, -(y-cy)/fy, -1] rotated by c2w and normalized. PreSight's
camera optimizer runs mode='off' (my_datamanager.py:81-84) so no pose deltas.

The camera table lives on device as a small pytree; ray generation is pure
gather + elementwise math, jitted into the train step so the host ships only
(cam,row,col) int32 triples plus supervision targets per ray.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from ..ops.rays import RayBundle


@struct.dataclass
class CameraParams:
    """Per-camera parameters, all (C, ...)."""

    c2w: jnp.ndarray  # (C, 3, 4) camera-to-world [R | t], nerfstudio convention
    fx: jnp.ndarray  # (C,)
    fy: jnp.ndarray  # (C,)
    cx: jnp.ndarray  # (C,)
    cy: jnp.ndarray  # (C,)
    video_ids: Optional[jnp.ndarray] = None  # (C,) int32

    @property
    def num_cameras(self) -> int:
        return self.c2w.shape[0]


def generate_rays(
    cameras: CameraParams,
    ray_index: jnp.ndarray,  # (R, 3) int32: (camera, row, col)
    pixel_offset: float = 0.5,
) -> RayBundle:
    """(cam,row,col) -> world-space rays (cameras.py:320+, perspective)."""
    cam = ray_index[:, 0]
    y = ray_index[:, 1].astype(jnp.float32) + pixel_offset
    x = ray_index[:, 2].astype(jnp.float32) + pixel_offset

    fx = cameras.fx[cam]
    fy = cameras.fy[cam]
    cx = cameras.cx[cam]
    cy = cameras.cy[cam]
    c2w = cameras.c2w[cam]  # (R, 3, 4)

    dir_cam = jnp.stack(
        [(x - cx) / fx, -(y - cy) / fy, -jnp.ones_like(x)], axis=-1
    )  # (R, 3)
    dir_world = jnp.einsum("rij,rj->ri", c2w[:, :3, :3], dir_cam)
    dir_world = dir_world / jnp.linalg.norm(dir_world, axis=-1, keepdims=True)
    origins = c2w[:, :3, 3]

    video_ids = None
    if cameras.video_ids is not None:
        video_ids = cameras.video_ids[cam]
    n = ray_index.shape[0]
    return RayBundle(
        origins=origins,
        directions=dir_world,
        nears=jnp.zeros((n,), origins.dtype),
        fars=jnp.full((n,), 1e6, origins.dtype),
        camera_indices=cam.astype(jnp.int32),
        video_ids=video_ids,
    )


def generate_camera_rays(cameras: CameraParams, camera_idx: int, height: int, width: int) -> RayBundle:
    """All pixels of one camera, row-major (eval / extraction path)."""
    rows = jnp.arange(height, dtype=jnp.int32)
    cols = jnp.arange(width, dtype=jnp.int32)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    idx = jnp.stack(
        [jnp.full((height * width,), camera_idx, jnp.int32), rr.reshape(-1), cc.reshape(-1)],
        axis=-1,
    )
    return generate_rays(cameras, idx)
