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


def exp_map_so3xr3(deltas: jnp.ndarray) -> jnp.ndarray:
    """(C, 6) [rho | omega] -> (C, 3, 4) adjustment transforms.

    Reference spec: nerfstudio-0.3.3/nerfstudio/cameras/camera_optimizers.py
    (SO3xR3 mode) + lie_groups.exp_map_SO3xR3: rotation = exp(hat(omega)),
    translation = rho (no V-matrix coupling, unlike SE3). PreSight trains
    with mode='off' (my_datamanager.py:81-84); this exists for parity with
    the optional pose-refinement path.
    """
    rho = deltas[:, :3]
    omega = deltas[:, 3:]
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-12)
    axis = omega / theta
    k = jnp.zeros((deltas.shape[0], 3, 3), deltas.dtype)
    k = k.at[:, 0, 1].set(-axis[:, 2]).at[:, 0, 2].set(axis[:, 1])
    k = k.at[:, 1, 0].set(axis[:, 2]).at[:, 1, 2].set(-axis[:, 0])
    k = k.at[:, 2, 0].set(-axis[:, 1]).at[:, 2, 1].set(axis[:, 0])
    theta = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=deltas.dtype), k.shape)
    rot = eye + jnp.sin(theta) * k + (1.0 - jnp.cos(theta)) * (k @ k)
    # Identity when omega ~ 0 (avoids 0/0 in axis).
    small = jnp.linalg.norm(omega, axis=-1) < 1e-8
    rot = jnp.where(small[:, None, None], eye, rot)
    return jnp.concatenate([rot, rho[:, :, None]], axis=-1)


def apply_camera_deltas(cameras: CameraParams, deltas: jnp.ndarray) -> CameraParams:
    """Compose per-camera SO3xR3 adjustments into the c2w table
    (camera_optimizers.py apply_to_raybundle semantics: rotate the camera
    rotation, add the translation)."""
    adj = exp_map_so3xr3(deltas)
    rot = adj[:, :3, :3] @ cameras.c2w[:, :3, :3]
    t = cameras.c2w[:, :3, 3] + adj[:, :3, 3]
    c2w = jnp.concatenate([rot, t[:, :, None]], axis=-1)
    return cameras.replace(c2w=c2w)


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
