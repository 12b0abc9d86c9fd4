"""Camera rays on-device: the TPU-native RayGenerator.

Reference spec: nerfstudio-0.3.3/nerfstudio/cameras/cameras.py:320-958
(generate_rays: perspective :773-778, fisheye :780-795, equirectangular
:797-808, plus the OpenCV undistortion hook at :639) and
model_components/ray_generators.py:26-61 (RayGenerator: (cam,row,col) index
-> RayBundle). The nerfstudio camera convention: image y down, camera looks
along -z, pixel centers at +0.5; camera-space direction
[(x-cx)/fx, -(y-cy)/fy, -1] rotated by c2w and normalized. PreSight's
camera optimizer runs mode='off' (my_datamanager.py:81-84) so no pose deltas,
and its dataparser sets no distortion — the perspective path is the hot one.

TPU design: where the reference dispatches per camera type with boolean
masks, rays here are generated BRANCHLESSLY — all three direction formulas
are cheap elementwise VPU math, computed for every ray and selected with
jnp.where, so mixed-type camera tables compile to one static program. The
OpenCV undistort Newton solve is a fixed-trip fori_loop (10 iterations,
matching camera_utils.py:411-450) and is skipped at trace time when the
camera table carries no distortion.

The camera table lives on device as a small pytree; ray generation is pure
gather + elementwise math, jitted into the train step so the host ships only
(cam,row,col) int32 triples plus supervision targets per ray.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.rays import RayBundle

# Camera type codes — the reference CameraType enum values (cameras.py:44-53,
# auto() numbering), so serialized camera tables carry over unchanged.
# VR/ODS stereo variants are out of scope (viewer-only in the reference).
PERSPECTIVE = 1
FISHEYE = 2
EQUIRECTANGULAR = 3


@struct.dataclass
class CameraParams:
    """Per-camera parameters, all (C, ...)."""

    c2w: jnp.ndarray  # (C, 3, 4) camera-to-world [R | t], nerfstudio convention
    fx: jnp.ndarray  # (C,)
    fy: jnp.ndarray  # (C,)
    cx: jnp.ndarray  # (C,)
    cy: jnp.ndarray  # (C,)
    video_ids: Optional[jnp.ndarray] = None  # (C,) int32
    camera_type: Optional[jnp.ndarray] = None  # (C,) int32; None = perspective
    distortion_params: Optional[jnp.ndarray] = None  # (C, 6) [k1 k2 k3 k4 p1 p2]

    @property
    def num_cameras(self) -> int:
        return self.c2w.shape[0]


def _undistort_newton(coords: jnp.ndarray, dist: jnp.ndarray,
                      eps: float = 1e-3, iters: int = 10) -> jnp.ndarray:
    """Invert the OpenCV radial+tangential model by Newton's method.

    Reference: camera_utils.py:345-450 (radial_and_tangential_undistort).
    coords (R, 2) are the distorted normalized coords; dist (R, 6).
    """
    k1, k2, k3, k4, p1, p2 = (dist[..., i] for i in range(6))
    xd, yd = coords[..., 0], coords[..., 1]

    def body(_, xy):
        x, y = xy
        r = x * x + y * y
        d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
        d_r = k1 + r * (2.0 * k2 + r * (3.0 * k3 + r * 4.0 * k4))
        d_x = 2.0 * x * d_r
        d_y = 2.0 * y * d_r
        # Residuals of the forward model and their Jacobian.
        fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
        fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd
        fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
        fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
        fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
        fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
        den = fy_x * fx_y - fx_x * fy_y
        ok = jnp.abs(den) > eps
        step_x = jnp.where(ok, (fx * fy_y - fy * fx_y) / den, 0.0)
        step_y = jnp.where(ok, (fy * fx_x - fx * fy_x) / den, 0.0)
        return (x + step_x, y + step_y)

    x, y = jax.lax.fori_loop(0, iters, body, (xd, yd))
    return jnp.stack([x, y], axis=-1)


def generate_rays(
    cameras: CameraParams,
    ray_index: jnp.ndarray,  # (R, 3) int32: (camera, row, col)
    pixel_offset: float = 0.5,
) -> RayBundle:
    """(cam,row,col) -> world-space rays (cameras.py:320+)."""
    cam = ray_index[:, 0]
    y = ray_index[:, 1].astype(jnp.float32) + pixel_offset
    x = ray_index[:, 2].astype(jnp.float32) + pixel_offset

    fx = cameras.fx[cam]
    fy = cameras.fy[cam]
    cx = cameras.cx[cam]
    cy = cameras.cy[cam]
    c2w = cameras.c2w[cam]  # (R, 3, 4)

    u = (x - cx) / fx
    v = -(y - cy) / fy

    ctype = None
    if cameras.camera_type is not None:
        ctype = cameras.camera_type[cam]  # (R,)

    if cameras.distortion_params is not None:
        # Undistortion applies to the normalized plane coords for every
        # non-equirectangular camera (cameras.py:637-644).
        und = _undistort_newton(
            jnp.stack([u, v], axis=-1), cameras.distortion_params[cam]
        )
        if ctype is not None:
            keep = ctype == EQUIRECTANGULAR
            u = jnp.where(keep, u, und[..., 0])
            v = jnp.where(keep, v, und[..., 1])
        else:
            u, v = und[..., 0], und[..., 1]

    # Perspective (cameras.py:773-778)
    dir_cam = jnp.stack([u, v, -jnp.ones_like(u)], axis=-1)

    if ctype is not None:
        # Fisheye (equidistant model, cameras.py:780-795)
        theta = jnp.clip(jnp.sqrt(u * u + v * v), 1e-9, jnp.pi)
        sinc = jnp.sin(theta) / theta
        dir_fish = jnp.stack([u * sinc, v * sinc, -jnp.cos(theta)], axis=-1)
        # Equirectangular (cameras.py:797-808): for equirect images
        # fx = fy = height = width/2, so u in [-1,1], v in [-1/2,1/2].
        th = -jnp.pi * u
        phi = jnp.pi * (0.5 - v)
        dir_eq = jnp.stack(
            [-jnp.sin(th) * jnp.sin(phi), jnp.cos(phi), -jnp.cos(th) * jnp.sin(phi)],
            axis=-1,
        )
        dir_cam = jnp.where(
            (ctype == FISHEYE)[:, None], dir_fish,
            jnp.where((ctype == EQUIRECTANGULAR)[:, None], dir_eq, dir_cam),
        )

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
    small = jnp.linalg.norm(omega, axis=-1) < 1e-6

    def skew(v):
        k = jnp.zeros((v.shape[0], 3, 3), v.dtype)
        k = k.at[:, 0, 1].set(-v[:, 2]).at[:, 0, 2].set(v[:, 1])
        k = k.at[:, 1, 0].set(v[:, 2]).at[:, 1, 2].set(-v[:, 0])
        return k.at[:, 2, 0].set(-v[:, 1]).at[:, 2, 1].set(v[:, 0])

    eye = jnp.broadcast_to(jnp.eye(3, dtype=deltas.dtype), (deltas.shape[0], 3, 3))
    # Near zero, Rodrigues' axis = omega/|omega| is 0/0 — and a jnp.where on
    # the OUTPUT alone would still propagate NaN through the untaken
    # branch's gradient. Sanitize the input of the Rodrigues branch (any
    # finite stand-in; its result is discarded) and use the 2nd-order
    # Taylor exp(hat(w)) ≈ I + hat(w) + hat(w)²/2 on the small branch,
    # which is exact to O(|w|³) and smoothly differentiable at 0.
    omega_safe = jnp.where(small[:, None], jnp.ones_like(omega), omega)
    theta = jnp.linalg.norm(omega_safe, axis=-1, keepdims=True)
    k = skew(omega_safe / theta)
    theta = theta[..., None]
    rot_rodrigues = eye + jnp.sin(theta) * k + (1.0 - jnp.cos(theta)) * (k @ k)
    h = skew(omega)
    rot_taylor = eye + h + 0.5 * (h @ h)
    rot = jnp.where(small[:, None, None], rot_taylor, rot_rodrigues)
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
