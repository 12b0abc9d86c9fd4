"""LSS (lift-splat-shoot) view transformer, TPU-native flax module.

Reference spec: occupancy/mmdet3d/models/necks/view_transformer.py —
LSSViewTransformer (:18-335: frustum creation, lidar-coordinate projection,
bev_pool_v2 splat) and the camera-aware DepthNet of the BEVDepth/BEVStereo
variants (:505-727, :737-844). The frustum and grid bookkeeping are static
numpy; the projection chain reproduces get_lidar_coor (:143-175) exactly.

Scope note: the BEVStereo variant's temporal stereo cost volume
(view_transformer.py:838-844 + the stereo matching in depth_net) is a
quality refinement of the *depth distribution* only; here the DepthNet is
the camera-aware (mlp_input-conditioned SE) mono variant. The splat path —
what the priors interact with — is semantics-complete.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .bev_pool import bev_pool_v2


def create_frustum(depth_cfg, input_size, downsample) -> np.ndarray:
    """(D, Hf, Wf, 3) frustum template (view_transformer.py:112-138):
    pixel coords in the INPUT image resolution plus metric depth."""
    h_in, w_in = input_size
    h_feat, w_feat = h_in // downsample, w_in // downsample
    d = np.arange(*depth_cfg, dtype=np.float32)
    D = len(d)
    d = np.broadcast_to(d.reshape(-1, 1, 1), (D, h_feat, w_feat))
    x = np.broadcast_to(
        np.linspace(0, w_in - 1, w_feat, dtype=np.float32).reshape(1, 1, -1),
        (D, h_feat, w_feat),
    )
    y = np.broadcast_to(
        np.linspace(0, h_in - 1, h_feat, dtype=np.float32).reshape(1, -1, 1),
        (D, h_feat, w_feat),
    )
    return np.stack([x, y, d], axis=-1)


def get_lidar_coor(
    frustum: jnp.ndarray,  # (D, Hf, Wf, 3)
    sensor2ego: jnp.ndarray,  # (B, N, 4, 4)
    cam2imgs: jnp.ndarray,  # (B, N, 3, 3)
    post_rots: jnp.ndarray,  # (B, N, 3, 3)
    post_trans: jnp.ndarray,  # (B, N, 3)
    bda: jnp.ndarray,  # (B, 4, 4)
) -> jnp.ndarray:
    """Frustum template -> ego/lidar coordinates
    (view_transformer.py:143-175), exactly: undo image-view augmentation,
    unproject through the inverse intrinsics, rotate/translate to ego, then
    apply the BEV-augmentation matrix."""
    B, N = sensor2ego.shape[:2]
    points = frustum[None, None] - post_trans[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(post_rots)
    points = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, points)
    points = jnp.concatenate(
        [points[..., :2] * points[..., 2:3], points[..., 2:3]], axis=-1
    )
    combine = jnp.einsum(
        "bnij,bnjk->bnik", sensor2ego[:, :, :3, :3], jnp.linalg.inv(cam2imgs)
    )
    points = jnp.einsum("bnij,bndhwj->bndhwi", combine, points)
    points = points + sensor2ego[:, :, None, None, None, :3, 3]
    points = jnp.einsum("bij,bndhwj->bndhwi", bda[:, :3, :3], points)
    points = points + bda[:, None, None, None, None, :3, 3]
    return points


class DepthNet(nn.Module):
    """Camera-aware depth/context head (view_transformer.py:505-727 shape):
    conv trunk + an SE gate conditioned on flattened camera parameters
    (mlp_input), emitting D depth logits + C context channels."""

    mid_channels: int
    depth_bins: int
    out_channels: int

    @nn.compact
    def __call__(self, x, mlp_input, train: bool = False):
        # x: (B*N, Hf, Wf, Cin) NHWC; mlp_input: (B*N, M)
        h = nn.Conv(self.mid_channels, (3, 3), padding="SAME")(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        se = nn.Dense(self.mid_channels)(mlp_input)
        se = nn.relu(se)
        se = nn.Dense(self.mid_channels)(se)
        h = h * jax.nn.sigmoid(se)[:, None, None, :]
        h = nn.Conv(self.mid_channels, (3, 3), padding="SAME")(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        return nn.Conv(self.depth_bins + self.out_channels, (1, 1))(h)


class LSSViewTransformer(nn.Module):
    """Lift-splat view transformer (view_transformer.py:18-335).

    grid_config keys 'x', 'y', 'z', 'depth', each (lo, hi, step).
    Input feature x is (B, N, Hf, Wf, Cin) NHWC.
    Returns (bev (B, C, Z, Y, X) or z-collapsed (B, C*Z, Y, X), depth
    (B*N, D, Hf, Wf)).
    """

    grid_config: Dict[str, Tuple[float, float, float]]
    input_size: Tuple[int, int]
    downsample: int = 16
    in_channels: int = 512
    out_channels: int = 64
    mid_channels: int = 64
    collapse_z: bool = True

    @property
    def depth_bins(self) -> int:
        lo, hi, step = self.grid_config["depth"]
        return int(round((hi - lo) / step))

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        return tuple(
            int(round((self.grid_config[k][1] - self.grid_config[k][0])
                      / self.grid_config[k][2]))
            for k in ("x", "y", "z")
        )

    @nn.compact
    def __call__(self, x, sensor2ego, cam2imgs, post_rots, post_trans, bda,
                 train: bool = False):
        B, N, Hf, Wf, Cin = x.shape
        D = self.depth_bins

        # Camera-aware mlp_input (view_transformer.py:729-735 shape):
        # flattened intrinsics + post-aug + sensor2ego rotation.
        mlp_input = jnp.concatenate(
            [
                cam2imgs.reshape(B, N, 9),
                post_rots.reshape(B, N, 9),
                post_trans.reshape(B, N, 3),
                sensor2ego[:, :, :3, :].reshape(B, N, 12),
            ],
            axis=-1,
        ).reshape(B * N, -1)

        feat = DepthNet(self.mid_channels, D, self.out_channels)(
            x.reshape(B * N, Hf, Wf, Cin), mlp_input, train
        )  # (B*N, Hf, Wf, D + C)
        depth_logits = feat[..., :D]
        tran_feat = feat[..., D:]
        depth = jax.nn.softmax(depth_logits, axis=-1)
        # (B*N, Hf, Wf, D) -> (B, N, D, Hf, Wf)
        depth_b = jnp.transpose(
            depth.reshape(B, N, Hf, Wf, D), (0, 1, 4, 2, 3)
        )

        frustum = jnp.asarray(
            create_frustum(self.grid_config["depth"], self.input_size,
                           self.downsample)
        )
        coor = get_lidar_coor(frustum, sensor2ego, cam2imgs, post_rots,
                              post_trans, bda)

        lb = [self.grid_config[k][0] for k in ("x", "y", "z")]
        iv = [self.grid_config[k][2] for k in ("x", "y", "z")]
        bev = bev_pool_v2(
            depth_b, tran_feat.reshape(B, N, Hf, Wf, -1), coor,
            lb, iv, self.grid_size,
        )  # (B, C, Z, Y, X)
        if self.collapse_z:
            # Reference collapse = cat(unbind(dim=2), 1): z-major channel
            # blocks (view_transformer.py:225-227).
            b, c, z, yy, xx = bev.shape
            bev = jnp.transpose(bev, (0, 2, 1, 3, 4)).reshape(b, z * c, yy, xx)
        return bev, jnp.transpose(depth.reshape(B * N, Hf, Wf, D), (0, 3, 1, 2))
