"""Prior fusion necks: inject voxelized city priors into BEV features.

Reference spec: occupancy/mmdet3d/models/necks/prior_fusion_module.py —
PriorFusion2D (:11-131, used by StreamMapNet on 2D BEV features) and
PriorFusion3D_voxel (:133-245, used by BEVDet-Occ on 3D BEV volumes). The
online-mapping copy differs only in the z_pooling_size naming and the
residual flag; both behaviors are covered here.

JAX/flax.linen implementation notes:
  * the reference's dense scatter (`formulate_voxels`, :114-131) becomes a
    jnp scatter-set into a zeros grid — including its (z,y,x)-coords-into-
    (x_res,y_res,z_res)-grid indexing quirk, reproduced bit-for-bit because
    downstream checkpoints depend on it;
  * BatchNorm runs in the usual flax train/eval modes;
  * convs keep NCHW/NCDHW reference semantics via explicit transposes
    (flax Conv is NHWC-native, which is also the TPU-friendly layout).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def formulate_voxels(
    prior_feats: jnp.ndarray,  # (V, C) padded voxel features
    coords: jnp.ndarray,  # (V, 3) int32 (z, y, x) from points_to_voxel
    valid: jnp.ndarray,  # (V,) bool padding mask
    voxel_resolution: Tuple[int, int, int],
) -> jnp.ndarray:
    """Dense grid scatter (prior_fusion_module.py:114-131). Invalid (padded)
    rows are routed to an out-of-grid dump slot then cropped away."""
    rx, ry, rz = voxel_resolution
    grid = jnp.zeros((rx + 1, ry + 1, rz + 1, prior_feats.shape[-1]),
                     prior_feats.dtype)
    dump = jnp.array([rx, ry, rz], jnp.int32)
    idx = jnp.where(valid[:, None], coords, dump[None, :])
    grid = grid.at[idx[:, 0], idx[:, 1], idx[:, 2]].set(prior_feats)
    return grid[:rx, :ry, :rz]


class VoxelFeatureExtractor(nn.Module):
    """Linear-ReLU-Dropout x2 (prior_fusion_module.py:32-39)."""

    hidden: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x is NHWC (or NDHWC for 3D callers using kernel tuples).
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME" if self.kernel > 1 else "VALID")(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class PriorFusion2D(nn.Module):
    """(prior_fusion_module.py:11-131). Inputs follow the reference:
    bev_feats (bs, bev_c, h, w); per-sample padded voxel features + coords."""

    prior_pc_range: Sequence[float]
    prior_voxel_size: Sequence[float]
    bev_feats_channels: int = 256
    voxel_channels: int = 68
    num_pool_buckets: int = 4
    hidden_channels: int = 256
    dropout: float = 0.0

    @property
    def voxel_resolution(self) -> Tuple[int, int, int]:
        pr = np.asarray(self.prior_pc_range, np.float64)
        vs = np.asarray(self.prior_voxel_size, np.float64)
        return tuple(int(v) for v in np.ceil((pr[3:] - pr[:3]) / vs))

    @nn.compact
    def __call__(self, bev_feats, prior_feats, prior_coords, prior_valid,
                 train: bool = False):
        num_prior_z = int(
            (self.prior_pc_range[5] - self.prior_pc_range[2]) / self.prior_voxel_size[2]
        )
        num_z_pooled = num_prior_z // self.num_pool_buckets

        vfe = VoxelFeatureExtractor(self.hidden_channels, self.dropout)
        feats = vfe(prior_feats, train)  # (bs, V, hidden)

        grids = jax.vmap(
            lambda f, c, v: formulate_voxels(f, c, v, self.voxel_resolution)
        )(feats, prior_coords, prior_valid)  # (bs, gx, gy, gz, hidden)

        # Reference permute (0,4,2,1,3): (bs, hidden, h=gy, w=gx, z=gz).
        vox = jnp.transpose(grids, (0, 4, 2, 1, 3))
        bs, hidden, h, w, z = vox.shape

        # Max-pool the z axis into num_pool_buckets buckets (:41,96-100).
        vox = vox.reshape(bs, hidden, h, w, self.num_pool_buckets, num_z_pooled)
        pooled = jnp.max(vox, axis=-1)  # (bs, hidden, h, w, num_z_pooled)
        # Note: reference pools with kernel=num_z_pooled giving num_pool_buckets
        # outputs then flattens hidden*num_z_pooled; sizes agree when
        # num_pool_buckets == num_z_pooled is not required — we keep the
        # bucket count as the flattened factor per :101.
        pooled = jnp.transpose(pooled, (0, 1, 4, 2, 3)).reshape(bs, -1, h, w)

        x = jnp.transpose(pooled, (0, 2, 3, 1))  # NHWC
        x = _ConvBNReLU(self.hidden_channels, 1)(x, train)
        x = _ConvBNReLU(self.hidden_channels, 3)(x, train)

        bev_h, bev_w = bev_feats.shape[-2:]
        if (x.shape[1], x.shape[2]) != (bev_h, bev_w):
            x = jax.image.resize(x, (bs, bev_h, bev_w, x.shape[-1]), "bilinear")

        bev = jnp.transpose(bev_feats, (0, 2, 3, 1))
        x = jnp.concatenate([bev, x], axis=-1)
        x = _ConvBNReLU(self.bev_feats_channels, 1)(x, train)
        x = _ConvBNReLU(self.bev_feats_channels, 3)(x, train)
        return jnp.transpose(x, (0, 3, 1, 2))  # back to NCHW


class PriorFusion3DVoxel(nn.Module):
    """(prior_fusion_module.py:133-245). bev_feats (bs, c, h, w, z)."""

    prior_pc_range: Sequence[float]
    prior_voxel_size: Sequence[float]
    bev_hidden_channels: int = 256
    prior_in_channels: int = 68
    prior_voxel_hidden_channels: int = 64
    out_num_z: int = 8
    out_channels: int = 80
    dropout: float = 0.0
    residual: bool = True

    @property
    def voxel_resolution(self) -> Tuple[int, int, int]:
        pr = np.asarray(self.prior_pc_range, np.float64)
        vs = np.asarray(self.prior_voxel_size, np.float64)
        return tuple(int(v) for v in np.ceil((pr[3:] - pr[:3]) / vs))

    @nn.compact
    def __call__(self, bev_feats, prior_feats, prior_coords, prior_valid,
                 train: bool = False):
        bs, bev_c, bev_h, bev_w, bev_z = bev_feats.shape
        assert self.out_num_z == bev_z

        vfe = VoxelFeatureExtractor(self.prior_voxel_hidden_channels, self.dropout)
        feats = vfe(prior_feats, train)

        grids = jax.vmap(
            lambda f, c, v: formulate_voxels(f, c, v, self.voxel_resolution)
        )(feats, prior_coords, prior_valid)  # (bs, gx, gy, gz, hidden)

        # Reference permute (0,4,3,2,1): (bs, hidden, z, h, w) then flatten z.
        vox = jnp.transpose(grids, (0, 4, 3, 2, 1))
        bs_, hidden, z, h, w = vox.shape
        x = vox.reshape(bs_, hidden * z, h, w)

        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        x = _ConvBNReLU(self.bev_hidden_channels, 1)(x, train)
        x = _ConvBNReLU(self.bev_hidden_channels, 3)(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))

        if (x.shape[1], x.shape[2]) != (bev_h, bev_w):
            x = jax.image.resize(x, (bs_, bev_h, bev_w, x.shape[-1]), "bilinear")

        # (bs, hidden2/z, bev_h, bev_w, z)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(
            bs_, -1, self.out_num_z, bev_h, bev_w
        )
        x = jnp.transpose(x, (0, 1, 3, 4, 2))
        cat = jnp.concatenate([bev_feats, x], axis=1)

        # Conv3d(k=1) + BN3d (block2, :174-177) in NDHWC.
        y = jnp.transpose(cat, (0, 2, 3, 4, 1))
        y = nn.Conv(self.out_channels, (1, 1, 1))(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = jnp.transpose(y, (0, 4, 1, 2, 3))
        if self.residual:
            return jax.nn.relu(y + bev_feats)
        return jax.nn.relu(y)
