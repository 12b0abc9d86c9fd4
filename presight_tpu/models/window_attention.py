"""Windowed BEV<->prior cross-attention (the PriorFusion3D_crossattn ablation).

Reference spec: online-mapping/plugin/models/necks/window_cross_attention.py —
WindowMultiHeadAttention (:179-340): Swin-V2-style scaled cosine attention
with a log-spaced continuous relative-position-bias meta network and a
clamped per-head temperature tau; WindowCrossAttention (:349-440): partition
the BEV into non-overlapping windows, cross-attend query windows to prior
windows with a -100 mask where the prior is empty, layernorm + residual —
and occupancy/mmdet3d/models/necks/prior_fusion_module.py:247-372
(PriorFusion3D_crossattn: voxel MLP -> dense grid -> conv stack -> window
cross-attn into the z-flattened BEV via in/out projections).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .prior_fusion import VoxelFeatureExtractor, _ConvBNReLU, formulate_voxels


def _relative_coordinates_log(window_size: int) -> np.ndarray:
    """Log-spaced pairwise relative coords (window_cross_attention.py:231-242)."""
    idx = np.arange(window_size)
    coords = np.stack(np.meshgrid(idx, idx, indexing="ij"), axis=0).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).reshape(-1, 2).astype(np.float32)
    return np.sign(rel) * np.log1p(np.abs(rel))


class WindowMultiHeadAttention(nn.Module):
    """Swin-V2 scaled cosine window attention (:179-340)."""

    in_features: int
    window_size: int
    num_heads: int = 8
    dropout: float = 0.0
    meta_hidden: int = 256

    @nn.compact
    def __call__(self, q_tokens, kv_tokens, mask=None, train: bool = False):
        """q_tokens/kv_tokens: (batch*windows, tokens, C); mask
        (batch*windows, tokens, 1) additive logits or None."""
        bw, tokens, c = q_tokens.shape
        h = self.num_heads
        hd = c // h

        q = nn.Dense(c, name="mapping_q")(q_tokens)
        kv = nn.Dense(2 * c, name="mapping_kv")(kv_tokens)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(x):
            return x.reshape(bw, tokens, h, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)

        # Scaled cosine attention with clamped tau (:289-294).
        qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
        kn = jnp.linalg.norm(k, axis=-1, keepdims=True)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.maximum(
            qn * kn.swapaxes(-2, -1), 1e-6
        )
        tau = self.param("tau", lambda k_: jnp.ones((1, h, 1, 1)), )
        att = att / jnp.clip(tau, 0.01, None)

        # Continuous relative position bias (:222-268).
        rel = jnp.asarray(_relative_coordinates_log(self.window_size))
        bias = nn.Dense(self.meta_hidden, name="meta_fc1")(rel)
        bias = nn.relu(bias)
        bias = nn.Dense(h, name="meta_fc2")(bias)  # (tokens*tokens, h)
        bias = bias.T.reshape(1, h, tokens, tokens)
        att = att + bias

        if mask is not None:
            att = att + mask[:, None, None, :, 0]  # mask keys
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(bw, tokens, c)
        out = nn.Dense(c, name="projection")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


def _unfold(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nw, w*w, C) non-overlapping windows."""
    b, hh, ww, c = x.shape
    x = x.reshape(b, hh // w, w, ww // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _fold(x: jnp.ndarray, w: int, b: int, hh: int, ww: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(b, hh // w, ww // w, w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hh, ww, c)


class WindowCrossAttention(nn.Module):
    """(:349-440): windowed BEV->prior cross attention, empty-prior keys
    masked at -100, layernorm + residual."""

    num_bev_win: int = 10
    bev_h: int = 200
    bev_w: int = 200
    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, key, train: bool = False):
        """query/key: (bs, bev_h*bev_w, C) -> (bs, bev_h*bev_w, C)."""
        assert self.bev_h % self.num_bev_win == 0 and self.bev_w % self.num_bev_win == 0
        w = self.bev_h // self.num_bev_win
        bs, _, c = query.shape
        q = query.reshape(bs, self.bev_h, self.bev_w, c)
        k = key.reshape(bs, self.bev_h, self.bev_w, c)

        # -100 logits where the prior window is empty (:411-413).
        mask = jnp.where(k[..., 0:1] == 0, -100.0, 0.0)

        qp = _unfold(q, w)
        kp = _unfold(k, w)
        mp = _unfold(mask, w)
        out = WindowMultiHeadAttention(
            in_features=self.embed_dims, window_size=w, num_heads=self.num_heads,
            dropout=self.dropout,
        )(qp, kp, mask=mp, train=train)
        out = _fold(out, w, bs, self.bev_h, self.bev_w)
        out = nn.LayerNorm()(out)
        out = out + q
        return out.reshape(bs, self.bev_h * self.bev_w, c)


class PriorFusion3DCrossAttn(nn.Module):
    """(prior_fusion_module.py:247-372). bev_feats (bs, c, h, w, z)."""

    prior_pc_range: Sequence[float]
    prior_voxel_size: Sequence[float]
    bev_hidden_channels: int = 256
    prior_in_channels: int = 68
    prior_voxel_hidden_channels: int = 64
    out_num_z: int = 8
    out_channels: int = 80
    dropout: float = 0.0
    num_bev_win: int = 10
    bev_h: int = 200
    bev_w: int = 200

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

        vox = jnp.transpose(grids, (0, 4, 3, 2, 1))  # (bs, hidden, z, h, w)
        x = vox.reshape(bs, -1, vox.shape[-2], vox.shape[-1])
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        x = _ConvBNReLU(self.bev_hidden_channels, 1)(x, train)
        x = _ConvBNReLU(self.bev_hidden_channels, 3)(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if (x.shape[1], x.shape[2]) != (bev_h, bev_w):
            x = jax.image.resize(x, (bs, bev_h, bev_w, x.shape[-1]), "bilinear")

        bev = jnp.transpose(bev_feats, (0, 2, 3, 4, 1)).reshape(
            bs, bev_h, bev_w, bev_z * bev_c
        )
        bev = nn.Dense(self.bev_hidden_channels, name="bev_in_proj")(bev)
        fused = WindowCrossAttention(
            num_bev_win=self.num_bev_win, bev_h=bev_h, bev_w=bev_w,
            embed_dims=self.bev_hidden_channels, dropout=self.dropout,
        )(bev.reshape(bs, bev_h * bev_w, -1), x.reshape(bs, bev_h * bev_w, -1),
          train=train)
        fused = fused.reshape(bs, bev_h, bev_w, -1)
        fused = nn.Dense(bev_z * bev_c, name="bev_out_proj")(fused)
        fused = fused.reshape(bs, bev_h, bev_w, bev_z, bev_c)
        return jnp.transpose(fused, (0, 4, 1, 2, 3))
