"""StreamMapNet and RasterMapper assemblies with the prior-fusion hook.

Reference spec: online-mapping/plugin/models/mapers/StreamMapNet.py
(:72-73, 160-230: BEVFormer backbone -> streaming ConvGRU BEV memory ->
PriorFusion2D on the BEV features -> MapDetectorHead) and RasterMapper.py
(:13-57: same backbone + prior hook, rasterized segmentation head).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.prior_fusion import PriorFusion2D
from .bev_encoder import BEVEncoder
from .conv_gru import ConvGRU, warp_bev
from .map_head import MapDetectorHead


class StreamMapNet(nn.Module):
    """Single-sample forward (the reference batches by list; batching here
    is jax.vmap at the call site when needed).

    __call__ inputs:
      imgs (N_cam, 3, H, W); lidar2img (N_cam, 4, 4);
      prev_bev (C, Hb, Wb) or None  — streaming BEV memory;
      prev2curr (3, 3) 2D ego motion for the BEV warp;
      prior_feats/coords/valid — voxelized priors (prior/consume.py), None
        to run prior-free.
    Returns dict(scores, lines, queries, bev).
    """

    bev_hw: Tuple[int, int] = (25, 50)
    roi_size: Tuple[float, float] = (60.0, 30.0)
    img_size: Tuple[int, int] = (32, 64)
    embed_dim: int = 64
    num_queries: int = 50
    num_points: int = 20
    num_classes: int = 3
    streaming_bev: bool = True
    prior_pc_range: Optional[Sequence[float]] = None
    prior_voxel_size: Optional[Sequence[float]] = None
    prior_voxel_channels: int = 68
    use_prior_only: bool = False
    """Prior-only ablation (StreamMapNet_prioronly.py): zero the camera
    BEV before fusion so the head sees priors alone."""
    topk_propagate: int = 10
    num_levels: int = 1
    num_z_anchors: int = 1
    backbone: str = "simple"
    dcn: bool = False
    enc_layers: int = 2
    """BEVFormer encoder layers (reference smn config :109 num_layers=1)."""
    sca_capacity_frac: float = 1.0
    """Per-camera in-frustum query compaction capacity in the encoder's
    spatial cross-attention, as a fraction of the BEV query count (1.0 =
    exact). See bev_encoder._FusedDeformableCore."""
    dec_layers: int = 2
    """MapTransformerDecoder layers (reference smn config :172
    num_layers=6)."""
    num_heads: int = 4
    """Attention heads in both the encoder's deformable attentions and the
    decoder (reference: 8, mmcv MultiScaleDeformableAttention default and
    smn config :182,189)."""
    tsa_prev: bool = False
    """Feed the (ego-warped) previous BEV into TemporalSelfAttention's
    2-frame queue. The reference StreamMapNet keeps its streaming memory in
    the ConvGRU and runs TSA on the [query, query] stack (its transformer
    never receives prev_bev); BEVFormer-proper semantics are available by
    switching this on."""

    @nn.compact
    def __call__(self, imgs, lidar2img, prev_bev=None, prev2curr=None,
                 prev_queries=None, prior_feats=None, prior_coords=None,
                 prior_valid=None, prev_ref_pts=None, prev2curr_pose=None,
                 train: bool = False):
        warped = None
        if prev_bev is not None:
            warped = warp_bev(prev_bev, prev2curr, self.roi_size)
        bev = BEVEncoder(
            bev_hw=self.bev_hw, roi_size=self.roi_size,
            img_size=self.img_size, embed_dim=self.embed_dim,
            num_levels=self.num_levels, num_z_anchors=self.num_z_anchors,
            backbone=self.backbone, dcn=self.dcn,
            num_layers=self.enc_layers, num_heads=self.num_heads,
            sca_capacity_frac=self.sca_capacity_frac,
            name="backbone",
        )(imgs, lidar2img,
          prev_bev=warped if self.tsa_prev else None, train=train)

        if self.streaming_bev and warped is not None:
            bev = ConvGRU(self.embed_dim, name="stream_fusion")(warped, bev)

        if prior_feats is not None:
            # Prior injection on the 2D BEV features
            # (StreamMapNet.py:192-197; PriorFusion2D contract).
            if self.use_prior_only:
                bev = jnp.zeros_like(bev)
            fused = PriorFusion2D(
                prior_pc_range=self.prior_pc_range,
                prior_voxel_size=self.prior_voxel_size,
                bev_feats_channels=self.embed_dim,
                voxel_channels=self.prior_voxel_channels,
                hidden_channels=self.embed_dim,
                name="prior_fusion",
            )(bev[None], prior_feats[None], prior_coords[None],
              prior_valid[None], train)
            bev = fused[0]

        if prev_queries is not None and prev2curr_pose is None:
            # Legacy 2D ego motion: lift the (3, 3) BEV warp matrix to the
            # (4, 4) pose the propagation path transforms refs with.
            if prev2curr is not None:
                m = jnp.eye(4)
                m = m.at[:2, :2].set(prev2curr[:2, :2])
                m = m.at[:2, 3].set(prev2curr[:2, 2])
                prev2curr_pose = m
            else:
                prev2curr_pose = jnp.eye(4)
        if prev_queries is not None and prev_ref_pts is None:
            prev_ref_pts = jnp.full(
                (prev_queries.shape[0], self.num_points, 2), 0.5)
        out = MapDetectorHead(
            num_queries=self.num_queries, num_classes=self.num_classes,
            num_points=self.num_points, embed_dim=self.embed_dim,
            roi_size=self.roi_size, topk_propagate=self.topk_propagate,
            num_layers=self.dec_layers, num_heads=self.num_heads,
            name="head",
        )(bev, prev_queries, prev_ref_pts, prev2curr_pose)
        out["bev"] = bev
        return out


class RasterMapper(nn.Module):
    """BEVFormer-raster baseline (RasterMapper.py:13-57): same backbone +
    prior hook, per-pixel multi-label segmentation head on the BEV."""

    bev_hw: Tuple[int, int] = (25, 50)
    roi_size: Tuple[float, float] = (60.0, 30.0)
    img_size: Tuple[int, int] = (32, 64)
    embed_dim: int = 64
    num_classes: int = 3
    prior_pc_range: Optional[Sequence[float]] = None
    prior_voxel_size: Optional[Sequence[float]] = None
    prior_voxel_channels: int = 68
    use_prior_only: bool = False
    """Prior-only ablation (StreamMapNet_prioronly.py): zero the camera
    BEV before fusion so the head sees priors alone."""
    num_levels: int = 1
    num_z_anchors: int = 1
    backbone: str = "simple"
    dcn: bool = False
    enc_layers: int = 2
    sca_capacity_frac: float = 1.0
    num_heads: int = 4
    """Backbone/encoder knobs, same contract as StreamMapNet — the
    reference raster config shares the smn BEVFormerBackbone exactly
    (nusc_raster_...py:71-103: ResNet-50 + DCNv2 stages 3-4, 3 FPN
    levels, 4 z anchors, 1 encoder layer, 8 heads)."""

    @nn.compact
    def __call__(self, imgs, lidar2img, prior_feats=None, prior_coords=None,
                 prior_valid=None, train: bool = False):
        bev = BEVEncoder(
            bev_hw=self.bev_hw, roi_size=self.roi_size,
            img_size=self.img_size, embed_dim=self.embed_dim,
            num_levels=self.num_levels, num_z_anchors=self.num_z_anchors,
            backbone=self.backbone, dcn=self.dcn,
            num_layers=self.enc_layers, num_heads=self.num_heads,
            sca_capacity_frac=self.sca_capacity_frac,
            name="backbone",
        )(imgs, lidar2img, train=train)
        if prior_feats is not None:
            fused = PriorFusion2D(
                prior_pc_range=self.prior_pc_range,
                prior_voxel_size=self.prior_voxel_size,
                bev_feats_channels=self.embed_dim,
                voxel_channels=self.prior_voxel_channels,
                hidden_channels=self.embed_dim,
                name="prior_fusion",
            )(bev[None], prior_feats[None], prior_coords[None],
              prior_valid[None], train)
            bev = fused[0]
        h = bev.transpose(1, 2, 0)  # HWC
        h = nn.Conv(self.embed_dim, (3, 3), padding="SAME")(h)
        h = nn.relu(h)
        logits = nn.Conv(self.num_classes, (1, 1))(h)
        return logits.transpose(2, 0, 1)  # (classes, Hb, Wb)


def raster_loss(logits: jnp.ndarray, gt_masks: jnp.ndarray) -> jnp.ndarray:
    """Per-class binary cross-entropy on the rasterized map."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * gt_masks
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
