"""BEVDet-Occ detector chain, TPU-native flax modules.

Reference spec: occupancy/mmdet3d/models/detectors/bevdet.py (BEVDet:
image_encoder :43-61, bev_encoder with the prior-fusion hook :62-78) and
bevdet_occ.py (BEVStereo4DOCC :13-142: final 3D conv + softplus predicter
head :27-42, masked CE loss :55-72). The image backbone/neck stand in for
the reference's ResNet50+CustomFPN at configurable width (the prior
contract and the occupancy head — what PreSight adds — are
semantics-complete; the backbone is a capacity knob).

Temporal (4D) support: pass ``prev_bev`` (+ ``prev2curr`` 2D ego motion) and
set ``temporal=True`` — the previous frame's BEV volume is ego-aligned
(bilinear warp per z-slice, BEVDet4D shift_feature semantics,
bevdet.py BEVDet4D) and channel-concatenated before the BEV encoder.

Stereo (BEVStereo4D) support: set ``stereo=True`` and pass
``prev_stereo_feat`` (+ ``k2s_sensor``) — an early backbone stage provides
stereo features at cv_downsample resolution, and the temporal matching
cost volume (view_transformer.py:585-664) feeds the depth head. The
current frame's stereo features are returned so the caller can carry them
to the next frame (bevdet_occ.py BEVStereo4DOCC extract_stereo_ref_feat).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.prior_fusion import PriorFusion3DVoxel
from .backbones import CustomFPN, CustomResNet3D, LSSFPN3D, ResNet
from .view_transformer import LSSViewTransformer


class ConvStage(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class ImageEncoder(nn.Module):
    """Strided conv backbone + top-level 1x1 neck (stand-in for the
    reference's ResNet50 + CustomFPN, bevdet.py:43-61). Downsamples by
    2^len(widths); emits NHWC features."""

    widths: Sequence[int] = (32, 64, 128, 256)
    neck_channels: int = 256

    stereo_stage: int = 2
    """Backbone stage whose output doubles as the BEVStereo matching
    feature (input/2^stereo_stage resolution; the reference taps its
    ResNet stem the same way, bevdet.py extract_stereo_ref_feat)."""

    @nn.compact
    def __call__(self, imgs, train: bool = False, return_stereo: bool = False):
        # imgs: (B*N, H, W, 3) NHWC in [0, 1].
        x = imgs
        stereo = None
        for i, w in enumerate(self.widths):
            x = ConvStage(w, stride=2)(x, train)
            x = ConvStage(w, stride=1)(x, train)
            if i + 1 == self.stereo_stage:
                stereo = x
        out = nn.Conv(self.neck_channels, (1, 1))(x)
        if return_stereo:
            return out, stereo
        return out


class BEVEncoder3D(nn.Module):
    """3D conv stack on the (B, C, Z, Y, X) BEV volume (stand-in for
    CustomResNet3D + LSSFPN3D, bevdet.py:74-78 consumers)."""

    widths: Sequence[int] = (64, 128)
    out_channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, C, Z, Y, X) -> NDHWC
        h = jnp.transpose(x, (0, 2, 3, 4, 1))
        for w in self.widths:
            h = nn.Conv(w, (3, 3, 3), padding="SAME")(h)
            h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME")(h)
        return jnp.transpose(h, (0, 4, 1, 2, 3))  # back to (B, C, Z, Y, X)


class OccHead(nn.Module):
    """Final 3D conv + softplus predicter (bevdet_occ.py:27-42)."""

    out_dim: int = 32
    num_classes: int = 18
    use_predicter: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, C, Z, Y, X); final_conv is Conv3d k=3.
        h = jnp.transpose(x, (0, 2, 3, 4, 1))  # NDHWC
        out_ch = self.out_dim if self.use_predicter else self.num_classes
        h = nn.Conv(out_ch, (3, 3, 3), padding="SAME")(h)
        # Reference: permute(0,4,3,2,1) on (B, C', Z, Y, X) -> (B, X, Y, Z, C').
        h = jnp.transpose(h, (0, 3, 2, 1, 4))
        if self.use_predicter:
            h = nn.Dense(self.out_dim * 2)(h)
            h = jax.nn.softplus(h)
            h = nn.Dense(self.num_classes)(h)
        return h  # (B, X, Y, Z, num_classes) logits


class BEVDetOcc(nn.Module):
    """Single-frame BEVDet-Occ with the PreSight prior-fusion hook.

    __call__ inputs mirror the reference's prepared img_inputs
    (bevdet.py:81-100): imgs (B, N, 3, H, W) + per-camera geometry, plus the
    voxelized prior tensors from prior/consume.py. Returns (occ_logits
    (B, X, Y, Z, classes), depth (B*N, D, Hf, Wf)).
    """

    grid_config: Dict[str, Tuple[float, float, float]]
    input_size: Tuple[int, int]
    downsample: int = 16
    view_out_channels: int = 64
    img_widths: Sequence[int] = (32, 64, 128, 256)
    neck_channels: int = 256
    backbone: str = "simple"
    """'simple' (strided-conv stand-in, toy tests) or 'resnet' — the
    reference topology: ResNet (depth 50 by default) with out_indices
    (0, 2, 3), stage 0 feeding BEVStereo matching and stages 2/3 the
    CustomFPN (config bevdet-occ-...-randomdrop.py:96-116). base width
    scales for toy runs."""
    resnet_depth: int = 50
    resnet_base_width: int = 64
    bev_neck: str = "simple"
    """'simple' (BEVEncoder3D stand-in) or 'lssfpn3d' — the reference BEV
    encoder: CustomResNet3D num_layer (1,2,4) channels (C,2C,4C) strides
    (1,2,2) + LSSFPN3D 7C->C (config :133-147)."""
    bev_widths: Sequence[int] = (64, 128)
    bev_out_channels: int = 32
    occ_out_dim: int = 32
    num_classes: int = 18
    prior_pc_range: Optional[Sequence[float]] = None
    prior_voxel_size: Optional[Sequence[float]] = None
    prior_in_channels: int = 68
    prior_fusion: str = "voxel"
    """'voxel' (PriorFusion3D_voxel, the shipped configs) or 'crossattn'
    (PriorFusion3D_crossattn, the windowed cross-attention ablation) —
    the reference's prior_fuse_cfg fusion_module_cfg selector
    (bevdet_occ.py:22,51-53)."""
    use_prior_only: bool = False
    temporal: bool = False
    stereo: bool = False
    stereo_stage: int = 2
    """Backbone stage tapped for BEVStereo matching features
    (cv_downsample = 2**stereo_stage)."""

    @nn.compact
    def __call__(self, imgs, sensor2ego, cam2imgs, post_rots, post_trans, bda,
                 prior_feats=None, prior_coords=None, prior_valid=None,
                 prev_bev=None, prev2curr=None,
                 prev_stereo_feat=None, k2s_sensor=None,
                 train: bool = False):
        B, N, _, H, W = imgs.shape
        imgs_nhwc = jnp.transpose(imgs.reshape(B * N, 3, H, W), (0, 2, 3, 1))
        curr_stereo = None
        if self.backbone == "resnet":
            # Reference chain (bevdet.py:43-61): ResNet out_indices (0,2,3),
            # x[0] (stride 4) is the stereo matching feature, x[1:] feed
            # CustomFPN whose single out_id=0 lands at stride 16.
            feats = ResNet(self.resnet_depth, (0, 2, 3),
                           self.resnet_base_width)(imgs_nhwc, train)
            curr_stereo = feats[0] if self.stereo else None
            x = CustomFPN(self.neck_channels, (0,))(feats[1:], train)
            cv_downsample = 4
        else:
            enc = ImageEncoder(self.img_widths, self.neck_channels,
                               stereo_stage=self.stereo_stage)
            if self.stereo:
                x, curr_stereo = enc(imgs_nhwc, train, return_stereo=True)
            else:
                x = enc(imgs_nhwc, train)
            cv_downsample = 2 ** self.stereo_stage
        hf, wf = x.shape[1], x.shape[2]
        x = x.reshape(B, N, hf, wf, -1)
        vt = LSSViewTransformer(
            grid_config=self.grid_config, input_size=self.input_size,
            downsample=self.downsample, in_channels=self.neck_channels,
            out_channels=self.view_out_channels, collapse_z=False,
            stereo=self.stereo, cv_downsample=cv_downsample,
        )
        stereo_metas = None
        if self.stereo:
            hs, ws = curr_stereo.shape[1], curr_stereo.shape[2]
            stereo_metas = dict(
                curr_feat=curr_stereo.reshape(B, N, hs, ws, -1),
                prev_feat=prev_stereo_feat,
                k2s_sensor=k2s_sensor,
            )
        bev, depth = vt(x, sensor2ego, cam2imgs, post_rots, post_trans, bda,
                        stereo_metas, train)  # (B, C, Z, Y, X)

        if self.temporal:
            # BEVDet4D: align the previous frame's BEV volume to the current
            # ego frame (per-z-slice bilinear warp) and concat on channels.
            from ..mapping.conv_gru import warp_bev

            if prev_bev is None:
                prev_bev = jnp.zeros_like(bev)
            if prev2curr is None:
                prev2curr = jnp.broadcast_to(jnp.eye(3), (bev.shape[0], 3, 3))
            gx = self.grid_config["x"]
            gy = self.grid_config["y"]
            roi = (gx[1] - gx[0], gy[1] - gy[0])

            def align_one(vol, p2c):
                # vol (C, Z, Y, X) -> warp each z slice in the (Y, X) plane
                return jax.vmap(lambda sl: warp_bev(sl, p2c, roi),
                                in_axes=1, out_axes=1)(vol)

            aligned = jax.vmap(align_one)(prev_bev, prev2curr)
            bev = jnp.concatenate([bev, aligned], axis=1)
            # fuse back to the single-frame channel count (the reference's
            # pre_process/bev-encoder widening collapsed into one 1x1 conv)
            h = jnp.transpose(bev, (0, 2, 3, 4, 1))
            h = nn.Conv(self.view_out_channels, (1, 1, 1),
                        name="temporal_fuse")(h)
            bev = jnp.transpose(h, (0, 4, 1, 2, 3))

        if prior_feats is not None:
            # Prior injection point (bevdet.py:62-78): permute the volume to
            # (bs, c, h, w, z), optionally blank it (prior-only ablation),
            # fuse, permute back.
            v = jnp.transpose(bev, (0, 1, 3, 4, 2))  # (B, C, Y=h, X=w, Z)
            if self.use_prior_only:
                v = jnp.zeros_like(v)
            if self.prior_fusion == "crossattn":
                from ..models.window_attention import PriorFusion3DCrossAttn

                fusion = PriorFusion3DCrossAttn(
                    prior_pc_range=self.prior_pc_range,
                    prior_voxel_size=self.prior_voxel_size,
                    bev_hidden_channels=self.neck_channels,
                    prior_in_channels=self.prior_in_channels,
                    out_num_z=v.shape[-1],
                    out_channels=v.shape[1],
                    bev_h=v.shape[2], bev_w=v.shape[3],
                    num_bev_win=max(1, v.shape[2] // 2),
                )
            else:
                fusion = PriorFusion3DVoxel(
                    prior_pc_range=self.prior_pc_range,
                    prior_voxel_size=self.prior_voxel_size,
                    bev_hidden_channels=self.neck_channels,
                    prior_in_channels=self.prior_in_channels,
                    out_num_z=v.shape[-1],
                    out_channels=v.shape[1],
                )
            v = fusion(v, prior_feats, prior_coords, prior_valid, train)
            bev = jnp.transpose(v, (0, 1, 4, 2, 3))

        if self.bev_neck == "lssfpn3d":
            c = self.view_out_channels
            h = jnp.transpose(bev, (0, 2, 3, 4, 1))  # NDHWC, D=Z
            feats = CustomResNet3D((1, 2, 4), (c, 2 * c, 4 * c),
                                   (1, 2, 2))(h, train)
            h = LSSFPN3D(c)(feats, train)
            bev = jnp.transpose(h, (0, 4, 1, 2, 3))
        else:
            bev = BEVEncoder3D(self.bev_widths, self.bev_out_channels)(bev, train)
        occ = OccHead(self.occ_out_dim, self.num_classes)(bev, train)
        if self.stereo:
            # Hand the current stereo features back for the next frame.
            hs, ws = curr_stereo.shape[1], curr_stereo.shape[2]
            return occ, depth, curr_stereo.reshape(B, N, hs, ws, -1)
        return occ, depth


def occ_loss(
    logits: jnp.ndarray,  # (B, X, Y, Z, num_classes)
    voxel_semantics: jnp.ndarray,  # (B, X, Y, Z) int labels
    mask_camera: Optional[jnp.ndarray] = None,  # (B, X, Y, Z) 0/1
) -> jnp.ndarray:
    """Occupancy cross-entropy (bevdet_occ.py:55-72): flat CE, optionally
    weighted by the camera-visibility mask and averaged by its sum."""
    num_classes = logits.shape[-1]
    flat_logits = logits.reshape(-1, num_classes)
    flat_labels = voxel_semantics.reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(flat_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, flat_labels[:, None], axis=-1)[:, 0]
    if mask_camera is not None:
        m = mask_camera.reshape(-1).astype(ce.dtype)
        return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(ce)
