"""Image/BEV backbones at reference fidelity: ResNet + CustomFPN (2D) and
CustomResNet3D + LSSFPN3D (BEV), as flax modules in NHWC/NDHWC.

Reference specs:
  * torchvision-style ResNet ('pytorch' style, BN, 7x7/2 stem + 3x3/2
    maxpool, Bottleneck for depth>=50) — occupancy config
    bevdet-occ-r50d-8x4-24e_wcamprior_randomdrop.py:96-109 (depth=50,
    out_indices=(0, 2, 3); index 0 feeds BEVStereo matching, 2/3 feed the
    FPN).
  * CustomFPN (occupancy/mmdet3d/models/necks/fpn.py:11-170): lateral 1x1
    convs, nearest-upsample top-down sum, 3x3 output convs on ``out_ids``
    (the shipped config keeps only out 0 at 1/16 resolution, 256 channels).
  * CustomResNet3D (models/backbones/resnet.py:89-170): per-stage
    BasicBlock3D chains (3x3x3 conv-BN-ReLU x2 + 3x3x3-conv downsample
    skip), config num_layer=[1,2,4], channels=[C,2C,4C], stride=[1,2,2].
  * LSSFPN3D (models/necks/lss_fpn.py:105-137): trilinear-upsample the
    deeper stages x2/x4, channel-concat (7C), 1x1 Conv3d+BN+ReLU to C.

Width scales through ``base_width`` so tests run the exact topology at toy
channel counts.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3-BN-ReLU-3x3-BN + skip."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False)(x)
            identity = nn.BatchNorm(use_running_average=not train)(identity)
        return nn.relu(h + identity)


class Bottleneck(nn.Module):
    """torchvision Bottleneck ('pytorch' style: stride on the 3x3):
    1x1 reduce - 3x3 (stride) - 1x1 expand(x4) + skip."""

    features: int  # bottleneck width; output is 4x
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * 4
        identity = x
        h = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False)(x)
            identity = nn.BatchNorm(use_running_average=not train)(identity)
        return nn.relu(h + identity)


_RESNET_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                  101: (3, 4, 23, 3)}


class ResNet(nn.Module):
    """torchvision-style ResNet trunk, NHWC. Returns the stage outputs at
    ``out_indices`` (stage i has stride 4 * 2^i). depth >= 50 uses
    Bottleneck (output channels 4 * width)."""

    depth: int = 50
    out_indices: Tuple[int, ...] = (0, 2, 3)
    base_width: int = 64
    """Stage-0 width; the reference is 64 (stages 64/128/256/512, x4 with
    Bottleneck). Smaller values keep the exact topology at toy cost."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.depth not in _RESNET_LAYERS:
            raise ValueError(f"unsupported ResNet depth {self.depth}")
        blocks_per_stage = _RESNET_LAYERS[self.depth]
        bottleneck = self.depth >= 50

        h = nn.Conv(self.base_width, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")

        outs = []
        for i, n_blocks in enumerate(blocks_per_stage):
            width = self.base_width * (2 ** i)
            stride = 1 if i == 0 else 2
            for b in range(n_blocks):
                Block = Bottleneck if bottleneck else BasicBlock
                h = Block(width, stride=stride if b == 0 else 1)(h, train)
            if i in self.out_indices:
                outs.append(h)
        return outs


class CustomFPN(nn.Module):
    """FPN with nearest top-down upsampling (necks/fpn.py:11-170); returns
    the ``out_ids`` outputs only (the shipped config: out_ids=[0])."""

    out_channels: int = 256
    out_ids: Tuple[int, ...] = (0,)

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        laterals = [nn.Conv(self.out_channels, (1, 1), name=f"lateral_{i}")(x)
                    for i, x in enumerate(inputs)]
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(
                laterals[i],
                (laterals[i].shape[0], laterals[i - 1].shape[1],
                 laterals[i - 1].shape[2], laterals[i].shape[3]),
                method="nearest",
            )
            laterals[i - 1] = laterals[i - 1] + up
        outs = [nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        name=f"fpn_{i}")(laterals[i]) for i in self.out_ids]
        return outs[0] if len(outs) == 1 else outs


class BasicBlock3D(nn.Module):
    """resnet.py:89-128 BasicBlock3D: two 3x3x3 Conv3d+BN (ReLU after the
    first), 3x3x3-conv downsample skip when shape changes."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: NDHWC
        identity = x
        h = nn.Conv(self.features, (3, 3, 3), strides=(self.stride,) * 3,
                    padding="SAME", use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3, 3), padding="SAME", use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            # The reference downsample is a full 3x3x3 conv (resnet.py:139).
            identity = nn.Conv(self.features, (3, 3, 3),
                               strides=(self.stride,) * 3, padding="SAME")(x)
        return nn.relu(h + identity)


class CustomResNet3D(nn.Module):
    """Per-stage BasicBlock3D chains (resnet.py:131-170). Returns the
    outputs listed in ``output_ids``."""

    num_layer: Tuple[int, ...] = (1, 2, 4)
    num_channels: Tuple[int, ...] = (32, 64, 128)
    stride: Tuple[int, ...] = (1, 2, 2)
    output_ids: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: NDHWC
        out_ids = (tuple(range(len(self.num_layer)))
                   if self.output_ids is None else self.output_ids)
        outs = []
        h = x
        for i, (n, ch, st) in enumerate(
                zip(self.num_layer, self.num_channels, self.stride)):
            for b in range(n):
                h = BasicBlock3D(ch, stride=st if b == 0 else 1)(h, train)
            if i in out_ids:
                outs.append(h)
        return outs


def _trilinear_resize(x, shape):
    """align_corners=True trilinear upsample (lss_fpn.py:111-114 semantics
    for integer scale factors on NDHWC tensors)."""
    # jax.image.resize 'trilinear' is align_corners=False; emulate
    # align_corners=True by explicit linear interpolation on the 3 axes.
    n, d, h, w, c = x.shape
    D, H, W = shape

    def axis_weights(size_in, size_out):
        if size_out == 1 or size_in == 1:
            idx = jnp.zeros((size_out,), jnp.int32)
            return idx, idx, jnp.zeros((size_out,), x.dtype)
        pos = jnp.arange(size_out, dtype=x.dtype) * (size_in - 1) / (size_out - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, size_in - 1)
        hi = jnp.clip(lo + 1, 0, size_in - 1)
        return lo, hi, (pos - lo.astype(x.dtype))

    for axis, size_out in ((1, D), (2, H), (3, W)):
        size_in = x.shape[axis]
        if size_in == size_out:
            continue
        lo, hi, t = axis_weights(size_in, size_out)
        xl = jnp.take(x, lo, axis=axis)
        xh = jnp.take(x, hi, axis=axis)
        shape_t = [1] * x.ndim
        shape_t[axis] = size_out
        x = xl + (xh - xl) * t.reshape(shape_t)
    return x


class LSSFPN3D(nn.Module):
    """lss_fpn.py:105-137: upsample x2/x4 (trilinear, align_corners=True),
    concat channels, 1x1x1 Conv3d + BN + ReLU."""

    out_channels: int

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        x8, x16, x32 = feats  # NDHWC
        target = x8.shape[1:4]
        x16 = _trilinear_resize(x16, target)
        x32 = _trilinear_resize(x32, target)
        h = jnp.concatenate([x8, x16, x32], axis=-1)
        h = nn.Conv(self.out_channels, (1, 1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        return nn.relu(h)
