"""Streaming BEV memory: ego-motion warp + ConvGRU fuse.

Reference spec: online-mapping/plugin/models/necks/gru.py:9-41 (ConvGRU:
1x1 convs for z/r/q gates + LayerNorm over channels) and the warp in
StreamMapNet.update_bev_feature (StreamMapNet.py:120-155: previous BEV
grid-sampled into the current ego frame before fusing).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def warp_bev(prev_bev: jnp.ndarray, prev2curr: jnp.ndarray,
             roi_size: Tuple[float, float]) -> jnp.ndarray:
    """Resample the previous BEV feature into the current ego frame.

    prev_bev: (C, H, W) with x (roi width) along W, y along H, ego-centered.
    prev2curr: (3, 3) 2D SE transform mapping previous-frame ego coords to
    current-frame ego coords (rotation+translation in meters).
    """
    C, H, W = prev_bev.shape
    rw, rh = roi_size
    # current-frame pixel centers in metric ego coords
    xs = (jnp.arange(W) + 0.5) / W * rw - rw / 2
    ys = (jnp.arange(H) + 0.5) / H * rh - rh / 2
    gx, gy = jnp.meshgrid(xs, ys)
    ones = jnp.ones_like(gx)
    cur = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)
    # locate each current pixel in the PREVIOUS frame
    curr2prev = jnp.linalg.inv(prev2curr)
    prev_pts = jnp.einsum("ij,hwj->hwi", curr2prev, cur)
    px = (prev_pts[..., 0] + rw / 2) / rw * W - 0.5
    py = (prev_pts[..., 1] + rh / 2) / rh * H - 0.5

    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    wx = px - x0
    wy = py - y0

    def tap(yy, xx):
        valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        v = prev_bev[:, yy, xx]  # (C, H, W)
        return v * valid[None].astype(prev_bev.dtype)

    out = (
        tap(y0, x0) * ((1 - wy) * (1 - wx))[None]
        + tap(y0, x0 + 1) * ((1 - wy) * wx)[None]
        + tap(y0 + 1, x0) * (wy * (1 - wx))[None]
        + tap(y0 + 1, x0 + 1) * (wy * wx)[None]
    )
    return out


class ConvGRU(nn.Module):
    """gru.py:9-41: z/r/q gates from 1x1 convs over [h, x], LayerNorm out."""

    channels: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        # h, x: (C, H, W) -> NHWC for flax convs
        hx = jnp.concatenate([h, x], axis=0)[None].transpose(0, 2, 3, 1)
        z = jax.nn.sigmoid(nn.Conv(self.channels, (1, 1), use_bias=False,
                                   name="convz")(hx))
        r = jax.nn.sigmoid(nn.Conv(self.channels, (1, 1), use_bias=False,
                                   name="convr")(hx))
        h_nhwc = h[None].transpose(0, 2, 3, 1)
        x_nhwc = x[None].transpose(0, 2, 3, 1)
        rh_x = jnp.concatenate([r * h_nhwc, x_nhwc], axis=-1)
        q = nn.Conv(self.channels, (1, 1), use_bias=False, name="convq")(rh_x)
        out = (1 - z) * h_nhwc + z * q
        out = nn.LayerNorm()(out)
        return out[0].transpose(2, 0, 1)  # back to (C, H, W)
