"""BEVFormer encoder at reference fidelity, TPU-native.

Reference spec: online-mapping/plugin/models/backbones/bevformer/ and the
shipped config smn_wcamprior_480_100x50_24e_randomdrop.py:85-142 —

  * image backbone: ResNet-50 with DCNv2 at stages 3-4 (:93-94) + FPN over
    three stages -> ``num_feat_levels`` feature maps;
  * encoder layer = TemporalSelfAttention (deformable self-attention over a
    2-frame BEV queue) -> norm -> SpatialCrossAttention wrapping
    MSDeformableAttention3D (multi-LEVEL deformable taps around
    ``num_points_in_pillar`` z-anchor projections per BEV pillar) -> norm
    -> FFN -> norm (:107-135);
  * learned row/column positional encoding (:139-142).

TPU design: every deformable tap is a batched bilinear gather (XLA-native;
the mmcv CUDA kernel's exact sampling semantics), DCNv2 is the same gather
plus a sigmoid modulation mask, and the whole encoder is shape-static.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def pack_bilinear_cells(feat: jnp.ndarray) -> jnp.ndarray:
    """feat (H, W, C) -> packed (H+1, W+1, 4C).

    Row (y0+1, x0+1) holds the 2x2 bilinear neighborhood of floor
    coordinate (y0, x0) — [f(y0,x0), f(y0,x0+1), f(y0+1,x0),
    f(y0+1,x0+1)] — with zeros outside the map. ONE row gather then
    serves all four corners of a bilinear sample. Measured on v5e, XLA
    row-gather cost is per ROW (PERFORMANCE.md round-3 primitive table),
    so this quarters the gather count that dominates every deformable-
    attention / DCN / stereo-cost-volume sampler; the packing itself is
    four shifted slices (pure bandwidth, vectorized)."""
    H, W, C = feat.shape
    fp = jnp.pad(feat, ((1, 1), (1, 1), (0, 0)))
    return jnp.concatenate(
        [fp[0:H + 1, 0:W + 1], fp[0:H + 1, 1:W + 2],
         fp[1:H + 2, 0:W + 1], fp[1:H + 2, 1:W + 2]], axis=-1)


def packed_rows_weights(px: jnp.ndarray, py: jnp.ndarray, H: int, W: int):
    """Index/weight form of a packed bilinear sample: px/py (...,) pixel
    coords over an (H, W) map -> (row (...,) int32 into the flattened
    (H+1, W+1) packed grid, w4 (..., 4) per-corner weights with
    out-of-bounds corners zeroed). ``sum_k rows[row][k*C:(k+1)*C] *
    w4[..., k]`` equals the plain four-gather bilinear sampler."""
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    wx = px - x0
    wy = py - y0
    row = jnp.clip(y0 + 1, 0, H) * (W + 1) + jnp.clip(x0 + 1, 0, W)

    def cw(yy, xx, w):
        valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        return w * valid.astype(px.dtype)

    w4 = jnp.stack(
        [cw(y0, x0, (1 - wy) * (1 - wx)),
         cw(y0, x0 + 1, (1 - wy) * wx),
         cw(y0 + 1, x0, wy * (1 - wx)),
         cw(y0 + 1, x0 + 1, wy * wx)], axis=-1)
    return row, w4


def bilinear_sample_packed(packed: jnp.ndarray, px: jnp.ndarray,
                           py: jnp.ndarray) -> jnp.ndarray:
    """packed (H+1, W+1, 4C) from pack_bilinear_cells; px/py (...,) pixel
    coords -> (..., C), zero padding outside [0, W) x [0, H). Arithmetic
    is corner-for-corner identical to the unpacked sampler."""
    Hp, Wp, C4 = packed.shape
    H, W, C = Hp - 1, Wp - 1, C4 // 4
    row, w4 = packed_rows_weights(px, py, H, W)
    rows = packed.reshape(Hp * Wp, C4)[row]
    r = rows.reshape(*rows.shape[:-1], 4, C)
    return jnp.einsum("...kc,...k->...c", r, w4.astype(packed.dtype))


def bilinear_sample(feat: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """feat (H, W, C); px/py (...,) pixel coords -> (..., C), zero padded."""
    return bilinear_sample_packed(pack_bilinear_cells(feat), px, py)


def deformable_taps(value_heads: jnp.ndarray, px: jnp.ndarray,
                    py: jnp.ndarray) -> jnp.ndarray:
    """Per-head deformable sampling: value_heads (H, W, Hh, hd); px/py
    (Q, Hh, P) per-head pixel coords -> (Q, Hh, P, hd), where head h is
    sampled at its OWN locations from its OWN channel slice.

    Replaces the sample-all-heads-then-take-the-diagonal formulation:
    same tap count, but each gathered row is hd wide instead of Hh*hd —
    an Hh-fold cut of gathered bytes on top of pack_bilinear_cells'
    4x row cut."""
    packed = jax.vmap(pack_bilinear_cells, in_axes=2, out_axes=0)(value_heads)

    def per_head(pk, pxh, pyh):
        return bilinear_sample_packed(pk, pxh, pyh)  # (Q, P, hd)

    return jax.vmap(per_head, in_axes=(0, 1, 1), out_axes=1)(packed, px, py)


class DeformConv2d(nn.Module):
    """DCNv2 (modulated deformable convolution), the C7 native op the
    mapping backbone's stages 3-4 use (smn config :93-94).

    A plain conv branch predicts per-pixel, per-tap offsets and a sigmoid
    modulation mask; the deformable tap is a bilinear gather at
    (p + p_k + Δp_k) scaled by the mask — mmcv ModulatedDeformConv2d
    semantics with deform_groups=1."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        B, H, W, C = x.shape
        k = self.kernel
        off = nn.Conv(3 * k * k, (k, k), strides=(self.stride,) * 2,
                      padding="SAME", kernel_init=nn.initializers.zeros,
                      name="offset_mask")(x)
        Ho, Wo = off.shape[1], off.shape[2]
        offsets = off[..., : 2 * k * k].reshape(B, Ho, Wo, k * k, 2)
        mask = jax.nn.sigmoid(off[..., 2 * k * k:])  # (B, Ho, Wo, k*k)

        ky, kx = np.meshgrid(np.arange(k) - k // 2, np.arange(k) - k // 2,
                             indexing="ij")
        base = jnp.asarray(np.stack([ky.reshape(-1), kx.reshape(-1)], -1),
                           x.dtype)  # (k*k, 2) (dy, dx)
        gy = jnp.arange(Ho, dtype=x.dtype)[:, None, None] * self.stride
        gx = jnp.arange(Wo, dtype=x.dtype)[None, :, None] * self.stride
        py = gy + base[None, None, :, 0] + offsets[..., 0]
        px = gx + base[None, None, :, 1] + offsets[..., 1]

        def per_image(img, py_i, px_i, m_i):
            taps = bilinear_sample(img, px_i, py_i)  # (Ho, Wo, k*k, C)
            return (taps * m_i[..., None]).reshape(Ho, Wo, k * k * C)

        cols = jax.vmap(per_image)(x, py, px, mask)
        w = self.param("kernel_w", nn.initializers.lecun_normal(),
                       (k * k * C, self.features))
        b = self.param("kernel_b", nn.initializers.zeros, (self.features,))
        return cols @ w + b


class TemporalSelfAttention(nn.Module):
    """Deformable self-attention over a 2-frame BEV queue
    (temporal_self_attention.py:25-250): offsets/weights conditioned on
    concat([prev_bev, query]); each head samples ``num_points`` taps from
    BOTH the previous (ego-aligned) and current BEV; the two queues'
    outputs average. With no previous frame the queue holds two copies of
    the current queries (reference :178-181)."""

    embed_dim: int
    bev_hw: Tuple[int, int]
    num_heads: int = 4
    num_points: int = 4

    @nn.compact
    def __call__(self, query, prev_bev: Optional[jnp.ndarray] = None):
        # query (Q, D); prev_bev (Q, D) ego-aligned or None.
        Q, D = query.shape
        H, W = self.bev_hw
        Hh, P = self.num_heads, self.num_points
        head_dim = D // Hh
        if prev_bev is None:
            prev_bev = query

        q_aug = jnp.concatenate([prev_bev, query], axis=-1)  # (Q, 2D)
        offsets = nn.Dense(Hh * 2 * P * 2, name="sampling_offsets")(q_aug)
        offsets = offsets.reshape(Q, Hh, 2, P, 2)
        attn = nn.Dense(Hh * 2 * P, name="attention_weights")(q_aug)
        attn = jax.nn.softmax(attn.reshape(Q, Hh, 2, P), axis=-1)

        value = nn.Dense(D, name="value_proj")(
            jnp.stack([prev_bev, query]))  # (2, Q, D)
        value = value.reshape(2, H, W, Hh, head_dim)

        # Reference points: own cell center in pixel coords.
        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=query.dtype),
                              jnp.arange(W, dtype=query.dtype), indexing="ij")
        ref = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (Q, 2) px,py

        px = ref[:, None, None, None, 0] + offsets[..., 0]  # (Q, Hh, 2, P)
        py = ref[:, None, None, None, 1] + offsets[..., 1]

        def per_queue(val_q, px_q, py_q, attn_q):
            # val_q (H, W, Hh, hd); px_q/py_q/attn_q (Q, Hh, P)
            taps = deformable_taps(val_q, px_q, py_q)  # (Q, Hh, P, hd)
            return jnp.sum(taps * attn_q[..., None], axis=2)  # (Q, Hh, hd)

        outs = jax.vmap(per_queue, in_axes=(0, 2, 2, 2))(
            value, px, py, attn)  # (2, Q, Hh, hd)
        out = outs.mean(axis=0).reshape(Q, D)
        return nn.Dense(D, name="output_proj")(out)


class MSDeformableAttention3D(nn.Module):
    """Multi-scale, multi-z-anchor deformable attention
    (multi_scale_deformable_attn_function.py semantics + BEVFormer's
    spatial_cross_attention.py anchor handling): the ``num_points`` taps per
    (head, level) are SPLIT across the z-anchors under one softmax
    (spatial_cross_attention.py:359-368 reshapes offsets to
    (num_points // num_Z_anchors, num_Z_anchors)), so total attention mass
    per (query, head) is 1 regardless of how many anchors are in-frustum."""

    embed_dim: int
    num_heads: int = 4
    num_points: int = 8
    num_levels: int = 1

    @nn.compact
    def __call__(self, queries, ref_pix, feats, ref_valid):
        """queries (Q, D); ref_pix (A, Q, 2) anchor pixel coords at LEVEL-0
        scale; feats: list of L (Hl, Wl, D) maps (level l at 1/2^l of level
        0); ref_valid (A, Q). Returns (Q, D)."""
        Q, D = queries.shape
        A = ref_pix.shape[0]
        L, Hh, P = self.num_levels, self.num_heads, self.num_points
        head_dim = D // Hh
        assert len(feats) == L

        assert P % A == 0, (
            f"num_points ({P}) must be divisible by the anchor count ({A}) "
            "— reference contract spatial_cross_attention.py:368")
        Pa = P // A  # taps per anchor

        offsets = nn.Dense(Hh * L * P * 2, name="sampling_offsets")(queries)
        offsets = offsets.reshape(Q, Hh, L, Pa, A, 2)
        attn = nn.Dense(Hh * L * P, name="attention_weights")(queries)
        attn = jax.nn.softmax(attn.reshape(Q, Hh, L * P), axis=-1)
        attn = attn.reshape(Q, Hh, L, Pa, A)

        out = jnp.zeros((Q, Hh, head_dim), queries.dtype)
        for l, feat in enumerate(feats):
            value = nn.Dense(D, name=f"value_proj_l{l}")(feat)
            value = value.reshape(*feat.shape[:2], Hh, head_dim)
            scale = 1.0 / (2 ** l)
            # (A, Q, Hh, Pa)
            off_l = offsets[:, :, l].transpose(3, 0, 1, 2, 4)  # (A,Q,Hh,Pa,2)
            px = ref_pix[:, :, None, None, 0] * scale + off_l[..., 0]
            py = ref_pix[:, :, None, None, 1] * scale + off_l[..., 1]
            attn_l = attn[:, :, l].transpose(3, 0, 1, 2)  # (A, Q, Hh, Pa)

            def per_anchor(px_a, py_a, valid_a, attn_a):
                taps = deformable_taps(value, px_a, py_a)  # (Q, Hh, Pa, hd)
                taps = taps * valid_a[:, None, None, None]
                return jnp.sum(taps * attn_a[..., None], axis=2)

            out = out + jnp.sum(
                jax.vmap(per_anchor)(
                    px, py, ref_valid.astype(queries.dtype), attn_l),
                axis=0,
            )
        return out.reshape(Q, D)


class _FusedDeformableCore(nn.Module):
    """Parameter-compatible fused evaluation of per-camera
    MSDeformableAttention3D: identical math (offsets/weights conditioning,
    one softmax across levels x points, per-anchor validity masking), but
    every camera/level/head/anchor tap is served from ONE packed value
    table by ONE row gather per camera.

    Why: the per-(cam, level, anchor, head) formulation issues 576 small
    gathers per encoder layer; measured on v5e at smn reference scale
    (scripts_dev/profile_sca.py) the taps cost 107 ms. Folding heads,
    levels and cams into a single row-indexed table cuts that to 77 ms,
    and compacting each camera's queries to the in-frustum subset
    (``capacity_frac``) to 47 ms. bf16 rows measured NO further gain —
    the gather is row-issue-bound, not bandwidth-bound — so the table
    stays in the working dtype."""

    embed_dim: int
    num_heads: int = 4
    num_points: int = 8
    num_levels: int = 1
    capacity_frac: float = 1.0

    @nn.compact
    def __call__(self, queries, ref_pix, cam_feats, ref_valid):
        """queries (Q, D); ref_pix (N, A, Q, 2) level-0 feature-pixel
        coords; cam_feats: list of L (N, Hl, Wl, C) maps (level l at
        1/2^l of level 0); ref_valid (N, A, Q). Returns (out (Q, D)
        cam-summed and NOT hit-normalized, contrib (Q,) per-query count
        of cameras actually accumulated)."""
        Q, D = queries.shape
        N, A = ref_pix.shape[0], ref_pix.shape[1]
        L, Hh, P = self.num_levels, self.num_heads, self.num_points
        hd = D // Hh
        assert len(cam_feats) == L
        assert P % A == 0, (
            f"num_points ({P}) must be divisible by the anchor count ({A}) "
            "— reference contract spatial_cross_attention.py:368")
        Pa = P // A
        dt = queries.dtype

        offsets = nn.Dense(Hh * L * P * 2, name="sampling_offsets")(queries)
        offsets = offsets.reshape(Q, Hh, L, Pa, A, 2)
        attn = nn.Dense(Hh * L * P, name="attention_weights")(queries)
        attn = jax.nn.softmax(attn.reshape(Q, Hh, L * P), axis=-1)
        attn = attn.reshape(Q, Hh, L, Pa, A)

        # One packed value table per camera: rows ordered (level, head,
        # packed y, packed x), hd floats x 4 corners wide.
        valid_q = ref_valid.transpose(0, 2, 1).astype(dt)  # (N, Q, A)
        tabs, idx_parts, w_parts = [], [], []
        base = 0
        for l, feat in enumerate(cam_feats):
            Hl, Wl = feat.shape[1], feat.shape[2]
            value = nn.Dense(D, name=f"value_proj_l{l}")(feat)
            value = value.reshape(N, Hl, Wl, Hh, hd).transpose(0, 3, 1, 2, 4)
            packed = jax.vmap(jax.vmap(pack_bilinear_cells))(value)
            tabs.append(packed.reshape(N, Hh * (Hl + 1) * (Wl + 1), 4 * hd))

            scale = 1.0 / (2 ** l)
            off_l = offsets[:, :, l]  # (Q, Hh, Pa, A, 2)
            # (N, Q, Hh, Pa, A)
            px = (ref_pix[..., 0].transpose(0, 2, 1) * scale
                  )[:, :, None, None, :] + off_l[None, ..., 0]
            py = (ref_pix[..., 1].transpose(0, 2, 1) * scale
                  )[:, :, None, None, :] + off_l[None, ..., 1]
            row, w4 = packed_rows_weights(px, py, Hl, Wl)
            row = row + (jnp.arange(Hh, dtype=jnp.int32)[None, None, :, None,
                                                         None]
                         * ((Hl + 1) * (Wl + 1)) + base)
            # Fold attention weight and per-anchor validity into the
            # corner weights (exactly what per_anchor masking+weighting
            # does in the unfused path).
            w4 = (w4 * attn[None, :, :, l, ..., None]
                  * valid_q[:, :, None, None, :, None])
            idx_parts.append(row.reshape(N, Q, Hh, Pa * A))
            w_parts.append(w4.reshape(N, Q, Hh, Pa * A, 4))
            base += Hh * (Hl + 1) * (Wl + 1)

        tab = jnp.concatenate(tabs, axis=1)           # (N, S, 4hd)
        idx = jnp.concatenate(idx_parts, axis=3)      # (N, Q, Hh, L*Pa*A)
        w4 = jnp.concatenate(w_parts, axis=3)         # (N, Q, Hh, LPA, 4)
        T = L * Pa * A

        anyvalid = ref_valid.any(axis=1)              # (N, Q)
        K = min(Q, int(np.ceil(Q * self.capacity_frac)))
        out = jnp.zeros((Q, Hh, hd), dt)
        contrib = jnp.zeros((Q,), dt)
        if K < Q:
            # Overflow indicator: number of valid queries DROPPED by the
            # worst camera this call (0 when capacity_frac covers the rig's
            # frustum coverage, as the shipped configs' 0.5 does for the
            # nuScenes 6-camera rig). Sown so callers/tests can audit an
            # unusual rig instead of degrading invisibly:
            # variables['intermediates'][...]['capacity_overflow'].
            n_valid = anyvalid.sum(axis=1)            # (N,)
            self.sow(
                "intermediates", "capacity_overflow",
                jnp.maximum(n_valid.max() - K, 0).astype(jnp.int32),
            )
        for n in range(N):
            if K < Q:
                # Stable argsort puts in-frustum queries first in index
                # order; overflow beyond K (geometrically impossible for a
                # real camera rig at capacity_frac >= its frustum coverage)
                # drops that camera's contribution for the overflowed query
                # AND its count in contrib, keeping the normalization
                # consistent.
                qsel = jnp.argsort(~anyvalid[n], stable=True)[:K]
                slot_ok = anyvalid[n][qsel].astype(dt)
                idx_n = idx[n][qsel]
                w_n = w4[n][qsel] * slot_ok[:, None, None, None]
            else:
                qsel = None
                slot_ok = anyvalid[n].astype(dt)
                idx_n, w_n = idx[n], w4[n]
            rows = tab[n][idx_n.reshape(-1)].reshape(K, Hh, T, 4, hd)
            o_n = jnp.einsum("khtcd,khtc->khd", rows, w_n.astype(dt))
            if qsel is None:
                out = out + o_n
                contrib = contrib + slot_ok
            else:
                out = out.at[qsel].add(o_n)
                contrib = contrib.at[qsel].add(slot_ok)
        return out.reshape(Q, D), contrib


class SpatialCrossAttention(nn.Module):
    """Camera aggregation around MSDeformableAttention3D
    (spatial_cross_attention.py:30-200): each camera's deformable output is
    summed and normalized by the per-query camera-hit count, then projected
    and residually added by the caller.

    The per-camera deformable attention is evaluated by
    ``_FusedDeformableCore`` (one folded row gather per camera + optional
    in-frustum query compaction); its parameter tree and math are
    identical to mapping each camera through MSDeformableAttention3D —
    ``test_mapping.py`` pins the equivalence."""

    embed_dim: int
    num_heads: int = 4
    num_points: int = 8
    num_levels: int = 1
    capacity_frac: float = 1.0

    @nn.compact
    def __call__(self, queries, ref_pix, cam_feats, ref_valid):
        """queries (Q, D); ref_pix (N_cam, A, Q, 2) at level-0 scale;
        cam_feats: list of L arrays (N_cam, Hl, Wl, C); ref_valid
        (N_cam, A, Q)."""
        Q, D = queries.shape
        out, hits = _FusedDeformableCore(
            self.embed_dim, self.num_heads, self.num_points,
            self.num_levels, self.capacity_frac,
            name="deformable_attention",
        )(queries, ref_pix, cam_feats, ref_valid)
        out = out / jnp.maximum(hits, 1.0)[:, None]
        return nn.Dense(D, name="output_proj")(out)


class EncoderLayer(nn.Module):
    """BEVFormerLayer operation order: self_attn -> norm -> cross_attn ->
    norm -> ffn -> norm (config :127-135)."""

    embed_dim: int
    bev_hw: Tuple[int, int]
    num_heads: int = 4
    num_points: int = 4
    num_levels: int = 1
    cross_num_points: int = 8
    sca_capacity_frac: float = 1.0

    @nn.compact
    def __call__(self, bev_q, ref_pix, cam_feats, ref_valid, prev_bev=None):
        h = TemporalSelfAttention(
            self.embed_dim, self.bev_hw, self.num_heads, self.num_points,
            name="temporal_self_attn",
        )(bev_q, prev_bev)
        bev_q = nn.LayerNorm()(bev_q + h)
        h = SpatialCrossAttention(
            self.embed_dim, self.num_heads, self.cross_num_points,
            self.num_levels, self.sca_capacity_frac,
            name="spatial_cross_attn",
        )(bev_q, ref_pix, cam_feats, ref_valid)
        bev_q = nn.LayerNorm()(bev_q + h)
        h = nn.Dense(self.embed_dim * 2)(bev_q)
        h = nn.relu(h)
        h = nn.Dense(self.embed_dim)(h)
        return nn.LayerNorm()(bev_q + h)


def project_bev_to_cameras(
    bev_hw: Tuple[int, int],
    roi_size: Tuple[float, float],
    lidar2img: jnp.ndarray,  # (N_cam, 4, 4)
    img_size: Tuple[int, int],
    feat_size: Tuple[int, int],
    z_anchors: Sequence[float] = (0.0,),
):
    """Pillar points of each BEV cell at ``z_anchors`` heights projected to
    each camera's level-0 FEATURE pixel coords (encoder.py
    point_sampling / num_points_in_pillar). Returns
    (ref_pix (N, A, Q, 2), valid (N, A, Q))."""
    H, W = bev_hw
    rw, rh = roi_size
    xs = (np.arange(W) + 0.5) / W * rw - rw / 2
    ys = (np.arange(H) + 0.5) / H * rh - rh / 2
    gx, gy = np.meshgrid(xs, ys)
    pts = []
    for z in z_anchors:
        pts.append(np.stack(
            [gx, gy, np.full_like(gx, z), np.ones_like(gx)], -1).reshape(-1, 4))
    pts = jnp.asarray(np.stack(pts), jnp.float32)  # (A, Q, 4)
    cam = jnp.einsum("nij,aqj->naqi", lidar2img, pts)
    eps = 1e-5
    depth = cam[..., 2]
    px = cam[..., 0] / jnp.maximum(depth, eps)
    py = cam[..., 1] / jnp.maximum(depth, eps)
    h_img, w_img = img_size
    hf, wf = feat_size
    valid = (depth > eps) & (px >= 0) & (px < w_img) & (py >= 0) & (py < h_img)
    ref = jnp.stack([px * wf / w_img, py * hf / h_img], axis=-1)
    return ref, valid


class BEVEncoder(nn.Module):
    """images -> multi-scale camera features -> L BEVFormer layers -> BEV.

    ``backbone='simple'`` keeps a strided-conv trunk whose last
    ``num_levels`` stages form the pyramid; ``backbone='resnet'`` runs the
    reference ResNet-50 (+DCNv2 at stages 3-4 when ``dcn=True``,
    smn config :85-103) with an FPN over out_indices (1, 2, 3)."""

    bev_hw: Tuple[int, int]
    roi_size: Tuple[float, float]
    img_size: Tuple[int, int]
    embed_dim: int = 64
    num_layers: int = 2
    num_heads: int = 4
    num_points: int = 4
    cross_num_points: int = 8
    num_levels: int = 1
    num_z_anchors: int = 1
    z_range: Tuple[float, float] = (-3.0, 3.0)
    backbone_widths: Sequence[int] = (16, 32, 64)
    backbone: str = "simple"
    resnet_depth: int = 50
    resnet_base_width: int = 64
    dcn: bool = False
    # Per-camera in-frustum query compaction capacity for the spatial
    # cross-attention gather, as a fraction of Q (1.0 = exact/no drop).
    # A camera frustum covers well under half the BEV plane for any real
    # rig, so the reference-named configs ship 0.5 — see
    # _FusedDeformableCore for the measured effect.
    sca_capacity_frac: float = 1.0

    @nn.compact
    def __call__(self, imgs, lidar2img, prev_bev=None, train: bool = False):
        """imgs (N_cam, 3, H, W); lidar2img (N_cam, 4, 4); prev_bev
        (embed_dim, H_bev, W_bev) ego-aligned previous BEV for temporal
        self-attention, or None. Returns BEV (embed_dim, H_bev, W_bev)."""
        N = imgs.shape[0]
        x = imgs.transpose(0, 2, 3, 1)
        levels: List[jnp.ndarray] = []
        if self.backbone == "resnet":
            from ..occupancy.backbones import ResNet

            feats = ResNet(
                self.resnet_depth, (1, 2, 3), self.resnet_base_width,
                name="resnet",
            )(x, train)
            if self.dcn:
                # DCNv2 refinement on the deeper stages (the reference
                # replaces stage 3/4 convs; here one modulated-deformable
                # conv per tapped stage keeps parameter scale test-friendly
                # while exercising the op in the consumed path).
                feats = list(feats)
                feats[1] = DeformConv2d(feats[1].shape[-1], name="dcn_s3")(feats[1])
                feats[2] = DeformConv2d(feats[2].shape[-1], name="dcn_s4")(feats[2])
            # FPN: laterals + top-down, all levels at embed_dim.
            lat = [nn.Conv(self.embed_dim, (1, 1), name=f"fpn_lat{i}")(f)
                   for i, f in enumerate(feats)]
            for i in range(len(lat) - 1, 0, -1):
                up = jax.image.resize(
                    lat[i], (lat[i].shape[0], lat[i - 1].shape[1],
                             lat[i - 1].shape[2], lat[i].shape[3]), "nearest")
                lat[i - 1] = lat[i - 1] + up
            levels = [nn.Conv(self.embed_dim, (3, 3), padding="SAME",
                              name=f"fpn_out{i}")(lat[i])
                      for i in range(self.num_levels)]
        else:
            for i, w in enumerate(self.backbone_widths):
                x = nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME")(x)
                x = nn.BatchNorm(use_running_average=not train)(x)
                x = nn.relu(x)
                if len(self.backbone_widths) - i <= self.num_levels:
                    levels.append(nn.Conv(self.embed_dim, (1, 1),
                                          name=f"neck{i}")(x))
        levels = levels[: self.num_levels]

        H, W = self.bev_hw
        Q = H * W
        bev_q = self.param(
            "bev_queries", nn.initializers.normal(0.02), (Q, self.embed_dim)
        )
        # Learned row/col positional encoding (config :139-142).
        row = self.param("pos_row", nn.initializers.normal(0.02),
                         (H, self.embed_dim // 2))
        col = self.param("pos_col", nn.initializers.normal(0.02),
                         (W, self.embed_dim // 2))
        pos = jnp.concatenate([
            jnp.repeat(row[:, None, :], W, axis=1),
            jnp.repeat(col[None, :, :], H, axis=0),
        ], axis=-1).reshape(Q, self.embed_dim)
        bev_q = bev_q + pos

        if self.num_z_anchors > 1:
            zs = np.linspace(self.z_range[0], self.z_range[1],
                             self.num_z_anchors)
        else:
            zs = [0.0]
        ref_pix, valid = project_bev_to_cameras(
            self.bev_hw, self.roi_size, lidar2img, self.img_size,
            levels[0].shape[1:3], z_anchors=tuple(zs),
        )
        prev_flat = None
        if prev_bev is not None:
            prev_flat = prev_bev.reshape(self.embed_dim, Q).T
        h = bev_q
        for i in range(self.num_layers):
            h = EncoderLayer(
                self.embed_dim, self.bev_hw, self.num_heads, self.num_points,
                self.num_levels, self.cross_num_points,
                self.sca_capacity_frac, name=f"layer{i}",
            )(h, ref_pix, [lv for lv in levels], valid, prev_flat)
        return h.reshape(H, W, self.embed_dim).transpose(2, 0, 1)
