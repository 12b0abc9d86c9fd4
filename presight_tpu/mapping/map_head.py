"""MapDetectorHead: DETR-style vector-map decoding with streaming queries,
at reference fidelity.

Reference spec: online-mapping/plugin/models/heads/MapDetectorHead.py (830
LoC) + plugin/models/transformer_utils/MapTransformer.py:24-155 and the
shipped config smn_wcamprior_480_100x50_24e_randomdrop.py:144-210:

  * each query carries ``num_points`` normalized 2D reference points,
    initialized by ``reference_points_embed`` (MapDetectorHead.py:290-291);
  * decoder layer = MultiheadAttention self-attn -> norm ->
    CustomMSDeformableAttention (deformable taps around the query's OWN
    reference points on the BEV map) -> norm -> FFN -> norm;
  * after every layer the per-layer reg branch re-predicts the points
    (predict_refine=False: new_ref = sigmoid(reg); the refine variant adds
    to inverse-sigmoid of the current refs) and the refs are detached
    (MapTransformer.py:133-146) — deep supervision runs on every layer;
  * streaming: at ``prop_add_stage`` the top-(Q - topk) scoring current
    queries are kept and the propagated queries + their ego-transformed
    reference points are prepended (MapTransformer.py:97-114); the
    propagated queries first pass a pose-conditioned MotionMLP
    (``query_update``) and a transformation loss supervises their
    regression against ego-transformed previous targets
    (MapDetectorHead.py:193-298).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .bev_encoder import deformable_taps


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x / (1.0 - x))


class DecoderDeformableAttention(nn.Module):
    """CustomMSDeformableAttention (single level): per head one learned
    offset + weight around each of the query's ``num_points`` reference
    points; softmax over points."""

    embed_dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, queries, ref_pts, bev_hwc):
        """queries (Q, D); ref_pts (Q, P, 2) normalized [0,1] (x, y);
        bev_hwc (H, W, D). Returns (Q, D)."""
        Q, D = queries.shape
        P = ref_pts.shape[1]
        Hh = self.num_heads
        head_dim = D // Hh
        H, W = bev_hwc.shape[:2]

        offsets = nn.Dense(Hh * P * 2, name="sampling_offsets")(queries)
        offsets = offsets.reshape(Q, Hh, P, 2)
        attn = nn.Dense(Hh * P, name="attention_weights")(queries)
        attn = jax.nn.softmax(attn.reshape(Q, Hh, P), axis=-1)

        value = nn.Dense(D, name="value_proj")(bev_hwc)  # (H, W, D)
        px = ref_pts[:, None, :, 0] * W + offsets[..., 0]  # (Q, Hh, P)
        py = ref_pts[:, None, :, 1] * H + offsets[..., 1]
        taps = deformable_taps(
            value.reshape(H, W, Hh, head_dim), px, py)  # (Q, Hh, P, hd)
        out = jnp.sum(taps * attn[..., None], axis=2).reshape(Q, D)
        return nn.Dense(D, name="output_proj")(out)


class DecoderLayer(nn.Module):
    """operation order self_attn -> norm -> cross_attn -> norm -> ffn ->
    norm (config :205-209)."""

    embed_dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, q, bev_hwc, ref_pts, query_pos):
        h = nn.MultiHeadDotProductAttention(num_heads=self.num_heads)(
            q + query_pos, q + query_pos, q)
        q = nn.LayerNorm()(q + h)
        h = DecoderDeformableAttention(self.embed_dim, self.num_heads,
                                       name="cross_attn")(
            q + query_pos, ref_pts, bev_hwc)
        q = nn.LayerNorm()(q + h)
        h = nn.Dense(self.embed_dim * 2)(q)
        h = nn.relu(h)
        h = nn.Dense(self.embed_dim)(h)
        return nn.LayerNorm()(q + h)


class MotionMLP(nn.Module):
    """query_update (MapDetectorHead streaming): propagated queries
    conditioned on the flattened (3, 4) prev->curr ego transform."""

    embed_dim: int

    @nn.compact
    def __call__(self, q, pose_encoding):
        # q (k, D); pose_encoding (12,)
        h = jnp.concatenate(
            [q, jnp.broadcast_to(pose_encoding, (q.shape[0], 12))], axis=-1)
        h = nn.Dense(self.embed_dim, name="fc1")(h)
        h = nn.relu(h)
        return nn.Dense(self.embed_dim, name="fc2")(h)


class MapDetectorHead(nn.Module):
    """BEV (C, H, W) -> per-layer (class logits, polyline points) with
    streaming query propagation. Single-sample (vmap for batches)."""

    num_queries: int = 50
    num_classes: int = 3
    num_points: int = 20
    embed_dim: int = 64
    num_layers: int = 2
    num_heads: int = 4
    roi_size: Tuple[float, float] = (60.0, 30.0)
    topk_propagate: int = 10
    prop_add_stage: int = 1
    predict_refine: bool = False

    @nn.compact
    def __call__(self, bev, prev_queries: Optional[jnp.ndarray] = None,
                 prev_ref_pts: Optional[jnp.ndarray] = None,
                 prev2curr: Optional[jnp.ndarray] = None):
        """bev (C, H, W); prev_queries (topk, D) + prev_ref_pts
        (topk, P, 2 normalized) + prev2curr (4, 4) for streaming (all None
        on the first frame). Returns dict with per-layer deep-supervision
        stacks, final scores/lines, and the streaming hand-off tensors."""
        C, H, W = bev.shape
        Q, P = self.num_queries, self.num_points
        bev_hwc = nn.Dense(self.embed_dim, name="bev_proj")(
            bev.reshape(C, H * W).T).reshape(H, W, self.embed_dim)
        pos = self.param("bev_pos", nn.initializers.normal(0.02),
                         (H, W, self.embed_dim))
        bev_hwc = bev_hwc + pos

        q = self.param("queries", nn.initializers.normal(0.02),
                       (Q, self.embed_dim))
        query_pos = self.param("query_pos", nn.initializers.normal(0.02),
                               (Q, self.embed_dim))
        # Per-layer branches instantiated once (called twice per layer:
        # refinement + the propagation pre-pass reuse the same weights).
        cls_heads = [nn.Dense(self.num_classes, name=f"cls_head{lid}")
                     for lid in range(self.num_layers)]
        reg_hiddens = [nn.Dense(self.embed_dim, name=f"reg_hidden{lid}")
                       for lid in range(self.num_layers)]
        reg_heads = [nn.Dense(self.num_points * 2, name=f"reg_head{lid}")
                     for lid in range(self.num_layers)]

        def reg_branch(x, lid):
            return reg_heads[lid](nn.relu(reg_hiddens[lid](x)))
        # Init reference points from the query embedding
        # (MapDetectorHead.py:290-291).
        ref = jax.nn.sigmoid(
            nn.Dense(P * 2, name="reference_points_embed")(q)
        ).reshape(Q, P, 2)

        # Streaming propagation pre-pass (MapDetectorHead.py:193-298):
        # pose-conditioned query update + f64 ego transform of the refs.
        prop_q = None
        prop_ref = None
        prop_pred_points = None
        if prev_queries is not None and prev2curr is not None:
            pose_encoding = prev2curr[:3].reshape(-1).astype(jnp.float32)
            prop_q = prev_queries + MotionMLP(
                self.embed_dim, name="query_update")(prev_queries, pose_encoding)
            rw, rh = self.roi_size
            roi = jnp.asarray([rw, rh])
            origin = jnp.asarray([-rw / 2, -rh / 2])
            den = prev_ref_pts * roi + origin  # (k, P, 2) ego meters
            den4 = jnp.concatenate([
                den, jnp.zeros((*den.shape[:2], 1)),
                jnp.ones((*den.shape[:2], 1))], axis=-1)
            cur = jnp.einsum("lk,ijk->ijl",
                             prev2curr.astype(jnp.float64),
                             den4.astype(jnp.float64)).astype(jnp.float32)
            prop_ref = jnp.clip((cur[..., :2] - origin) / roi, 0.0, 1.0)
            # Transformation-loss prediction: the LAST reg branch applied to
            # the updated queries (MapDetectorHead.py:244-246).
            prop_pred_points = jax.nn.sigmoid(
                reg_branch(prop_q, self.num_layers - 1)
            ).reshape(-1, P, 2)

        all_scores = []
        all_pts = []
        for lid in range(self.num_layers):
            if (lid == self.prop_add_stage and prop_q is not None):
                # Keep the top-(Q - topk) current queries by max class
                # score, prepend the propagated set (MapTransformer.py:
                # 97-114). stop_gradient mirrors the reference's no_grad.
                k = prop_q.shape[0]
                scores_now = jax.lax.stop_gradient(
                    cls_heads[lid](q).max(axis=-1))
                keep = jax.lax.top_k(scores_now, Q - k)[1]
                q = jnp.concatenate([prop_q, q[keep]], axis=0)
                ref = jnp.concatenate([prop_ref, ref[keep]], axis=0)

            q = DecoderLayer(self.embed_dim, self.num_heads,
                             name=f"dec{lid}")(q, bev_hwc, ref, query_pos)
            reg = reg_branch(q, lid).reshape(Q, P, 2)
            if self.predict_refine:
                new_ref = jax.nn.sigmoid(reg + inverse_sigmoid(ref))
            else:
                new_ref = jax.nn.sigmoid(reg)
            all_scores.append(cls_heads[lid](q))
            all_pts.append(new_ref)
            ref = jax.lax.stop_gradient(new_ref)

        rw, rh = self.roi_size
        lines = (all_pts[-1] - 0.5) * jnp.asarray([rw, rh])
        out = {
            "scores": all_scores[-1],
            "lines": lines,
            "queries": q,
            "ref_pts": ref,  # normalized, for streaming propagation
            "all_scores": jnp.stack(all_scores),  # (L, Q, classes)
            "all_pts": jnp.stack(all_pts),  # (L, Q, P, 2) normalized
        }
        if prop_pred_points is not None:
            out["prop_pred_points"] = prop_pred_points
        return out


def select_topk_for_propagation(out: Dict, k: int):
    """Streaming hand-off (MapDetectorHead forward_train tail): the top-k
    queries by max class score, with their reference points, become the next
    frame's propagated set."""
    scores = out["scores"].max(axis=-1)
    idx = jax.lax.top_k(scores, k)[1]
    return out["queries"][idx], out["ref_pts"][idx]


def transform_targets(prev_targets: jnp.ndarray, prev2curr: jnp.ndarray,
                      roi_size: Tuple[float, float]) -> jnp.ndarray:
    """Ego-transform normalized polyline targets (MapDetectorHead.py:
    255-268): denormalize, lift to homogeneous 3D (z=0), apply prev2curr,
    renormalize, clip to [0, 1]."""
    rw, rh = roi_size
    roi = jnp.asarray([rw, rh])
    origin = jnp.asarray([-rw / 2, -rh / 2])
    den = prev_targets * roi + origin
    den4 = jnp.concatenate([
        den, jnp.zeros((*den.shape[:-1], 1)),
        jnp.ones((*den.shape[:-1], 1))], axis=-1)
    cur = jnp.einsum("lk,...k->...l", prev2curr.astype(jnp.float32), den4)
    return jnp.clip((cur[..., :2] - origin) / roi, 0.0, 1.0)


def greedy_match(pred_lines: np.ndarray, gt_lines: np.ndarray) -> np.ndarray:
    """Host-side optimal assignment (Hungarian, like the reference's
    matcher) on mean point-to-point L2 cost; returns (num_gt,) pred
    indices. Falls back to greedy nearest-unassigned without scipy."""
    if len(gt_lines) == 0:
        return np.zeros((0,), np.int32)
    cost = np.linalg.norm(
        pred_lines[:, None] - gt_lines[None], axis=-1
    ).mean(-1)  # (Q, G)
    try:
        from scipy.optimize import linear_sum_assignment

        rows, cols = linear_sum_assignment(cost)
        assigned = np.zeros(len(gt_lines), np.int32)
        assigned[cols] = rows.astype(np.int32)
        return assigned
    except ImportError:  # pragma: no cover
        assigned = np.full(len(gt_lines), -1, np.int32)
        used = np.zeros(len(pred_lines), bool)
        order = np.argsort(cost.min(0))
        for g in order:
            c = np.where(used, np.inf, cost[:, g])
            p = int(np.argmin(c))
            assigned[g] = p
            used[p] = True
        return assigned


def map_losses(outputs: Dict, gt_lines: jnp.ndarray, gt_labels: jnp.ndarray,
               assignment: jnp.ndarray, num_classes: int = 3,
               roi_size: Tuple[float, float] = (60.0, 30.0),
               prop_targets: Optional[jnp.ndarray] = None,
               trans_loss_weight: float = 0.1) -> Dict:
    """Deep-supervised classification CE + L1 point regression over every
    decoder layer (MapDetectorHead loss shape), plus the streaming
    transformation loss when propagated targets are given."""
    all_scores = outputs["all_scores"]  # (L, Q, classes)
    all_pts = outputs["all_pts"]  # (L, Q, P, 2) normalized
    L, Q = all_scores.shape[:2]
    G = gt_labels.shape[0]
    rw, rh = roi_size
    roi = jnp.asarray([rw, rh])

    target = jnp.full((Q,), num_classes, jnp.int32)  # background slot
    target = target.at[assignment].set(gt_labels.astype(jnp.int32))
    gt_norm = gt_lines / roi + 0.5  # normalized targets

    cls_total = 0.0
    reg_total = 0.0
    for lid in range(L):
        logits = jnp.pad(all_scores[lid], ((0, 0), (0, 1)))
        logp = jax.nn.log_softmax(logits, axis=-1)
        cls_total = cls_total - jnp.mean(
            jnp.take_along_axis(logp, target[:, None], axis=-1))
        matched = all_pts[lid][assignment]  # (G, P, 2)
        if G:
            reg_total = reg_total + jnp.mean(jnp.abs(matched - gt_norm))
    losses = {"cls_loss": cls_total / L, "reg_loss": reg_total / L}
    if prop_targets is not None and "prop_pred_points" in outputs:
        # MapDetectorHead.py:248-268: L1 between the updated propagated
        # queries' regression and the ego-transformed previous targets;
        # all-zero target rows mark background (weight 0).
        pred = outputs["prop_pred_points"]
        fg = jnp.any(prop_targets.reshape(prop_targets.shape[0], -1) != 0.0,
                     axis=-1)
        per = jnp.abs(pred - prop_targets).mean(axis=(1, 2))
        losses["trans_loss"] = trans_loss_weight * jnp.sum(
            per * fg) / jnp.maximum(jnp.sum(fg), 1e-10)
    return losses
