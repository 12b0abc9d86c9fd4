"""Vectorized-map evaluation: chamfer-distance average precision.

Reference spec: online-mapping/plugin/datasets/evaluation/vector_eval.py
(:22-310), AP.py (:7-137) and distance.py — per-class, per-threshold
greedy matching of score-sorted predicted polylines to ground-truth
polylines by symmetric chamfer distance, then area-mode AP over the
score-ranked PR curve; mAP = mean over classes of the threshold-mean AP.
Thresholds {0.5, 1.0, 1.5} m for the 60x30 m ROI ({1.0, 1.5, 2.0} for
100x50), 200 interpolated points per line.

Implementation is pure numpy and decoupled from mmcv datasets: the caller
provides {token: {"vectors", "scores", "labels"}} predictions and
{token: {label: [lines]}} ground truth.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

INTERP_NUM = 200
THRESHOLDS_60x30 = (0.5, 1.0, 1.5)
THRESHOLDS_100x50 = (1.0, 1.5, 2.0)
MAP_CLASSES = {0: "ped_crossing", 1: "divider", 2: "boundary"}


def interp_fixed_num(points: np.ndarray, num_pts: int = INTERP_NUM) -> np.ndarray:
    """Arclength-uniform polyline resampling (vector_eval.py:120-160, the
    av2 interpolate recipe)."""
    points = np.asarray(points, np.float64)
    if points.ndim != 2:
        raise ValueError("polyline must be (N, 2) or (N, 3)")
    n = points.shape[0]
    t = np.linspace(0.0, 1.0, num_pts)
    chordlen = np.linalg.norm(np.diff(points, axis=0), axis=1)
    total = chordlen.sum()
    if total <= 0:
        return np.repeat(points[:1], num_pts, axis=0)
    chordlen = chordlen / total
    cumarc = np.zeros(len(chordlen) + 1)
    cumarc[1:] = np.cumsum(chordlen)
    tbins = np.digitize(t, bins=cumarc).astype(int)
    tbins[(tbins <= 0) | (t <= 0)] = 1
    tbins[(tbins >= n) | (t >= 1)] = n - 1
    s = (t - cumarc[tbins - 1]) / chordlen[tbins - 1]
    return points[tbins - 1] + (points[tbins] - points[tbins - 1]) * s[:, None]


def chamfer_distance(line1: np.ndarray, line2: np.ndarray) -> float:
    """Symmetric chamfer distance of two interpolated lines
    (distance.py:7-24)."""
    d = np.linalg.norm(line1[:, None, :] - line2[None, :, :], axis=-1)
    return float((d.min(1).sum() / len(line1) + d.min(0).sum() / len(line2)) / 2)


def chamfer_distance_batch(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """(M, P, D) x (N, P, D) -> (M, N) chamfer matrix (distance.py:40-60)."""
    d = np.linalg.norm(pred[:, None, :, None, :] - gt[None, :, None, :, :],
                       axis=-1)  # (M, N, P, P)
    p = pred.shape[1]
    return (d.min(3).sum(2) / p + d.min(2).sum(2) / p) / 2


def instance_match(pred_lines: np.ndarray, scores: np.ndarray,
                   gt_lines: np.ndarray, thresholds: Sequence[float]):
    """Greedy TP/FP assignment per threshold (AP.py:52-137): each pred's
    nearest gt; score-descending pass marks a pred TP iff its chamfer min
    is under the threshold and its nearest gt is uncovered."""
    num_preds, num_gts = len(pred_lines), len(gt_lines)
    out = []
    if num_gts == 0 or num_preds == 0:
        tp = np.zeros(num_preds, np.float32)
        fp = np.ones(num_preds, np.float32) if num_gts == 0 else tp.copy()
        return [(tp.copy(), fp.copy()) for _ in thresholds]

    matrix = chamfer_distance_batch(pred_lines, gt_lines)
    matrix_min = matrix.min(axis=1)
    matrix_argmin = matrix.argmin(axis=1)
    sort_inds = np.argsort(-scores)
    for thr in thresholds:
        tp = np.zeros(num_preds, np.float32)
        fp = np.zeros(num_preds, np.float32)
        covered = np.zeros(num_gts, bool)
        for i in sort_inds:
            if matrix_min[i] <= thr:
                j = matrix_argmin[i]
                if not covered[j]:
                    covered[j] = True
                    tp[i] = 1
                else:
                    fp[i] = 1
            else:
                fp[i] = 1
        out.append((tp, fp))
    return out


def average_precision(recalls: np.ndarray, precisions: np.ndarray) -> float:
    """Area-mode AP (AP.py:7-50)."""
    mrec = np.concatenate([[0.0], recalls, [1.0]])
    mpre = np.concatenate([[0.0], precisions, [0.0]])
    for i in range(len(mpre) - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    ind = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[ind + 1] - mrec[ind]) * mpre[ind + 1]))


class VectorEvaluate:
    """Chamfer-AP evaluator decoupled from mmcv (vector_eval.py:22-310).

    gts: {token: {label: [polyline (Ni, 2)]}}
    results: {token: {"vectors": [poly], "scores": [float], "labels": [int]}}
    """

    def __init__(self, gts: Dict, thresholds: Sequence[float] = THRESHOLDS_60x30,
                 classes: Dict[int, str] = MAP_CLASSES,
                 interp_num: int = INTERP_NUM):
        self.gts = gts
        self.thresholds = tuple(thresholds)
        self.classes = dict(classes)
        self.interp_num = interp_num

    def _interp_all(self, lines: List) -> np.ndarray:
        if not lines:
            return np.zeros((0, self.interp_num, 2))
        return np.stack([interp_fixed_num(np.asarray(v), self.interp_num)
                         for v in lines])

    def evaluate(self, results: Dict) -> Dict[str, float]:
        num_gts = {label: 0 for label in self.classes}
        tpfp = {label: {thr: [] for thr in self.thresholds}
                for label in self.classes}
        for token, gt in self.gts.items():
            pred = results.get(token, {"vectors": [], "scores": [], "labels": []})
            for label in self.classes:
                vectors = [v for v, lb in zip(pred["vectors"], pred["labels"])
                           if lb == label]
                scores = np.asarray(
                    [s for s, lb in zip(pred["scores"], pred["labels"])
                     if lb == label], np.float64)
                gt_lines = self._interp_all(gt.get(label, []))
                pred_lines = self._interp_all(vectors)
                num_gts[label] += len(gt_lines)
                matched = instance_match(pred_lines, scores, gt_lines,
                                         self.thresholds)
                for thr, (tp, fp) in zip(self.thresholds, matched):
                    tpfp[label][thr].append(
                        np.stack([tp, fp, scores.astype(np.float32)], -1)
                        if len(tp) else np.zeros((0, 3), np.float32))

        out: Dict[str, float] = {}
        mAP = 0.0
        for label, name in self.classes.items():
            ap_sum = 0.0
            for thr in self.thresholds:
                rows = np.concatenate(tpfp[label][thr]) if tpfp[label][thr] \
                    else np.zeros((0, 3), np.float32)
                order = np.argsort(-rows[:, 2])
                tp = np.cumsum(rows[order, 0])
                fp = np.cumsum(rows[order, 1])
                eps = np.finfo(np.float32).eps
                recalls = tp / max(num_gts[label], eps)
                precisions = tp / np.maximum(tp + fp, eps)
                ap = average_precision(recalls, precisions)
                out[f"{name}_AP@{thr}"] = ap
                ap_sum += ap
            out[f"{name}_AP"] = ap_sum / len(self.thresholds)
            mAP += out[f"{name}_AP"]
        out["mAP"] = mAP / len(self.classes)
        return out


def raster_evaluate(preds: Dict[str, np.ndarray], gts: Dict[str, np.ndarray],
                    class_names: Sequence[str]) -> Dict[str, float]:
    """Dataset-level per-class IoU over rasterized map masks
    (raster_eval.py:42-102 RasterEvaluate.evaluate): predictions align to
    ground truth by sample token; missing tokens count as all-false masks;
    IoU = |pred & gt| / (|pred | gt| + 1e-7) pooled over the whole split,
    mIoU = mean over classes.
    """
    out: Dict[str, float] = {}
    total = 0.0
    first_gt = next(iter(gts.values()))
    for i, name in enumerate(class_names):
        inter = 0.0
        union = 0.0
        for token, gt in gts.items():
            g = np.asarray(gt[i], bool)
            p = (np.asarray(preds[token][i], bool) if token in preds
                 else np.zeros_like(np.asarray(first_gt[i], bool)))
            inter += float(np.sum(p & g))
            union += float(np.sum(p | g))
        out[name] = inter / (union + 1e-7)
        total += out[name]
    out["mIoU"] = total / len(class_names)
    return out
