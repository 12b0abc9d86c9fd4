"""LPIPS (Learned Perceptual Image Patch Similarity) in pure jnp.

Reference contract: nerfacto_nusc_ms.py:380-384,668-674 uses torchmetrics'
``LearnedPerceptualImagePatchSimilarity(normalize=True)`` (VGG backbone) for
eval-image metrics. This module reimplements the metric TPU-native so eval
runs without torch/torchmetrics:

  * input RGB in [0, 1] (``normalize=True`` semantics) -> [-1, 1]
  * LPIPS scaling layer (fixed shift/scale per channel)
  * VGG16 feature trunk, activations tapped at relu1_2, relu2_2, relu3_3,
    relu4_3, relu5_3
  * per-layer: channel-unit-normalize, squared diff, learned non-negative
    1x1 linear head, spatial mean
  * sum over the five layers

Weights: pretrained VGG16 + LPIPS linear weights are not distributable with
this repo; ``load_torch_state_dict`` converts either the official ``lpips``
package checkpoint layout (``net.slice*``/``lin*``) or a torchmetrics LPIPS
state_dict from a local file. ``random_weights`` builds a correctly-shaped
random pytree (used by the executed-parity test against a torch
implementation of the same published architecture).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, layers_in_block); maxpool between blocks.
_VGG_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# LPIPS ScalingLayer constants (official lpips package, lpips/lpips.py).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def conv_channel_plan() -> List[int]:
    """Per-conv (in, out) channel list in trunk order."""
    chans = []
    c_in = 3
    for c_out, n in _VGG_PLAN:
        for _ in range(n):
            chans.append((c_in, c_out))
            c_in = c_out
    return chans


def random_weights(key: jax.Array) -> Dict:
    """Random weights with the exact LPIPS-VGG shapes (for tests).

    conv kernels are HWIO (3, 3, in, out); ``lin`` heads are (C,) vectors
    (the 1x1 conv of the official implementation squeezed).
    """
    params: Dict = {"convs": [], "lins": []}
    plan = conv_channel_plan()
    keys = jax.random.split(key, len(plan) + len(_VGG_PLAN))
    for k, (c_in, c_out) in zip(keys[: len(plan)], plan):
        kw, kb = jax.random.split(k)
        params["convs"].append(
            {
                "w": jax.random.normal(kw, (3, 3, c_in, c_out), jnp.float32)
                * (1.0 / np.sqrt(9 * c_in)),
                "b": jax.random.normal(kb, (c_out,), jnp.float32) * 0.01,
            }
        )
    for k, (c_out, _n) in zip(keys[len(plan):], _VGG_PLAN):
        params["lins"].append(
            jnp.abs(jax.random.normal(k, (c_out,), jnp.float32)) * 0.1
        )
    return params


def load_torch_state_dict(state: Dict[str, "np.ndarray"]) -> Dict:
    """Convert a torch LPIPS state_dict (official ``lpips`` package layout
    ``net.sliceK.<idx>.weight`` + ``linK.model.1.weight``, or torchmetrics'
    ``net.*``-prefixed equivalent) to the jnp pytree.

    Accepts numpy-converted tensors (call ``{k: v.numpy() for ...}`` first
    if loading with torch)."""
    # Collect conv weights in trunk order: slices 1..5, ascending inner idx.
    convs = []
    for s in range(1, 6):
        idxs = sorted(
            {
                int(k.split(".")[-2])
                for k in state
                if f"slice{s}." in k and k.endswith(".weight")
            }
        )
        for i in idxs:
            w = None
            b = None
            for k, v in state.items():
                if f"slice{s}.{i}.weight" in k:
                    w = np.asarray(v)
                if f"slice{s}.{i}.bias" in k:
                    b = np.asarray(v)
            if w is None or w.ndim != 4:
                continue  # ReLU/pool entries have no weights
            # torch OIHW -> HWIO
            convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                          "b": jnp.asarray(b)})
    lins = []
    for li in range(5):
        for k, v in state.items():
            if f"lin{li}." in k and k.endswith(".weight"):
                w = np.asarray(v)  # (1, C, 1, 1)
                lins.append(jnp.asarray(w.reshape(-1)))
                break
    if len(convs) != len(conv_channel_plan()) or len(lins) != 5:
        raise ValueError(
            f"unrecognized LPIPS state_dict: {len(convs)} convs, "
            f"{len(lins)} lin heads"
        )
    return {"convs": convs, "lins": lins}


def _conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y + b


def _maxpool(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vgg_features(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Trunk forward: x (N, H, W, 3) scaled input -> five tapped activations."""
    feats = []
    ci = 0
    for bi, (_c, n) in enumerate(_VGG_PLAN):
        if bi > 0:
            x = _maxpool(x)
        for _ in range(n):
            p = params["convs"][ci]
            x = jax.nn.relu(_conv(x, p["w"], p["b"]))
            ci += 1
        feats.append(x)
    return feats


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(f ** 2, axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips(params: Dict, pred: jnp.ndarray, gt: jnp.ndarray,
          normalize: bool = True) -> jnp.ndarray:
    """LPIPS distance between (H, W, 3) or (N, H, W, 3) images.

    ``normalize=True``: inputs in [0, 1] (the reference's setting)."""
    if pred.ndim == 3:
        pred = pred[None]
        gt = gt[None]
    if normalize:
        pred = pred * 2.0 - 1.0
        gt = gt * 2.0 - 1.0
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    f0 = vgg_features(params, (pred - shift) / scale)
    f1 = vgg_features(params, (gt - shift) / scale)
    total = 0.0
    for a, b, lin in zip(f0, f1, params["lins"]):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2  # (N, H, W, C)
        # The learned head is a 1x1 conv to one channel: dot over C.
        per_pixel = jnp.sum(d * lin, axis=-1)  # (N, H, W)
        total = total + jnp.mean(per_pixel, axis=(1, 2))
    return jnp.mean(total)
