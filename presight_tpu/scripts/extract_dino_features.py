"""Stage-1 data prep: DINO ViT feature extraction + PCA reduction, TPU-native.

Reference spec: nerfstudio-0.3.3/nerfstudio/scripts/datasets/
extract_dino_features.py — a dino_vitb8 ViTExtractor hooked on the layer-11
attention *key* facet (:294-689), inputs resized to 576x1024 and
ImageNet-normalized (:120-133), two modes:

  * get_reduction_matrix (:712-767): fit a 64-dim PCA on <= 2M sampled
    descriptors (seed 1234) -> pca_results.pkl, plus a 3-dim RGB PCA with
    median-absolute-deviation outlier rejection -> dino_to_rgb.pkl
  * get_dino (:769-817): per-scene batched inference -> project + minmax
    normalize -> f16 npz per image

TPU-native: the ViT forward is pure jnp (batched, jitted, sharded over the
mesh instead of the reference's one-process-per-GPU mp.Pool); DINO weights
are converted from a local torch checkpoint of facebookresearch/dino
dino_vitb8 (zero-egress image: pass --weights; the reference pulls the same
tensors via torch.hub).

Usage:
  python -m presight_tpu.scripts.extract_dino_features --mode get_reduction_matrix \
      --data-dir data/nuScenes --weights dino_vitb8.pth
  python -m presight_tpu.scripts.extract_dino_features --mode get_dino ...
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

INPUT_IMAGE_SHAPE = (576, 1024)
NUM_SELECT_PCA = 2_000_000
PCA_DIM = 64
SEED = 1234
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# ViT-B/8 forward (jnp) with layer-11 key-facet extraction
# ---------------------------------------------------------------------------

VIT_DEPTH = 12
VIT_DIM = 768
VIT_HEADS = 12
PATCH = 8


def convert_dino_torch_weights(state_dict) -> Dict:
    """torch dino_vitb8 state dict -> jnp param tree."""
    import jax.numpy as jnp

    def g(name):
        t = state_dict[name]
        return jnp.asarray(np.asarray(t.detach().cpu() if hasattr(t, "detach") else t,
                                      np.float32))

    params = {
        "patch_kernel": jnp.transpose(g("patch_embed.proj.weight"), (2, 3, 1, 0)),
        "patch_bias": g("patch_embed.proj.bias"),
        "cls_token": g("cls_token"),
        "pos_embed": g("pos_embed"),
        "blocks": [],
    }
    for i in range(VIT_DEPTH):
        p = f"blocks.{i}."
        params["blocks"].append({
            "norm1_w": g(p + "norm1.weight"), "norm1_b": g(p + "norm1.bias"),
            "qkv_w": g(p + "attn.qkv.weight").T, "qkv_b": g(p + "attn.qkv.bias"),
            "proj_w": g(p + "attn.proj.weight").T, "proj_b": g(p + "attn.proj.bias"),
            "norm2_w": g(p + "norm2.weight"), "norm2_b": g(p + "norm2.bias"),
            "fc1_w": g(p + "mlp.fc1.weight").T, "fc1_b": g(p + "mlp.fc1.bias"),
            "fc2_w": g(p + "mlp.fc2.weight").T, "fc2_b": g(p + "mlp.fc2.bias"),
        })
    return params


def _layer_norm(x, w, b, eps=1e-6):
    import jax.numpy as jnp

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _interpolate_pos_embed(pos_embed, h_tokens: int, w_tokens: int):
    """Bicubic pos-embed resize for non-224 inputs / strides (the reference
    patches _fix_pos_enc the same way, extract_dino_features.py:370-420)."""
    import jax

    import jax.numpy as jnp

    n = pos_embed.shape[1] - 1
    side = int(np.sqrt(n))
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:].reshape(1, side, side, VIT_DIM)
    patch_pe = jax.image.resize(patch_pe, (1, h_tokens, w_tokens, VIT_DIM), "bicubic")
    return cls_pe, patch_pe.reshape(1, h_tokens * w_tokens, VIT_DIM)


def vit_key_features(params: Dict, images: "jnp.ndarray", layer: int = 11):
    """images (B, H, W, 3) normalized -> layer-``layer`` key facet
    (B, h_tokens, w_tokens, dim). Equivalent to ViTExtractor
    extract_descriptors(..., facet='key', include_cls=False)."""
    import jax
    import jax.numpy as jnp

    b, h, w, _ = images.shape
    ht, wt = h // PATCH, w // PATCH
    x = jax.lax.conv_general_dilated(
        images, params["patch_kernel"], (PATCH, PATCH), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_bias"]
    x = x.reshape(b, ht * wt, VIT_DIM)
    cls_tok = jnp.broadcast_to(params["cls_token"], (b, 1, VIT_DIM))
    x = jnp.concatenate([cls_tok, x], axis=1)
    cls_pe, patch_pe = _interpolate_pos_embed(params["pos_embed"], ht, wt)
    x = x + jnp.concatenate([cls_pe, patch_pe], axis=1)

    head_dim = VIT_DIM // VIT_HEADS
    keys = None
    for i, blk in enumerate(params["blocks"]):
        y = _layer_norm(x, blk["norm1_w"], blk["norm1_b"])
        qkv = y @ blk["qkv_w"] + blk["qkv_b"]  # (b, t, 3*dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if i == layer:
            keys = k  # (b, t, dim) = per-head keys concatenated
        t = x.shape[1]

        def heads(z):
            return z.reshape(b, t, VIT_HEADS, head_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        attn = jax.nn.softmax(qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(head_dim), axis=-1)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(b, t, VIT_DIM)
        x = x + (out @ blk["proj_w"] + blk["proj_b"])
        y = _layer_norm(x, blk["norm2_w"], blk["norm2_b"])
        y = jax.nn.gelu(y @ blk["fc1_w"] + blk["fc1_b"], approximate=False)
        x = x + (y @ blk["fc2_w"] + blk["fc2_b"])
        if keys is not None and i == layer:
            break
    return keys[:, 1:].reshape(b, ht, wt, VIT_DIM)


# ---------------------------------------------------------------------------
# PCA fitting (numpy/sklearn; exact reference formulas)
# ---------------------------------------------------------------------------


def pca_reduction(dino_features: np.ndarray, valid_mask: Optional[np.ndarray] = None):
    """Fit the 64-dim PCA (extract_dino_features.py:163-231).

    dino_features (N, h, w, c); returns (pca_features (N,h,w,PCA_DIM),
    pca_results dict)."""
    from sklearn.decomposition import PCA

    n, h, w, c = dino_features.shape
    flat = dino_features.reshape(-1, c)
    valid = valid_mask.reshape(-1) if valid_mask is not None else np.ones(len(flat), bool)
    valid_feats = flat[valid]

    rng = np.random.RandomState(SEED)
    idx = rng.choice(np.arange(len(valid_feats)),
                     size=min(len(valid_feats), NUM_SELECT_PCA), replace=False)
    pca = PCA()
    pca.fit(valid_feats[idx])
    reduction_matrix = pca.components_.T[:, :PCA_DIM].astype(np.float32)
    mean_ = pca.mean_.astype(np.float32)
    print(f"preserved variance = {sum(pca.explained_variance_ratio_[:PCA_DIM])}")

    reduced = (flat - mean_) @ reduction_matrix
    _min = reduced.min(0)
    _max = reduced.max(0)
    reduced = (reduced - _min) / (_max - _min)
    pca_results = {
        "reduction_matrix": reduction_matrix,
        "min": _min.astype(np.float32),
        "max": _max.astype(np.float32),
        "mean": mean_,
    }
    return reduced.reshape(n, h, w, PCA_DIM), pca_results


def get_pca_color(features: np.ndarray, m: float = 3.0):
    """3-dim RGB PCA with MAD outlier rejection (extract_dino_features.py:56-91)."""
    from sklearn.decomposition import PCA

    pca = PCA()
    np.random.seed(SEED)
    pca.fit(features)
    reduction_matrix = pca.components_.T[:, :3].astype(np.float32)
    mean_ = pca.mean_.astype(np.float32)

    projected = (features - mean_) @ reduction_matrix
    d = np.abs(projected - np.median(projected, axis=0))
    mdev = np.median(d, axis=0)
    s = d / mdev
    inliers = projected[s[:, 0] < m, :]
    rgb_min = inliers.min(0).astype(np.float32)
    rgb_max = inliers.max(0).astype(np.float32)
    return reduction_matrix, rgb_min, rgb_max, mean_


def make_dino_to_rgb(pca_features: np.ndarray, num_samples: int = 500_000) -> Dict:
    """dino_to_rgb.pkl payload (extract_dino_features.py:234-292)."""
    flat = pca_features.reshape(-1, pca_features.shape[-1])
    rng = np.random.RandomState(SEED)
    idx = rng.choice(np.arange(len(flat)), size=min(len(flat), num_samples), replace=False)
    reduction_matrix, rgb_min, rgb_max, mean_ = get_pca_color(flat[idx])
    return {
        "reduction_matrix": reduction_matrix,
        "rgb_min": rgb_min,
        "rgb_max": rgb_max,
        "mean": mean_,
    }


# ---------------------------------------------------------------------------
# Inference driver
# ---------------------------------------------------------------------------


def preprocess_image(path: str, shape=INPUT_IMAGE_SHAPE) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((shape[1], shape[0]), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def load_dino_params(weights: Path) -> Dict:
    import torch

    sd = torch.load(str(weights), map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_dino_torch_weights(sd)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--mode", choices=["get_reduction_matrix", "get_dino"],
                        default="get_reduction_matrix")
    parser.add_argument("--data-dir", type=Path, required=True)
    parser.add_argument("--weights", type=Path, required=True,
                        help="local torch checkpoint of dino_vitb8")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--max-fit-images", type=int, default=200)
    parser.add_argument("--image-size", type=int, nargs=2, default=None,
                        metavar=("H", "W"),
                        help="override the 576x1024 input resize (CI fixtures)")
    args = parser.parse_args(argv)

    import glob

    import jax
    import jax.numpy as jnp

    from ..utils.jax_setup import setup as jax_setup

    jax_setup()
    params = load_dino_params(args.weights)
    shape = tuple(args.image_size) if args.image_size else INPUT_IMAGE_SHAPE
    feature_fn = jax.jit(lambda p, x: vit_key_features(p, x))

    image_paths = sorted(glob.glob(str(args.data_dir / "samples" / "*.jpg")))
    out_dir = args.data_dir / "dino_features"
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.mode == "get_reduction_matrix":
        paths = image_paths[:: max(1, len(image_paths) // args.max_fit_images)]
        feats = []
        for i in range(0, len(paths), args.batch_size):
            batch = np.stack([preprocess_image(p, shape) for p in paths[i : i + args.batch_size]])
            feats.append(np.asarray(feature_fn(params, jnp.asarray(batch))))
        feats = np.concatenate(feats)
        pca_feats, pca_results = pca_reduction(feats)
        with open(out_dir / "pca_results.pkl", "wb") as f:
            pickle.dump(pca_results, f)
        with open(out_dir / "dino_to_rgb.pkl", "wb") as f:
            pickle.dump(make_dino_to_rgb(pca_feats), f)
        print(f"wrote {out_dir}/pca_results.pkl and dino_to_rgb.pkl")
    else:
        with open(out_dir / "pca_results.pkl", "rb") as f:
            pca = pickle.load(f)
        red = pca["reduction_matrix"]
        for i in range(0, len(image_paths), args.batch_size):
            chunk = image_paths[i : i + args.batch_size]
            batch = np.stack([preprocess_image(p, shape) for p in chunk])
            feats = np.asarray(feature_fn(params, jnp.asarray(batch)))
            feats = (feats - pca["mean"]) @ red
            feats = (feats - pca["min"]) / (pca["max"] - pca["min"])
            for path, f16 in zip(chunk, feats.astype(np.float16)):
                np.savez_compressed(out_dir / (Path(path).stem + ".npz"), f16)
        print(f"wrote {len(image_paths)} feature npz files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
