"""Pure-jnp SegFormer (MiT encoder + all-MLP decode head) for the
segmentation data-prep stage.

Reference spec: nerfstudio-0.3.3/nerfstudio/scripts/datasets/
extract_nuscenes_segmentation.py:1-127 runs SegFormer-B5 (cityscapes) via
HuggingFace transformers on GPUs. Here the same network is implemented in
jnp so the extraction stage runs on the TPU compute path like the DINO
extractor (extract_dino_features.py): weights are converted from a local
HF snapshot (config.json + model.safetensors / pytorch_model.bin) — no
torch on the inference path.

Architecture (HF ``SegformerForSemanticSegmentation``):
  * per-stage overlapped patch embedding: Conv(k=7/3, s=4/2, p=k//2) + LN
  * efficient self-attention with spatial-reduction (sr) conv + LN on K/V
  * Mix-FFN: dense -> 3x3 depthwise conv -> gelu -> dense
  * stage-final LayerNorm
  * decode head: per-stage linear -> bilinear upsample to 1/4 scale ->
    concat (reverse stage order) -> 1x1 fuse conv + BN + relu -> classifier

All convs run NHWC (TPU-native layout); attention is batched matmuls on
the MXU. Logits come back at 1/4 input resolution like the torch model.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Sequence

import numpy as np


def load_segformer_snapshot(weights_dir: Path):
    """Read an HF snapshot dir -> (config dict, {name: np.ndarray})."""
    weights_dir = Path(weights_dir)
    config = json.loads((weights_dir / "config.json").read_text())
    st = weights_dir / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        sd = load_file(str(st))
    else:
        import torch

        bins = sorted(weights_dir.glob("pytorch_model*.bin"))
        if not bins:
            raise FileNotFoundError(f"no weights under {weights_dir}")
        sd = {}
        for b in bins:
            for k, v in torch.load(b, map_location="cpu").items():
                sd[k] = v.numpy()
    return config, {k: np.asarray(v) for k, v in sd.items()}


def convert_segformer_weights(config: Dict, sd: Dict[str, np.ndarray]) -> Dict:
    """HF state_dict -> jnp param pytree (convs HWIO, linears (in, out))."""
    import jax.numpy as jnp

    def conv(name):  # torch (O, I, kh, kw) -> HWIO
        return jnp.asarray(sd[name].transpose(2, 3, 1, 0))

    def lin(name):  # torch (out, in) -> (in, out)
        return jnp.asarray(sd[name].T)

    def vec(name):
        return jnp.asarray(sd[name])

    n_blocks = config["num_encoder_blocks"]
    depths = config["depths"]
    params: Dict = {"stages": [], "cfg": {
        "sr_ratios": tuple(config["sr_ratios"]),
        "num_heads": tuple(config["num_attention_heads"]),
        "strides": tuple(config.get("strides", (4, 2, 2, 2))),
        "eps": float(config.get("layer_norm_eps", 1e-6)),
    }}
    for i in range(n_blocks):
        e = f"segformer.encoder"
        stage = {
            "patch_conv_w": conv(f"{e}.patch_embeddings.{i}.proj.weight"),
            "patch_conv_b": vec(f"{e}.patch_embeddings.{i}.proj.bias"),
            "patch_ln_w": vec(f"{e}.patch_embeddings.{i}.layer_norm.weight"),
            "patch_ln_b": vec(f"{e}.patch_embeddings.{i}.layer_norm.bias"),
            "final_ln_w": vec(f"{e}.layer_norm.{i}.weight"),
            "final_ln_b": vec(f"{e}.layer_norm.{i}.bias"),
            "layers": [],
        }
        for j in range(depths[i]):
            b = f"{e}.block.{i}.{j}"
            layer = {
                "ln1_w": vec(f"{b}.layer_norm_1.weight"),
                "ln1_b": vec(f"{b}.layer_norm_1.bias"),
                "q_w": lin(f"{b}.attention.self.query.weight"),
                "q_b": vec(f"{b}.attention.self.query.bias"),
                "k_w": lin(f"{b}.attention.self.key.weight"),
                "k_b": vec(f"{b}.attention.self.key.bias"),
                "v_w": lin(f"{b}.attention.self.value.weight"),
                "v_b": vec(f"{b}.attention.self.value.bias"),
                "attn_out_w": lin(f"{b}.attention.output.dense.weight"),
                "attn_out_b": vec(f"{b}.attention.output.dense.bias"),
                "ln2_w": vec(f"{b}.layer_norm_2.weight"),
                "ln2_b": vec(f"{b}.layer_norm_2.bias"),
                "ffn1_w": lin(f"{b}.mlp.dense1.weight"),
                "ffn1_b": vec(f"{b}.mlp.dense1.bias"),
                # depthwise: torch (C, 1, 3, 3) -> HWI(=1)O(=C)
                "dw_w": jnp.asarray(
                    sd[f"{b}.mlp.dwconv.dwconv.weight"].transpose(2, 3, 1, 0)),
                "dw_b": vec(f"{b}.mlp.dwconv.dwconv.bias"),
                "ffn2_w": lin(f"{b}.mlp.dense2.weight"),
                "ffn2_b": vec(f"{b}.mlp.dense2.bias"),
            }
            if f"{b}.attention.self.sr.weight" in sd:
                layer["sr_w"] = conv(f"{b}.attention.self.sr.weight")
                layer["sr_b"] = vec(f"{b}.attention.self.sr.bias")
                layer["sr_ln_w"] = vec(f"{b}.attention.self.layer_norm.weight")
                layer["sr_ln_b"] = vec(f"{b}.attention.self.layer_norm.bias")
            stage["layers"].append(layer)
        params["stages"].append(stage)

    d = "decode_head"
    params["head"] = {
        "linear_c": [
            {"w": lin(f"{d}.linear_c.{i}.proj.weight"),
             "b": vec(f"{d}.linear_c.{i}.proj.bias")}
            for i in range(n_blocks)
        ],
        "fuse_w": conv(f"{d}.linear_fuse.weight"),
        "bn_w": vec(f"{d}.batch_norm.weight"),
        "bn_b": vec(f"{d}.batch_norm.bias"),
        "bn_mean": vec(f"{d}.batch_norm.running_mean"),
        "bn_var": vec(f"{d}.batch_norm.running_var"),
        "cls_w": conv(f"{d}.classifier.weight"),
        "cls_b": vec(f"{d}.classifier.bias"),
    }
    return params


def _layer_norm(x, w, b, eps):
    import jax.numpy as jnp

    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _conv(x, w, b=None, stride=1, padding="VALID", groups=1):
    import jax.lax as lax

    y = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y if b is None else y + b


def _attention(x_seq, kv_seq, layer, num_heads):
    """x_seq (B, N, C) queries vs kv_seq (B, M, C); standard MHA."""
    import jax.numpy as jnp

    B, N, C = x_seq.shape
    hd = C // num_heads
    q = (x_seq @ layer["q_w"] + layer["q_b"]).reshape(B, N, num_heads, hd)
    k = (kv_seq @ layer["k_w"] + layer["k_b"]).reshape(B, -1, num_heads, hd)
    v = (kv_seq @ layer["v_w"] + layer["v_b"]).reshape(B, -1, num_heads, hd)
    import jax

    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(hd)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
    return out @ layer["attn_out_w"] + layer["attn_out_b"]


def segformer_features(params: Dict, images) -> List:
    """Encoder forward. images: (B, H, W, 3) normalized NHWC float32.
    Returns the per-stage spatial feature maps [(B, Hi, Wi, Ci)]."""
    import jax
    import jax.numpy as jnp

    cfg = params["cfg"]
    eps = cfg["eps"]
    x = images
    feats = []
    for i, stage in enumerate(params["stages"]):
        k = stage["patch_conv_w"].shape[0]
        stride = cfg["strides"][i]
        pad = k // 2
        x = _conv(x, stage["patch_conv_w"], stage["patch_conv_b"],
                  stride=stride, padding=[(pad, pad), (pad, pad)])
        B, H, W, C = x.shape
        seq = x.reshape(B, H * W, C)
        seq = _layer_norm(seq, stage["patch_ln_w"], stage["patch_ln_b"], eps)
        sr = cfg["sr_ratios"][i]
        heads = cfg["num_heads"][i]
        for layer in stage["layers"]:
            h = _layer_norm(seq, layer["ln1_w"], layer["ln1_b"], eps)
            if "sr_w" in layer:
                spatial = h.reshape(B, H, W, C)
                red = _conv(spatial, layer["sr_w"], layer["sr_b"], stride=sr)
                red = red.reshape(B, -1, C)
                kv = _layer_norm(red, layer["sr_ln_w"], layer["sr_ln_b"], eps)
            else:
                kv = h
            seq = seq + _attention(h, kv, layer, heads)
            h = _layer_norm(seq, layer["ln2_w"], layer["ln2_b"], eps)
            h = h @ layer["ffn1_w"] + layer["ffn1_b"]
            hidden = h.shape[-1]
            h = _conv(h.reshape(B, H, W, hidden), layer["dw_w"], layer["dw_b"],
                      padding=[(1, 1), (1, 1)], groups=hidden)
            h = jax.nn.gelu(h.reshape(B, H * W, hidden), approximate=False)
            h = h @ layer["ffn2_w"] + layer["ffn2_b"]
            seq = seq + h
        seq = _layer_norm(seq, stage["final_ln_w"], stage["final_ln_b"], eps)
        x = seq.reshape(B, H, W, C)
        feats.append(x)
    return feats


def segformer_logits(params: Dict, images):
    """Full forward: (B, H, W, 3) -> logits (B, H/4, W/4, num_labels)."""
    import jax
    import jax.numpy as jnp

    feats = segformer_features(params, images)
    head = params["head"]
    B, H0, W0, _ = feats[0].shape
    ups = []
    for f, lc in zip(feats, head["linear_c"]):
        h = f @ lc["w"] + lc["b"]
        if h.shape[1:3] != (H0, W0):
            # torch interpolate align_corners=False == half-pixel resize
            h = jax.image.resize(h, (B, H0, W0, h.shape[-1]), method="bilinear")
        ups.append(h)
    x = jnp.concatenate(ups[::-1], axis=-1)
    x = _conv(x, head["fuse_w"])
    x = (x - head["bn_mean"]) / jnp.sqrt(head["bn_var"] + 1e-5)
    x = x * head["bn_w"] + head["bn_b"]
    x = jax.nn.relu(x)
    return _conv(x, head["cls_w"], head["cls_b"])
