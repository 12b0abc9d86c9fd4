"""Stage-1 data prep: semantic segmentation class maps.

Reference spec: nerfstudio-0.3.3/nerfstudio/scripts/datasets/
extract_nuscenes_segmentation.py:1-127 — SegFormer-B5 (cityscapes) inference
in a multi-GPU mp.Pool, dumping per-image uint8 class-map npz (19 cityscapes
classes, data/constants.py).

TPU-native path (default): the pure-jnp SegFormer in segformer_jnp.py —
weights converted from a local HF snapshot (zero-egress image: pass
--weights pointing at a local nvidia/segformer-b5-finetuned-cityscapes
snapshot), preprocessing via the snapshot's SegformerImageProcessor
(numpy, no torch). ``--impl torch`` keeps the transformers/torch-CPU
fallback. The npz schema matches the reference exactly (uint8 (H, W)
class map per image).

Usage:
  python -m presight_tpu.scripts.extract_segmentation --data-dir data/nuScenes \
      --weights /path/to/segformer-b5-cityscapes
"""

from __future__ import annotations

import argparse
import glob
from pathlib import Path

import numpy as np


def run_segformer_jnp(weights: Path, image_paths, out_dir: Path,
                      batch_size: int = 4) -> None:
    """jnp inference: batched logits on the accelerator, bilinear upsample
    to image size + argmax like the torch reference."""
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from .segformer_jnp import (convert_segformer_weights,
                                load_segformer_snapshot, segformer_logits)

    try:
        from transformers import AutoImageProcessor

        processor = AutoImageProcessor.from_pretrained(str(weights), use_fast=False)
    except Exception:  # pragma: no cover - processor configs are optional
        processor = None

    config, sd = load_segformer_snapshot(weights)
    params = convert_segformer_weights(config, sd)

    @jax.jit
    def infer(pixel_values):
        return segformer_logits(params, pixel_values)

    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(0, len(image_paths), batch_size):
        chunk = image_paths[i : i + batch_size]
        images = [Image.open(p).convert("RGB") for p in chunk]
        if processor is not None:
            px = processor(images=images, return_tensors="np")["pixel_values"]
            px = px.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        else:
            arr = np.stack([np.asarray(im, np.float32) / 255.0 for im in images])
            px = (arr - np.array([0.485, 0.456, 0.406], np.float32)) / np.array(
                [0.229, 0.224, 0.225], np.float32)
        logits = infer(jnp.asarray(px))
        for path, img, logit in zip(chunk, images, logits):
            w, h = img.size
            up = jax.image.resize(logit, (h, w, logit.shape[-1]), "bilinear")
            seg = np.asarray(jnp.argmax(up, -1), np.uint8)
            np.savez_compressed(out_dir / (Path(path).stem + ".npz"), seg)
        print(f"{min(i + batch_size, len(image_paths))}/{len(image_paths)}",
              flush=True)


def run_segformer(weights: Path, image_paths, out_dir: Path, batch_size: int = 4) -> None:
    """torch-CPU fallback via transformers (the reference's own runtime)."""
    from PIL import Image

    try:
        from transformers import AutoImageProcessor, SegformerForSemanticSegmentation
        import torch
    except ImportError as e:  # pragma: no cover
        raise SystemExit("transformers is required for segmentation extraction") from e

    processor = AutoImageProcessor.from_pretrained(str(weights))
    model = SegformerForSemanticSegmentation.from_pretrained(str(weights))
    model.eval()

    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(0, len(image_paths), batch_size):
        chunk = image_paths[i : i + batch_size]
        images = [Image.open(p).convert("RGB") for p in chunk]
        inputs = processor(images=images, return_tensors="pt")
        with torch.no_grad():
            logits = model(**inputs).logits  # (b, classes, h/4, w/4)
        for path, img, logit in zip(chunk, images, logits):
            up = torch.nn.functional.interpolate(
                logit[None], size=img.size[::-1], mode="bilinear", align_corners=False
            )[0]
            seg = up.argmax(0).to(torch.uint8).numpy()
            np.savez_compressed(out_dir / (Path(path).stem + ".npz"), seg)
        print(f"{min(i + batch_size, len(image_paths))}/{len(image_paths)}", flush=True)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", type=Path, required=True)
    parser.add_argument("--weights", type=Path, required=True,
                        help="local snapshot of segformer-b5-finetuned-cityscapes")
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--impl", choices=["jnp", "torch"], default="jnp",
                        help="'jnp' (default) runs the pure-jnp port on the "
                             "accelerator; 'torch' uses transformers CPU")
    args = parser.parse_args(argv)

    image_paths = sorted(glob.glob(str(args.data_dir / "samples" / "*.jpg")))
    run = run_segformer_jnp if args.impl == "jnp" else run_segformer
    run(args.weights, image_paths, args.data_dir / "segmentation",
        args.batch_size)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
