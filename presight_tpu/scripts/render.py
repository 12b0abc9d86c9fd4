"""`ns-render` equivalent: render RGB/depth/feature-PCA images from a run.

Reference spec: nerfstudio scripts/render.py (camera-path rendering) reduced
to the PreSight-relevant use: re-render dataset cameras to PNGs.

Usage:
  python -m presight_tpu.scripts.render <run_dir> --output-dir renders/ [--indices 0 1 2] [--downscale 2]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("run_dir", type=Path)
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--indices", type=int, nargs="*", default=[0])
    parser.add_argument("--downscale", type=float, default=1.0)
    parser.add_argument("--num-devices", type=int, default=None,
                        help="shard render chunks over this many chips "
                             "(0 = all visible); overrides the run config")
    args = parser.parse_args(argv)

    from PIL import Image

    from ..engine.evaluator import ImageRenderer
    from ..engine.trainer import eval_setup
    from ..utils.colormaps import apply_feature_colormap

    _, trainer = eval_setup(args.run_dir / "config.yml",
                            num_devices=args.num_devices)
    renderer = ImageRenderer(trainer.model_config, mesh=trainer.mesh)
    args.output_dir.mkdir(parents=True, exist_ok=True)

    cameras = trainer.cameras
    if args.downscale != 1.0:
        import dataclasses as dc
        s = 1.0 / args.downscale
        cameras = type(cameras)(
            c2w=cameras.c2w, fx=cameras.fx * s, fy=cameras.fy * s,
            cx=cameras.cx * s, cy=cameras.cy * s, video_ids=cameras.video_ids,
        )

    for i in args.indices:
        item = trainer.train_outputs.items[i]
        H, W = int(item.H / args.downscale), int(item.W / args.downscale)
        out = renderer.render(trainer.state.params, cameras, i, H, W)
        rgb = (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(args.output_dir / f"render_{i:05d}_rgb.png")
        depth = out["expected_depth"]
        dnorm = (depth - depth.min()) / max(depth.max() - depth.min(), 1e-6)
        Image.fromarray((dnorm * 255).astype(np.uint8)).save(
            args.output_dir / f"render_{i:05d}_depth.png")
        if "semantics" in out and trainer.train_outputs.dino_to_rgb is not None:
            pca = np.asarray(apply_feature_colormap(
                out["semantics"], trainer.train_outputs.dino_to_rgb))
            Image.fromarray((pca * 255).astype(np.uint8)).save(
                args.output_dir / f"render_{i:05d}_dino.png")
        print(f"rendered camera {i} -> {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
