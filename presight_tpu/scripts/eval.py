"""`ns-eval` equivalent: load a run, render eval images, report metrics.

Reference spec: nerfstudio-0.3.3/nerfstudio/scripts/eval.py via
utils/eval_utils.py:68-110 + pipeline get_average_eval_image_metrics
(my_pipeline.py:219-269).

Usage:
  python -m presight_tpu.scripts.eval <run_dir> [--max-images N] [--output-path metrics.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("run_dir", type=Path)
    parser.add_argument("--max-images", type=int, default=-1)
    parser.add_argument("--output-path", type=Path, default=None)
    parser.add_argument("--no-lpips", action="store_true")
    parser.add_argument("--num-devices", type=int, default=None,
                        help="shard render chunks over this many chips "
                             "(0 = all visible); overrides the run config")
    args = parser.parse_args(argv)

    import dataclasses

    from ..data.dataparser import make_camera_params, parse
    from ..engine.evaluator import evaluate_images
    from ..engine.trainer import eval_setup

    _, trainer = eval_setup(args.run_dir / "config.yml",
                            num_devices=args.num_devices)
    # Eval split images (falls back to train images when the split is empty,
    # e.g. train_split_fraction=1.0 as in the tile configs).
    val_out = parse(trainer.config.pipeline.dataparser, split="val")
    items = val_out.items or trainer.train_outputs.items
    cameras = make_camera_params(items)
    if trainer.mesh is not None:
        from ..parallel import replicate

        cameras = replicate(trainer.mesh, cameras)

    indices = range(len(items) if args.max_images < 0 else min(args.max_images, len(items)))
    metrics = evaluate_images(
        trainer.state.params, trainer.model_config, cameras, items,
        indices=indices, with_lpips=not args.no_lpips, mesh=trainer.mesh,
    )
    print(json.dumps(metrics, indent=2))
    if args.output_path:
        args.output_path.write_text(json.dumps(metrics, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
