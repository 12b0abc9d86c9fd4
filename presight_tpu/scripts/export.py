"""`ns-export` equivalent: export artifacts from a trained run.

Reference spec: nerfstudio scripts/exporter.py (tyro subcommands
pointcloud / tsdf / poisson / marching-cubes / cameras, :449-455). The
two subcommands on (or near) PreSight's actual path are implemented
TPU-natively here:

  * ``pointcloud`` — exporter.py:93-165 + exporter_utils.py:77-160:
    render random training rays in chunks, backproject expected depth
    into colored world points, optional bounding-box crop and
    statistical outlier removal, write a PLY. Differences from the
    reference, by design: points are emitted in METRIC world units
    (un-scaled by pose_scale_factor, like ns-extract-priors) rather
    than nerfstudio's normalized space, and outlier removal uses a
    scipy cKDTree statistical filter instead of open3d (same
    mean-distance + std_ratio semantics, exporter_utils.py:134-140).
  * ``cameras`` — exporter.py:422-446: dump train/eval camera poses
    (metric c2w + intrinsics) to JSON.

The mesh subcommands (tsdf / poisson / marching-cubes) are generic
nerfstudio tooling that PreSight never invokes (its export path is
ns-extract-priors -> city priors); they require open3d and are out of
scope — the CLI reports that explicitly rather than pretending.

Usage:
  python -m presight_tpu.scripts.export pointcloud <run_dir> --output-dir exports/
  python -m presight_tpu.scripts.export cameras <run_dir> --output-dir exports/
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _export_pointcloud(args) -> int:
    import jax

    from ..data.cameras import generate_rays
    from ..engine.evaluator import _render_fn
    from ..engine.trainer import eval_setup
    from ..prior.extraction import write_ply

    _, trainer = eval_setup(args.run_dir / "config.yml")
    config = trainer.model_config
    psf = trainer.train_outputs.pose_scale_factor
    fn = _render_fn(config)
    prop_grid = None
    if config.use_prop_grid:
        from ..models.nerfacto_ms import make_prop_grid

        prop_grid = make_prop_grid(trainer.state.params, config)

    items = trainer.train_outputs.items
    cameras = trainer.cameras
    # Camera indices drawn below index trainer.cameras directly, which is
    # only valid because the dataparser renumbers train items 0..N-1 to
    # match the train camera table — make that coupling loud, not implicit.
    n_cams = int(np.asarray(cameras.c2w).shape[0])
    assert len(items) == n_cams and all(
        it.image_index == i for i, it in enumerate(items)
    ), (
        f"train items ({len(items)}) must be renumbered 0..N-1 against the "
        f"train camera table ({n_cams}); the dataparser split contract "
        "changed under this exporter"
    )
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    chunk = config.eval_num_rays_per_chunk

    pts, cols = [], []
    n_have = 0
    max_batches = max(64, 20 * (args.num_points // chunk + 1))
    n_batches = 0
    while n_have < args.num_points:
        n_batches += 1
        if n_batches > max_batches:
            print(f"warning: stopping after {max_batches} ray batches with "
                  f"only {n_have}/{args.num_points} points — the depth band "
                  f"/ bounding box rejects almost every ray")
            break
        cam = rng.randint(0, len(items), chunk)
        row = rng.randint(0, 2**31 - 1, chunk)
        col = rng.randint(0, 2**31 - 1, chunk)
        H = np.asarray([items[c].H for c in cam])
        W = np.asarray([items[c].W for c in cam])
        ray_index = np.stack(
            [cam, row % H, col % W], axis=-1).astype(np.int32)
        out = fn(trainer.state.params, cameras, ray_index, key, prop_grid)
        depth = np.asarray(out[args.depth_output_name]).reshape(-1) / psf
        rgb = np.asarray(out[args.rgb_output_name])
        bundle = generate_rays(cameras, ray_index)
        origins = np.asarray(bundle.origins) / psf
        dirs = np.asarray(bundle.directions)
        world = origins + dirs * depth[:, None]
        keep = (depth > args.min_depth) & (depth < args.max_depth)
        if args.use_bounding_box:
            lo = np.asarray(args.bounding_box_min)
            hi = np.asarray(args.bounding_box_max)
            keep &= np.all((world >= lo) & (world <= hi), axis=-1)
        pts.append(world[keep].astype(np.float32))
        cols.append(np.clip(rgb[keep], 0, 1).astype(np.float32))
        n_have += int(keep.sum())
    points = np.concatenate(pts)[: args.num_points]
    colors = np.concatenate(cols)[: args.num_points]

    if args.remove_outliers and len(points) > args.nb_points:
        # exporter_utils.py:134-140 semantics (o3d remove_statistical_
        # outlier): drop points whose mean distance to their nb_points
        # nearest neighbours exceeds mean + std_ratio * std.
        from scipy.spatial import cKDTree

        tree = cKDTree(points)
        d, _ = tree.query(points, k=args.nb_points + 1)
        mean_d = d[:, 1:].mean(axis=1)
        thresh = mean_d.mean() + args.std_ratio * mean_d.std()
        inlier = mean_d <= thresh
        points, colors = points[inlier], colors[inlier]

    args.output_dir.mkdir(parents=True, exist_ok=True)
    out_path = args.output_dir / "point_cloud.ply"
    write_ply(points, colors, out_path)
    print(f"wrote {len(points)} points to {out_path}")
    return 0


def _export_cameras(args) -> int:
    from ..engine.trainer import eval_setup

    _, trainer = eval_setup(args.run_dir / "config.yml")
    psf = trainer.train_outputs.pose_scale_factor
    cameras = trainer.cameras
    c2w = np.asarray(cameras.c2w).copy()
    c2w[:, :3, 3] /= psf  # back to metric translation
    frames = [
        dict(
            camera_to_world=c2w[i].tolist(),
            fx=float(cameras.fx[i]), fy=float(cameras.fy[i]),
            cx=float(cameras.cx[i]), cy=float(cameras.cy[i]),
            video_id=int(cameras.video_ids[i]),
        )
        for i in range(c2w.shape[0])
    ]
    args.output_dir.mkdir(parents=True, exist_ok=True)
    out_path = args.output_dir / "camera_poses.json"
    out_path.write_text(json.dumps({"frames": frames}, indent=1))
    print(f"wrote {len(frames)} camera poses to {out_path}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    pc = sub.add_parser("pointcloud", help="colored point cloud PLY")
    pc.add_argument("run_dir", type=Path)
    pc.add_argument("--output-dir", type=Path, required=True)
    pc.add_argument("--num-points", type=int, default=1_000_000)
    pc.add_argument("--min-depth", type=float, default=0.5)
    pc.add_argument("--max-depth", type=float, default=50.0)
    pc.add_argument("--rgb-output-name", default="rgb")
    pc.add_argument("--depth-output-name", default="expected_depth")
    pc.add_argument("--use-bounding-box", action="store_true")
    pc.add_argument("--bounding-box-min", type=float, nargs=3,
                    default=(-1e9, -1e9, -1e9))
    pc.add_argument("--bounding-box-max", type=float, nargs=3,
                    default=(1e9, 1e9, 1e9))
    pc.add_argument("--remove-outliers", action="store_true", default=True)
    pc.add_argument("--no-remove-outliers", dest="remove_outliers",
                    action="store_false")
    pc.add_argument("--nb-points", type=int, default=20)
    pc.add_argument("--std-ratio", type=float, default=10.0)
    pc.set_defaults(fn=_export_pointcloud)

    cams = sub.add_parser("cameras", help="camera poses JSON")
    cams.add_argument("run_dir", type=Path)
    cams.add_argument("--output-dir", type=Path, required=True)
    cams.set_defaults(fn=_export_cameras)

    for name in ("tsdf", "poisson", "marching-cubes"):
        mesh = sub.add_parser(
            name, help="not implemented (generic nerfstudio mesh tooling, "
                       "off the PreSight path; needs open3d)")
        mesh.set_defaults(fn=None, mesh_name=name)

    args = parser.parse_args(argv)
    if args.fn is None:
        parser.error(
            f"'{args.mesh_name}' export is generic nerfstudio mesh tooling "
            "that PreSight never invokes and it depends on open3d; use "
            "'pointcloud' or ns-extract-priors instead.")
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
