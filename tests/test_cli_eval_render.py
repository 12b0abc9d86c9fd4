"""Execute the ns-eval / ns-render CLI analogs end-to-end in CI.

Mirrors the reference contract: a finished run directory (config.yml +
nerfstudio_models/step-*.ckpt) is all `ns-eval` / `ns-render` need
(reference eval_utils.py:68-110 `eval_setup`; scripts/eval.py,
scripts/render.py). Trains the synthetic-demo method for a few steps
through the real train CLI, then drives both consumer CLIs on the run
directory it produced — the same workflow a user runs.
"""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    from pathlib import Path

    from presight_tpu.data.synthetic import generate_scene
    from presight_tpu.scripts import train

    # synthetic-demo reads the fixture from the repo-relative data dir its
    # method config points at; generate it if this test file runs first.
    root = Path("data/synthetic")
    if not (root / "centroids").exists():
        generate_scene(root)

    out = tmp_path_factory.mktemp("cli_run")
    rc = train.main([
        "synthetic-demo",
        "--max-num-iterations", "6",
        "--output-dir", str(out),
        "--steps-per-save", "6",
    ])
    assert rc == 0
    cfgs = list(out.rglob("config.yml"))
    assert len(cfgs) == 1, cfgs
    ckpts = list(cfgs[0].parent.glob("nerfstudio_models/step-*.ckpt"))
    assert ckpts, "train CLI produced no checkpoint"
    return cfgs[0].parent


def test_eval_cli(run_dir, tmp_path):
    from presight_tpu.scripts import eval as eval_cli

    out = tmp_path / "metrics.json"
    rc = eval_cli.main([
        str(run_dir), "--max-images", "1", "--no-lpips",
        "--output-path", str(out),
    ])
    assert rc == 0
    metrics = json.loads(out.read_text())
    assert "psnr" in metrics and "ssim" in metrics
    assert np.isfinite(metrics["psnr"])
    assert 0.0 <= metrics["ssim"] <= 1.0


def test_render_cli(run_dir, tmp_path):
    from PIL import Image

    from presight_tpu.scripts import render as render_cli

    out = tmp_path / "renders"
    rc = render_cli.main([
        str(run_dir), "--output-dir", str(out),
        "--indices", "0", "--downscale", "2",
    ])
    assert rc == 0
    rgb_path = out / "render_00000_rgb.png"
    depth_path = out / "render_00000_depth.png"
    assert rgb_path.exists() and depth_path.exists()
    rgb = np.asarray(Image.open(rgb_path))
    assert rgb.ndim == 3 and rgb.shape[2] == 3 and rgb.shape[0] > 0


def test_export_pointcloud_cli(run_dir, tmp_path):
    """ns-export pointcloud (exporter.py:93-165 analog): backprojected
    colored world points land in a parseable PLY, all inside the depth
    band, colors valid."""
    from presight_tpu.scripts import export as export_cli

    rc = export_cli.main([
        "pointcloud", str(run_dir), "--output-dir", str(tmp_path),
        "--num-points", "500", "--nb-points", "5", "--std-ratio", "10.0",
    ])
    assert rc == 0
    ply = (tmp_path / "point_cloud.ply").read_text().splitlines()
    n = int(next(l for l in ply if l.startswith("element vertex")).split()[-1])
    assert 0 < n <= 500
    body = ply[ply.index("end_header") + 1:]
    assert len(body) == n
    xyz_rgb = np.array([[float(v) for v in l.split()] for l in body])
    assert np.isfinite(xyz_rgb[:, :3]).all()
    assert ((xyz_rgb[:, 3:] >= 0) & (xyz_rgb[:, 3:] <= 255)).all()


def test_export_cameras_cli(run_dir, tmp_path):
    """ns-export cameras (exporter.py:422-446 analog): per-camera metric
    c2w + intrinsics JSON."""
    from presight_tpu.scripts import export as export_cli

    rc = export_cli.main([
        "cameras", str(run_dir), "--output-dir", str(tmp_path)])
    assert rc == 0
    frames = json.loads((tmp_path / "camera_poses.json").read_text())["frames"]
    assert len(frames) > 0
    f0 = frames[0]
    assert np.asarray(f0["camera_to_world"]).shape == (3, 4)
    assert f0["fx"] > 0 and f0["fy"] > 0


def test_export_mesh_subcommands_report_out_of_scope(run_dir):
    from presight_tpu.scripts import export as export_cli

    with pytest.raises(SystemExit):
        export_cli.main(["poisson", str(run_dir)])
