"""Nightly quality arm: the SHIPPED -tpu profile trained for 1500 iters on
the hard fixture, gated at the QUALITY.md seed-range edges.

The fast CI floor (test_quality_floor.py, 60 iters) only catches
catastrophic breakage; the regressions that actually occurred during
development (the SSIM conv-precision bug, the boundary-shell bug) were of
the size only a converged-ish run exposes. This arm replicates one seed of
the round-4 gate protocol (hard fixture, 16 experts, batch 4096, 1500
iters — QUALITY.md) and fails if the shipped profile leaves the measured
seed band: PSNR >= 14.0 (band 14.12-14.45 over seeds {0,1,2}),
depth RMSE <= 4.25 m (band 3.947-4.066).

Run on the attached TPU (~15 min):
  PRESIGHT_NIGHTLY=1 python -m pytest tests/test_quality_nightly.py -q
Skipped by default — 1500 iters at batch 4096 is hours on the CPU backend
the rest of the suite pins.
"""

import os
from pathlib import Path

import pytest

nightly = pytest.mark.skipif(
    not os.environ.get("PRESIGHT_NIGHTLY"),
    reason="nightly quality arm (set PRESIGHT_NIGHTLY=1 on a TPU host)",
)


@nightly
def test_shipped_profile_holds_quality_band(tmp_path):
    from presight_tpu.data.synthetic import generate_scene
    from presight_tpu.scripts.quality_study import run_variant

    root = Path("data/synthetic_hard")
    if not (root / "centroids").exists():
        generate_scene(
            root,
            scene_names=("scene-0001", "scene-0002", "scene-0003",
                         "scene-0004"),
            num_frames=16, height=60, width=104,
        )
    r = run_variant(
        "grid-n48-cap4x-p64x32", iters=1500, out_root=tmp_path,
        seed=0, experts=16, batch=4096, data_dir=root,
    )
    print(f"nightly arm: psnr={r['psnr']:.2f} ssim={r['ssim']:.3f} "
          f"depth_rmse={r['depth_rmse']:.3f} wall={r['wall_s']:.0f}s")
    assert r["psnr"] >= 14.0, r
    assert r["depth_rmse"] <= 4.25, r
    assert r["ssim"] >= 0.745, r
