"""Synthetic-tile PSNR regression floor.

Trains the -tpu profile variant (shared storage, shared prop MLP) briefly
on the synthetic fixture and asserts held-out-image PSNR above a floor —
a catastrophic-regression tripwire for the quality-validated headline
architecture (see QUALITY.md; full 500-iter numbers are ~14.5 dB, the
60-iter floor here is deliberately loose)."""

from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_data():
    from presight_tpu.data.synthetic import generate_scene

    root = Path("data/synthetic")
    if not (root / "centroids").exists():
        generate_scene(root)
    return root


def test_shared_profile_psnr_floor(synthetic_data, tmp_path):
    from presight_tpu.engine.evaluator import evaluate_images
    from presight_tpu.engine.trainer import Trainer
    from presight_tpu.scripts.quality_study import run_variant

    r = run_variant("shared-rebalanced", iters=60, out_root=tmp_path)
    assert np.isfinite(r["psnr"])
    assert r["psnr"] >= 12.0, f"synthetic-tile PSNR regressed: {r['psnr']:.2f}"
    assert -1.0 <= r["ssim"] <= 1.0
