"""Evaluator tests: chunked image rendering + metrics."""

import numpy as np
import pytest

from presight_tpu.utils import metrics as M


def test_psnr_ssim_basics():
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(32, 48, 3).astype(np.float32))
    assert float(M.psnr(img, img)) > 60
    assert abs(float(M.ssim(img, img)) - 1.0) < 1e-5
    noisy = img + 0.1 * jnp.asarray(rng.randn(32, 48, 3).astype(np.float32))
    assert float(M.psnr(img, noisy)) < 25
    assert float(M.ssim(img, noisy)) < 0.99


def test_ssim_matches_torchmetrics():
    torch = pytest.importorskip("torch")
    try:
        from torchmetrics.functional import structural_similarity_index_measure
    except ImportError:
        pytest.skip("torchmetrics unavailable")
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    a = rng.rand(24, 36, 3).astype(np.float32)
    b = np.clip(a + 0.05 * rng.randn(24, 36, 3).astype(np.float32), 0, 1)
    ours = float(M.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = float(structural_similarity_index_measure(
        torch.tensor(np.moveaxis(a, -1, 0)[None]),
        torch.tensor(np.moveaxis(b, -1, 0)[None]),
    ))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_image_renderer_full_image():
    import jax

    from presight_tpu.engine.evaluator import ImageRenderer
    from presight_tpu.models import init_model
    from tests.test_train_smoke import synthetic_scene, tiny_config

    config = tiny_config()
    aabbs = np.array([[[-10, -10, -10], [10, 10, 10]]], np.float32)
    centroids = np.zeros((1, 3), np.float32)
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, 4, 1)
    cameras = synthetic_scene(height=12, width=18)

    renderer = ImageRenderer(config, chunk=64)
    out = renderer.render(params, cameras, 0, 12, 18)
    assert out["rgb"].shape == (12, 18, 3)
    assert out["depth"].shape == (12, 18)
    assert out["semantics"].shape == (12, 18, 8)
    assert np.isfinite(out["rgb"]).all()
    # Deterministic (eval path, no stratification).
    out2 = renderer.render(params, cameras, 0, 12, 18)
    np.testing.assert_allclose(out["rgb"], out2["rgb"], rtol=1e-6)


def test_occ_miou_metric():
    """MetricMIoU vs hand-computed confusion (occ_metrics.py semantics)."""
    from presight_tpu.utils.occ_metrics import MetricMIoU

    m = MetricMIoU(num_classes=3)
    gt = np.array([0, 0, 1, 1, 2, 2, 255])   # 255 = ignore
    pred = np.array([0, 1, 1, 1, 2, 0, 0])
    m.add_batch(pred, gt)
    ious = m.per_class_iou()
    # class 0: tp=1, fn=1, fp=1 -> 1/3 ; class 1: tp=2, fp=1 -> 2/3 ; class 2: tp=1, fn=1 -> 1/2
    np.testing.assert_allclose(ious, [1/3, 2/3, 1/2], rtol=1e-9)
    # exclude the last ('free') class from the mean
    np.testing.assert_allclose(m.miou(), 100 * (1/3 + 2/3) / 2, rtol=1e-9)
    # camera-mask variant drops masked voxels
    m2 = MetricMIoU(num_classes=3, use_image_mask=True)
    m2.add_batch(pred, gt, mask_camera=np.array([1, 1, 1, 1, 0, 0, 0]))
    np.testing.assert_allclose(m2.per_class_iou()[:2], [1/2, 2/3], rtol=1e-9)
