"""Image metrics: PSNR, SSIM (jnp), and optional LPIPS.

Reference spec: nerfacto_nusc_ms.py:380-384,647-686 — torchmetrics PSNR
(data_range=1), SSIM (structural_similarity_index_measure defaults:
gaussian kernel 11, sigma 1.5, k1=0.01, k2=0.03), LPIPS(normalize=True).
SSIM here reproduces the torchmetrics default algorithm in pure jnp.
LPIPS requires pretrained VGG/AlexNet weights; `lpips_fn` loads torch's
implementation on host when available (CPU torch is fine for eval cadence)
and degrades to None otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred: jnp.ndarray, gt: jnp.ndarray, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """SSIM over (H, W, C) images, gaussian-weighted, mean over valid pixels
    (matches torchmetrics structural_similarity_index_measure defaults)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kern = _gaussian_kernel(kernel_size, sigma)[None, None]  # (1,1,k,k)

    # (H, W, C) -> (C, 1, H, W) for depthwise conv
    x = jnp.moveaxis(pred, -1, 0)[:, None]
    y = jnp.moveaxis(gt, -1, 0)[:, None]

    def filt(img):
        # HIGHEST precision is load-bearing on TPU: the default conv
        # precision (bf16 passes) loses ~7e-4 on E[x^2], which is the same
        # magnitude as c2 — the variance term E[x^2] - E[x]^2 then goes
        # negative enough to push SSIM far outside [-1, 1].
        return jax.lax.conv_general_dilated(
            img, kern, window_strides=(1, 1), padding="VALID",
            precision=jax.lax.Precision.HIGHEST,
        )

    mu_x = filt(x)
    mu_y = filt(y)
    mu_xx = filt(x * x)
    mu_yy = filt(y * y)
    mu_xy = filt(x * y)

    sigma_x = mu_xx - mu_x ** 2
    sigma_y = mu_yy - mu_y ** 2
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


_LPIPS_CACHE = {}


def lpips_fn():
    """LPIPS scorer: (pred, gt) HxWx3 float [0,1] -> float, or None.

    Resolution order:
      1. pure-jnp LPIPS (utils/lpips.py) with weights from the file named by
         ``$PRESIGHT_LPIPS_WEIGHTS`` (a torch LPIPS state_dict saved as .npz
         with numpy arrays, or a .pt/.pth loadable by CPU torch);
      2. torchmetrics' LPIPS (needs its pretrained download cache);
      3. None — eval_lpips degrades gracefully.

    Used only at eval cadence (every few thousand steps), so weight loading
    cost is off the hot path."""
    if "fn" in _LPIPS_CACHE:
        return _LPIPS_CACHE["fn"]

    import os

    path = os.environ.get("PRESIGHT_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        try:
            from . import lpips as L

            if path.endswith(".npz"):
                state = dict(np.load(path))
            else:
                import torch

                raw = torch.load(path, map_location="cpu")
                state = {k: v.numpy() for k, v in raw.items()}
            params = L.load_torch_state_dict(state)
            jitted = jax.jit(lambda p, g: L.lpips(params, p, g, normalize=True))

            def fn(pred: np.ndarray, gt: np.ndarray) -> float:
                return float(jitted(jnp.asarray(pred), jnp.asarray(gt)))

            _LPIPS_CACHE["fn"] = fn
            return fn
        except Exception as e:  # noqa: BLE001 - malformed weights file
            import warnings

            warnings.warn(
                f"PRESIGHT_LPIPS_WEIGHTS={path!r} could not be loaded "
                f"({type(e).__name__}: {e}); falling back to torchmetrics "
                "LPIPS (or disabling LPIPS if unavailable)",
                stacklevel=2,
            )
    try:
        import torch
        from torchmetrics.image.lpip import LearnedPerceptualImagePatchSimilarity

        metric = LearnedPerceptualImagePatchSimilarity(normalize=True)

        def fn(pred: np.ndarray, gt: np.ndarray) -> float:
            p = torch.tensor(np.moveaxis(pred, -1, 0)[None], dtype=torch.float32)
            g = torch.tensor(np.moveaxis(gt, -1, 0)[None], dtype=torch.float32)
            with torch.no_grad():
                return float(metric(p, g))

        _LPIPS_CACHE["fn"] = fn
    except Exception:  # noqa: BLE001 - no torchmetrics/weights offline
        import warnings

        # Loud, once: a run with eval_lpips=True that believes it logged
        # LPIPS but silently skipped it is worse than no LPIPS at all.
        warnings.warn(
            "LPIPS requested but NO perceptual weights are available: set "
            "$PRESIGHT_LPIPS_WEIGHTS to a torch LPIPS state_dict "
            "(.npz/.pt), or install torchmetrics with its pretrained "
            "cache. LPIPS will be ABSENT from eval metrics this run.",
            stacklevel=2,
        )
        _LPIPS_CACHE["fn"] = None
    return _LPIPS_CACHE["fn"]
