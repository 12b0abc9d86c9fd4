"""Whole-image evaluation: chunked rendering + PSNR/SSIM/LPIPS.

Reference spec: nerfacto_nusc_ms.py:736-767 (get_outputs_for_camera_ray_
bundle: row-major chunks of eval_num_rays_per_chunk), my_pipeline.py:188-269
(eval image/all-images loops), data/PreSight/eval_image_dataset.py (whole-
image eval entries), and the metric trio at nerfacto_nusc_ms.py:647-686.
Chunks are padded to a fixed shape so one compiled render program serves
every camera.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import numpy as np

from ..data.cameras import CameraParams, generate_rays
from ..models.nerfacto_ms import NerfactoNuscMSConfig, forward
from ..utils import metrics as M


def _render_fn(config: NerfactoNuscMSConfig):
    import jax

    def fn(params, cameras, ray_index, rng, prop_grid=None):
        bundle = generate_rays(cameras, ray_index)
        out = forward(params, config, bundle, rng, anneal=1.0, train=False,
                      stop_prop_grad=True, prop_grid=prop_grid)
        res = {
            "rgb": out["rgb"],
            "accumulation": out["accumulation"],
            "depth": out["depth"],
            "expected_depth": out["expected_depth"],
        }
        if "semantics" in out:
            res["semantics"] = out["semantics"]
        return res

    return jax.jit(fn)


class ImageRenderer:
    """Chunked full-image rendering with one compiled program.

    ``mesh``: optional 1-D ``("data",)`` device mesh. Ray chunks are
    embarrassingly parallel, so each padded chunk's ``ray_index`` is placed
    sharded on the data axis (params/cameras must already be replicated, as
    Trainer.setup leaves them) and XLA partitions the render across the
    mesh — the reference renders its eval images on one GPU
    (nerfacto_nusc_ms.py:736-767); here 8 chips each take 1/8 of every
    chunk."""

    def __init__(self, config: NerfactoNuscMSConfig, chunk: Optional[int] = None,
                 mesh=None):
        self.config = config
        self.chunk = chunk or config.eval_num_rays_per_chunk
        self.mesh = mesh
        if mesh is not None and self.chunk % mesh.devices.size != 0:
            # Chunks are padded to a fixed shape anyway; round up so the
            # shard axis divides evenly.
            n = mesh.devices.size
            self.chunk = -(-self.chunk // n) * n
        self._fn = _render_fn(config)

    def _place_index(self, idx_p: np.ndarray):
        import jax
        import jax.numpy as jnp

        if self.mesh is None:
            return jnp.asarray(idx_p)
        from ..parallel import data_sharded

        return jax.device_put(idx_p, data_sharded(self.mesh))

    def render(self, params, cameras: CameraParams, camera_idx: int,
               H: int, W: int, rng=None, prop_grid=None) -> Dict[str, np.ndarray]:
        import jax

        if rng is None:
            rng = jax.random.PRNGKey(0)
        if prop_grid is None and self.config.use_prop_grid:
            from ..models.nerfacto_ms import make_prop_grid

            prop_grid = make_prop_grid(params, self.config)
        rows, cols = np.mgrid[0:H, 0:W]
        ray_index = np.stack(
            [np.full(H * W, camera_idx, np.int32),
             rows.reshape(-1).astype(np.int32),
             cols.reshape(-1).astype(np.int32)], axis=-1)
        outs: Dict[str, List[np.ndarray]] = {}
        for s in range(0, len(ray_index), self.chunk):
            idx = ray_index[s : s + self.chunk]
            pad = self.chunk - len(idx)
            idx_p = np.pad(idx, ((0, pad), (0, 0)))
            res = self._fn(params, cameras, self._place_index(idx_p), rng,
                           prop_grid)
            for k, v in res.items():
                outs.setdefault(k, []).append(np.asarray(v)[: len(idx)])
        stacked = {k: np.concatenate(v) for k, v in outs.items()}
        return {
            k: v.reshape(H, W, -1) if v.ndim > 1 else v.reshape(H, W)
            for k, v in stacked.items()
        }


def image_metrics(pred_rgb: np.ndarray, gt_rgb: np.ndarray,
                  with_lpips: bool = True) -> Dict[str, float]:
    """PSNR/SSIM/LPIPS (nerfacto_nusc_ms.py:647-686)."""
    import jax.numpy as jnp

    out = {
        "psnr": float(M.psnr(jnp.asarray(pred_rgb), jnp.asarray(gt_rgb))),
        "ssim": float(M.ssim(jnp.asarray(pred_rgb), jnp.asarray(gt_rgb))),
    }
    if with_lpips:
        fn = M.lpips_fn()
        if fn is not None:
            out["lpips"] = fn(pred_rgb.astype(np.float32), gt_rgb.astype(np.float32))
    return out


def evaluate_images(params, config: NerfactoNuscMSConfig, cameras: CameraParams,
                    items, indices=None, with_lpips: bool = True,
                    with_depth: bool = False, mesh=None) -> Dict[str, float]:
    """Mean metrics over eval images (my_pipeline.py:219-269).

    with_depth adds depth_rmse (meters) over pixels with valid GT depth
    (>0, < the config's depth upperbound) against the rendered expected
    depth rescaled out of pose-normalized units. Depth error is far more
    sensitive to sample-count/quadrature changes than PSNR/SSIM, so the
    quality study uses it as a third gate axis.
    """
    renderer = ImageRenderer(config, mesh=mesh)
    # The cached proposal grid depends only on params — derive it once and
    # pass it through every render() call instead of letting each image
    # rebuild it ((res+1)^3 field evals per expert per image otherwise).
    prop_grid = None
    if config.use_prop_grid:
        from ..models.nerfacto_ms import make_prop_grid

        prop_grid = make_prop_grid(params, config)
    if indices is None:
        indices = range(len(items))
    all_metrics: List[Dict[str, float]] = []
    upper = (config.lidar_depth_upperbound if config.use_lidar_loss
             else config.monodepth_depth_upperbound)
    for i in indices:
        item = items[i]
        outputs = renderer.render(params, cameras, i, item.H, item.W,
                                  prop_grid=prop_grid)
        gt = item.load_image()
        m = image_metrics(outputs["rgb"], gt, with_lpips)
        if with_depth and item.depth_path is not None:
            gt_d = item.load_depth()
            pred_d = outputs["expected_depth"].reshape(gt_d.shape)
            pred_d = pred_d / config.pose_scale_factor
            mask = (gt_d > 0) & (gt_d < upper)
            if mask.any():
                m["depth_rmse"] = float(
                    np.sqrt(np.mean((pred_d[mask] - gt_d[mask]) ** 2)))
        all_metrics.append(m)
    keys = {k for m in all_metrics for k in m}
    return {k: float(np.mean([m[k] for m in all_metrics if k in m]))
            for k in keys}
