"""PreSight supervision losses, shape-stable for jit.

Reference spec: nerfstudio-0.3.3/nerfstudio/model_components/PreSight/
losses.py:24-125 (line_of_sight_loss, expected_depth_loss,
expected_monodepth_loss, sky_loss, semantic_loss). The reference's masked
means over boolean-indexed tensors become sum(mask*x)/sum(mask).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import masked_mean

URF_SIGMA_SCALE_FACTOR = 3.0
EPS = 1e-7


def normalize_depth(depth: jnp.ndarray, upper_bound: float = 75.0) -> jnp.ndarray:
    return jnp.clip(depth / upper_bound, 0.0, 1.0)


def _gaussian_pdf(x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """exp(Normal(0, sigma).log_prob(x)) as in losses.py:54-58."""
    return jnp.exp(-0.5 * (x / sigma) ** 2) / (sigma * jnp.sqrt(2.0 * jnp.pi))


def line_of_sight_loss(
    weights: jnp.ndarray,  # (R, S)
    termination_depth: jnp.ndarray,  # (R,)
    steps: jnp.ndarray,  # (R, S) euclidean midpoints, un-scaled
    sigma: jnp.ndarray,  # scalar
    sky_mask: jnp.ndarray = None,  # (R,) 1.0 for sky
    upper_bound: float = 75.0,
) -> jnp.ndarray:
    """Urban-Radiance-Fields line-of-sight loss (losses.py:28-65).

    Near the GT termination depth the weights must match a narrow Gaussian
    (sigma / 3); before it, weights are pushed to zero. Mean over rays with
    valid depth (and not sky)."""
    depth_mask = (termination_depth > 1.0) & (termination_depth < upper_bound)
    if sky_mask is not None:
        depth_mask = depth_mask & (sky_mask == 0.0)

    steps = jax.lax.stop_gradient(steps)
    td = termination_depth[..., None]  # (R, 1)
    target_sigma = sigma / URF_SIGMA_SCALE_FACTOR
    near_mask = (steps <= td + sigma) & (steps >= td - sigma)
    near = (weights - _gaussian_pdf(steps - td, target_sigma)) ** 2
    near = jnp.sum(near_mask * near, axis=-1)
    empty_mask = steps < td - sigma
    empty = jnp.sum(empty_mask * weights ** 2, axis=-1)
    loss = near + empty
    return masked_mean(loss, depth_mask)


def expected_depth_loss(
    termination_depth: jnp.ndarray,  # (R,)
    predicted_depth: jnp.ndarray,  # (R,)
    upper_bound: float = 75.0,
) -> jnp.ndarray:
    """MSE on normalized expected depth over valid lidar rays (losses.py:67-81)."""
    depth_mask = (termination_depth > 1.0) & (termination_depth < upper_bound)
    td = normalize_depth(termination_depth, upper_bound)
    pd = normalize_depth(predicted_depth, upper_bound)
    return masked_mean((td - pd) ** 2, depth_mask)


def expected_monodepth_loss(
    termination_depth: jnp.ndarray,
    predicted_depth: jnp.ndarray,
    sky_mask: jnp.ndarray,
    upper_bound: float = 50.0,
    inverse: bool = False,
) -> jnp.ndarray:
    """Monodepth variant with optional inverse-depth metric (losses.py:83-104)."""
    depth_mask = (
        (termination_depth > 1.0) & (termination_depth < upper_bound) & (sky_mask == 0.0)
    )
    if inverse:
        td = 1.0 / (termination_depth + 5.0)
        pd = 1.0 / (predicted_depth + 5.0)
    else:
        td = normalize_depth(termination_depth, upper_bound)
        pd = normalize_depth(predicted_depth, upper_bound)
    return masked_mean((td - pd) ** 2, depth_mask)


def sky_loss(accumulation: jnp.ndarray, sky_mask: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """BCE between ray accumulation and (1 - sky) (losses.py:106-115)."""
    target = 1.0 - sky_mask
    acc = jnp.clip(accumulation, eps, 1.0 - eps)
    loss = -(target * jnp.log(acc) + (1.0 - target) * jnp.log(1.0 - acc))
    return jnp.mean(loss)


def semantic_loss(pred: jnp.ndarray, target: jnp.ndarray, clip: bool = True) -> jnp.ndarray:
    """MSE against (clipped) DINO feature targets (losses.py:117-124)."""
    if clip:
        target = jnp.clip(target, 0.0, 1.0)
    return jnp.mean((pred - target) ** 2)


def rgb_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Plain MSE (nerfacto_nusc_ms.py:379, 567)."""
    return jnp.mean((pred - gt) ** 2)
