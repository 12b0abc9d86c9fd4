"""Volume-rendering reductions: RGB, accumulation, depth (median/expected).

Reference specs: nerfstudio-0.3.3/nerfstudio/model_components/renderers.py —
RGBRenderer.combine_rgb (:69-117), AccumulationRenderer (:286-315),
DepthRenderer (:317-385). PreSight's batches are dense (rays, samples), so
every reduction is a plain sum/cumsum along the sample axis (the nerfacc
packed-sample paths are unused; SURVEY.md C3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import searchsorted
from .rays import RaySamples


def render_rgb(rgb: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """sum_i w_i c_i with no background blending (background 'random'/'black'
    returns the raw composite; renderers.py:93-117)."""
    return jnp.sum(weights[..., None] * rgb, axis=-2)


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    """sum_i w_i (renderers.py:286-315)."""
    return jnp.sum(weights, axis=-1)


def render_semantics(semantics: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted feature composite (nerfacto_nusc_ms.py:528-531)."""
    return jnp.sum(weights[..., None] * semantics, axis=-2)


def render_depth_median(
    weights: jnp.ndarray, ray_samples: RaySamples, threshold: float = 0.5
) -> jnp.ndarray:
    """Depth where cumulative weight crosses ``threshold``
    (renderers.py:352-364, method='threshold')."""
    steps = ray_samples.steps()  # (R, S)
    cumulative = jnp.cumsum(weights, axis=-1)
    split = jnp.full((*weights.shape[:-1], 1), threshold, dtype=weights.dtype)
    idx = searchsorted(cumulative, split, side="left")
    idx = jnp.clip(idx, 0, steps.shape[-1] - 1)
    return jnp.take_along_axis(steps, idx, axis=-1)[..., 0]


def render_depth_expected(weights: jnp.ndarray, ray_samples: RaySamples) -> jnp.ndarray:
    """Expected depth sum(w * t) / (sum(w) + eps), clipped to the batch's
    step range (renderers.py:365-383, method='expected')."""
    eps = 1e-10
    steps = ray_samples.steps()
    depth = jnp.sum(weights * steps, axis=-1) / (jnp.sum(weights, axis=-1) + eps)
    return jnp.clip(depth, jnp.min(steps), jnp.max(steps))
