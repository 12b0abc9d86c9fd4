"""Ray samplers: spaced (stratified) initial sampling, inverse-CDF PDF
resampling, and the proposal-network sampling loop.

Reference specs: nerfstudio-0.3.3/nerfstudio/model_components/
ray_samplers.py — SpacedSampler (:53-130), PDFSampler (:251-372),
ProposalNetworkSampler (:523-614). PreSight uses a custom piecewise spacing
function parameterized by a threshold (models/PreSight/nerfacto_nusc_ms.py:
308-317): uniform below ``thr``, linear-in-disparity above.

TPU design: the samplers are pure functions of (rng, arrays); the spacing
function is a static dataclass (no Python closures survive into the pytree);
the proposal loop is unrolled at trace time (2 fixed rounds), and the
"update proposal grads this step" schedule becomes a static flag selecting
one of two jitted train-step variants (no data-dependent control flow).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .math import searchsorted, take_batched
from .rays import RayBundle, RaySamples, get_weights


@dataclasses.dataclass(frozen=True)
class SpacingSpec:
    """Monotone spacing warp s = fn(t), t = fn_inv(s).

    kind='piecewise_threshold': fn(t) = t/(2*thr) for t < thr else
    1 - thr/(2t); inverse 2*thr*s for s < 0.5 else thr/(2-2s). With thr=1
    this is the stock UniformLinDispPiecewiseSampler (ray_samplers.py:225-250);
    PreSight passes thr = 100 * pose_rescale_factor (nerfacto_nusc_ms.py:312-317).
    kind='uniform': identity.
    """

    kind: str = "piecewise_threshold"
    threshold: float = 1.0

    def fn(self, t: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "uniform":
            return t
        thr = self.threshold
        return jnp.where(t < thr, t / (2.0 * thr), 1.0 - thr / (2.0 * jnp.maximum(t, 1e-12)))

    def fn_inv(self, s: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "uniform":
            return s
        thr = self.threshold
        return jnp.where(s < 0.5, s * (2.0 * thr), thr / jnp.maximum(2.0 - 2.0 * s, 1e-12))


def spacing_to_euclidean(
    spacing_bins: jnp.ndarray, nears: jnp.ndarray, fars: jnp.ndarray, spec: SpacingSpec
) -> jnp.ndarray:
    """Map normalized [0,1] bins to euclidean distances (ray_samplers.py:115-119)."""
    s_near = spec.fn(nears)[..., None]
    s_far = spec.fn(fars)[..., None]
    return spec.fn_inv(spacing_bins * s_far + (1.0 - spacing_bins) * s_near)


def _make_ray_samples(
    ray_bundle: RayBundle, spacing_bins: jnp.ndarray, spec: SpacingSpec
) -> RaySamples:
    euclidean_bins = spacing_to_euclidean(spacing_bins, ray_bundle.nears, ray_bundle.fars, spec)
    return RaySamples(
        origins=ray_bundle.origins,
        directions=ray_bundle.directions,
        starts=euclidean_bins[..., :-1],
        ends=euclidean_bins[..., 1:],
        spacing_starts=spacing_bins[..., :-1],
        spacing_ends=spacing_bins[..., 1:],
        camera_indices=ray_bundle.camera_indices,
        video_ids=ray_bundle.video_ids,
    )


def spaced_sample(
    key: jax.Array,
    ray_bundle: RayBundle,
    num_samples: int,
    spec: SpacingSpec,
    stratified: bool = True,
    single_jitter: bool = True,
) -> RaySamples:
    """Stratified sampling under a spacing warp (ray_samplers.py:78-130)."""
    num_rays = ray_bundle.num_rays
    dtype = ray_bundle.origins.dtype
    bins = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=dtype)[None, :]  # (1, S+1)
    if stratified:
        if single_jitter:
            t_rand = jax.random.uniform(key, (num_rays, 1), dtype=dtype)
        else:
            t_rand = jax.random.uniform(key, (num_rays, num_samples + 1), dtype=dtype)
        bin_centers = (bins[..., 1:] + bins[..., :-1]) / 2.0
        bin_upper = jnp.concatenate([bin_centers, bins[..., -1:]], axis=-1)
        bin_lower = jnp.concatenate([bins[..., :1], bin_centers], axis=-1)
        bins = bin_lower + (bin_upper - bin_lower) * t_rand
    else:
        bins = jnp.broadcast_to(bins, (num_rays, num_samples + 1))
    return _make_ray_samples(ray_bundle, bins, spec)


def pdf_sample(
    key: jax.Array,
    ray_bundle: RayBundle,
    ray_samples: RaySamples,
    weights: jnp.ndarray,
    num_samples: int,
    spec: SpacingSpec,
    stratified: bool = True,
    single_jitter: bool = True,
    histogram_padding: float = 0.01,
    eps: float = 1e-5,
    include_original: bool = False,
) -> RaySamples:
    """Inverse-CDF resampling from previous weights (ray_samplers.py:276-372).

    ``weights`` is (R, S_prev). Bins are detached (stop_gradient), matching
    the reference.
    """
    num_bins = num_samples + 1
    dtype = weights.dtype

    w = weights + histogram_padding
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    padding = jax.nn.relu(eps - w_sum)
    w = w + padding / w.shape[-1]
    w_sum = w_sum + padding

    pdf = w / w_sum
    cdf = jnp.minimum(jnp.ones_like(pdf), jnp.cumsum(pdf, axis=-1))
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (R, S_prev+1)

    u_base = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins, dtype=dtype)
    u_base = jnp.broadcast_to(u_base, (*cdf.shape[:-1], num_bins))
    if stratified:
        if single_jitter:
            rand = jax.random.uniform(key, (*cdf.shape[:-1], 1), dtype=dtype) / num_bins
        else:
            rand = jax.random.uniform(key, (*cdf.shape[:-1], num_bins), dtype=dtype) / num_bins
        u = u_base + rand
    else:
        u = u_base + 1.0 / (2 * num_bins)

    existing_bins = jnp.concatenate(
        [ray_samples.spacing_starts, ray_samples.spacing_ends[..., -1:]], axis=-1
    )  # (R, S_prev+1)

    inds = searchsorted(cdf, u, side="right")
    below = jnp.clip(inds - 1, 0, existing_bins.shape[-1] - 1)
    above = jnp.clip(inds, 0, existing_bins.shape[-1] - 1)
    cdf_g0 = take_batched(cdf, below)
    bins_g0 = take_batched(existing_bins, below)
    cdf_g1 = take_batched(cdf, above)
    bins_g1 = take_batched(existing_bins, above)

    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0)), 0.0, 1.0)
    bins = bins_g0 + t * (bins_g1 - bins_g0)

    if include_original:
        bins = jnp.sort(jnp.concatenate([existing_bins, bins], axis=-1), axis=-1)

    bins = jax.lax.stop_gradient(bins)
    return _make_ray_samples(ray_bundle, bins, spec)


DensityFn = Callable[[jnp.ndarray], jnp.ndarray]  # positions (...,3) -> density (...,)


def proposal_sample(
    key: jax.Array,
    ray_bundle: RayBundle,
    density_fns: Sequence[DensityFn],
    num_proposal_samples: Tuple[int, ...],
    num_nerf_samples: int,
    spec: SpacingSpec,
    anneal: jnp.ndarray,
    stratified: bool = True,
    single_jitter: bool = True,
    stop_prop_grad: bool = False,
) -> Tuple[RaySamples, List[jnp.ndarray], List[RaySamples]]:
    """Proposal-network sampling loop (ray_samplers.py:572-614).

    Two proposal rounds (density eval + PDF resample) then final NeRF bins.
    ``anneal`` raises proposal weights to a power before resampling.
    ``stop_prop_grad`` mirrors the reference's no-grad density evals between
    schedule updates (static flag -> two compiled variants).

    Returns (final RaySamples, weights_list, ray_samples_list) where the
    lists contain the proposal rounds only (the model appends the final
    round itself, as in nerfacto_nusc_ms.py:503-505).
    """
    n_rounds = len(num_proposal_samples)
    weights_list: List[jnp.ndarray] = []
    ray_samples_list: List[RaySamples] = []

    weights = None
    ray_samples = None
    eps = float(jnp.finfo(ray_bundle.origins.dtype).eps)
    for i_level in range(n_rounds + 1):
        is_prop = i_level < n_rounds
        num_samples = num_proposal_samples[i_level] if is_prop else num_nerf_samples
        key, sub = jax.random.split(key)
        if i_level == 0:
            ray_samples = spaced_sample(
                sub, ray_bundle, num_samples, spec, stratified, single_jitter
            )
        else:
            annealed = jnp.power(weights, anneal)
            ray_samples = pdf_sample(
                sub,
                ray_bundle,
                ray_samples,
                annealed,
                num_samples,
                spec,
                stratified,
                single_jitter,
                eps=eps,
                include_original=False,
            )
        if is_prop:
            density = density_fns[i_level](ray_samples.positions())
            if stop_prop_grad:
                density = jax.lax.stop_gradient(density)
            weights = get_weights(ray_samples.deltas(), density)
            weights_list.append(weights)
            ray_samples_list.append(ray_samples)

    return ray_samples, weights_list, ray_samples_list
