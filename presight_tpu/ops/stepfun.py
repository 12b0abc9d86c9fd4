"""Step-function math: distortion loss, MipNeRF-360 interlevel loss, and the
zip-NeRF anti-aliased interlevel loss (blurred step functions + quadratic
CDF interpolation).

Reference specs:
  * ray_samples_to_sdist / interlevel_loss / lossfun_distortion:
    nerfstudio-0.3.3/nerfstudio/model_components/losses.py:100-149
  * blur_stepfun / sorted_interp_quad / z_anti_anliasing_interlevel_loss:
    nerfstudio-0.3.3/nerfstudio/model_components/PreSight/losses.py:127-205
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .math import searchsorted, take_batched
from .rays import RaySamples


def ray_samples_to_sdist(ray_samples: RaySamples) -> jnp.ndarray:
    """Normalized bin edges (R, S+1) (losses.py:100-105)."""
    return jnp.concatenate(
        [ray_samples.spacing_starts, ray_samples.spacing_ends[..., -1:]], axis=-1
    )


def lossfun_distortion(t: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """MipNeRF-360 distortion: double integral of w(u)w(v)|u-v| plus the
    intra-bin term (losses.py:130-141).

    Computed in O(S) with prefix sums instead of the reference's O(S^2)
    |ut_i - ut_j| cube: for sorted midpoints,
    sum_ij w_i w_j |u_i - u_j| = 2 * sum_i w_i (u_i * csum_{j<i} w_j
    - csum_{j<i} w_j u_j)."""
    ut = (t[..., 1:] + t[..., :-1]) / 2.0
    cw = jnp.cumsum(w, axis=-1) - w          # exclusive prefix of w
    cwu = jnp.cumsum(w * ut, axis=-1) - w * ut
    loss_inter = 2.0 * jnp.sum(w * (ut * cw - cwu), axis=-1)
    loss_intra = jnp.sum(w ** 2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3.0
    return loss_inter + loss_intra


def distortion_loss(
    weights_list: Sequence[jnp.ndarray], ray_samples_list: Sequence[RaySamples]
) -> jnp.ndarray:
    """Mean distortion of the final (NeRF) round (losses.py:144-149)."""
    c = ray_samples_to_sdist(ray_samples_list[-1])
    w = weights_list[-1]
    return jnp.mean(lossfun_distortion(c, w))


def outer(
    t0_starts: jnp.ndarray,
    t0_ends: jnp.ndarray,
    t1_starts: jnp.ndarray,
    t1_ends: jnp.ndarray,
    y1: jnp.ndarray,
) -> jnp.ndarray:
    """Mass of histogram (t1, y1) covering each [t0_start, t0_end] bin
    (losses.py:48-77)."""
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1
    )
    idx_lo = (
        searchsorted(t1_starts, t0_starts, side="right") - 1
    )
    idx_lo = jnp.clip(idx_lo, 0, y1.shape[-1] - 1)
    idx_hi = searchsorted(t1_ends, t0_ends, side="right")
    idx_hi = jnp.clip(idx_hi, 0, y1.shape[-1] - 1)
    cy1_lo = take_batched(cy1[..., :-1], idx_lo)
    cy1_hi = take_batched(cy1[..., 1:], idx_hi)
    return cy1_hi - cy1_lo


def lossfun_outer(
    t: jnp.ndarray, w: jnp.ndarray, t_env: jnp.ndarray, w_env: jnp.ndarray
) -> jnp.ndarray:
    """MipNeRF-360 proposal loss: penalize proposal histograms (t_env, w_env)
    that underestimate the NeRF histogram (t, w) (losses.py:80-97)."""
    w_outer = outer(t[..., :-1], t[..., 1:], t_env[..., :-1], t_env[..., 1:], w_env)
    return jnp.clip(w - w_outer, 0.0, None) ** 2 / (w + 1e-7)


def interlevel_loss(
    weights_list: Sequence[jnp.ndarray], ray_samples_list: Sequence[RaySamples]
) -> jnp.ndarray:
    """Plain MipNeRF-360 interlevel loss (losses.py:108-126)."""
    c = jax.lax.stop_gradient(ray_samples_to_sdist(ray_samples_list[-1]))
    w = jax.lax.stop_gradient(weights_list[-1])
    total = 0.0
    for ray_samples, weights in zip(ray_samples_list[:-1], weights_list[:-1]):
        cp = ray_samples_to_sdist(ray_samples)
        wp = weights
        total = total + jnp.mean(lossfun_outer(c, w, cp, wp))
    return total


def blur_stepfun(x: jnp.ndarray, y: jnp.ndarray, r: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convolve a step function with a box of half-width r
    (PreSight/losses.py:127-139, zip-NeRF stepfun).

    x: (R, N+1) sorted knots; y: (R, N) step values.
    Returns (xr (R, 2N+2), yr (R, 2N+2)).
    """
    xr_cat = jnp.concatenate([x - r, x + r], axis=-1)
    y1 = (
        jnp.concatenate([y, jnp.zeros_like(y[..., :1])], axis=-1)
        - jnp.concatenate([jnp.zeros_like(y[..., :1]), y], axis=-1)
    ) / (2.0 * r)
    # Joint key/payload sort: the TPU sort network carries the payload with
    # the keys (~10x faster than argsort + take_along_axis re-gathers).
    xr, y2_full = jax.lax.sort(
        (xr_cat, jnp.concatenate([y1, -y1], axis=-1)), dimension=-1, num_keys=1
    )
    y2 = y2_full[..., :-1]
    yr = jnp.cumsum(
        (xr[..., 1:] - xr[..., :-1]) * jnp.cumsum(y2, axis=-1), axis=-1
    )
    yr = jnp.clip(yr, 0.0, None)
    yr = jnp.concatenate([jnp.zeros_like(yr[..., :1]), yr], axis=-1)
    return xr, yr


def sorted_interp_quad(
    x: jnp.ndarray, xp: jnp.ndarray, fpdf: jnp.ndarray, fcdf: jnp.ndarray
) -> jnp.ndarray:
    """Quadratic interpolation of a CDF defined by trapezoid-integrated pdf
    knots (PreSight/losses.py:141-165; originally zip-NeRF stepfun's
    searchsorted-based sorted_interp). All inputs sorted along the last
    axis.

    The torch port emulates searchsorted with O(K*M) max/min-over-mask
    tensors; here the bracketing indices come straight from the batched
    searchsorted (identical for strictly increasing knots, and O(R*(M+K))
    memory instead of a multi-GB boolean cube at production ray counts)."""
    i_right = searchsorted(xp, x, side="right")  # first xp > x
    idx0 = jnp.clip(i_right - 1, 0, xp.shape[-1] - 1)
    idx1 = jnp.clip(i_right, 0, xp.shape[-1] - 1)

    fcdf0 = take_batched(fcdf, idx0)
    fcdf1 = take_batched(fcdf, idx1)
    fpdf0 = take_batched(fpdf, idx0)
    fpdf1 = take_batched(fpdf, idx1)
    xp0 = take_batched(xp, idx0)
    xp1 = take_batched(xp, idx1)

    offset = jnp.clip(jnp.nan_to_num((x - xp0) / (xp1 - xp0)), 0.0, 1.0)
    return fcdf0 + (x - xp0) * (fpdf0 + fpdf1 * offset + fpdf0 * (1.0 - offset)) / 2.0


def z_anti_aliasing_interlevel_loss(
    weights_list: Sequence[jnp.ndarray],
    ray_samples_list: Sequence[RaySamples],
    pulse_width: Tuple[float, ...] = (0.03, 0.003),
) -> jnp.ndarray:
    """zip-NeRF anti-aliased interlevel loss (PreSight/losses.py:167-205).

    The final round's normalized histogram is blurred with per-proposal-round
    pulse widths; each proposal round is penalized for underestimating the
    blurred CDF mass in its bins.
    """
    c = jax.lax.stop_gradient(ray_samples_to_sdist(ray_samples_list[-1]))  # (R, S+1)
    w = jax.lax.stop_gradient(weights_list[-1])  # (R, S)

    w_normalized = w / (c[..., 1:] - c[..., :-1])

    blurred = []
    for r in pulse_width:
        cb, wb = blur_stepfun(c, w_normalized, r)
        area = 0.5 * (wb[..., 1:] + wb[..., :-1]) * (cb[..., 1:] - cb[..., :-1])
        cdf = jnp.concatenate(
            [jnp.zeros_like(area[..., :1]), jnp.cumsum(area, axis=-1)], axis=-1
        )
        blurred.append((cb, wb, cdf))

    loss = 0.0
    for i, (ray_samples, weights) in enumerate(zip(ray_samples_list[:-1], weights_list[:-1])):
        cp = ray_samples_to_sdist(ray_samples)  # (R, P+1)
        wp = weights  # (R, P)
        cb, wb, cdf = blurred[i]
        cdf_interp = sorted_interp_quad(cp, cb, wb, cdf)
        w_s = jnp.diff(cdf_interp, axis=-1)
        loss = loss + jnp.mean(jnp.clip(w_s - wp, 0.0, None) ** 2 / (wp + 1e-5))
    return loss
