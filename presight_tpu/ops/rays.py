"""Ray and sample datastructures as JAX pytrees, plus volume-rendering weights.

The reference's RayBundle/RaySamples/Frustums are torch TensorDataclasses
(nerfstudio-0.3.3/nerfstudio/cameras/rays.py:33-295). Here they are
flax.struct pytrees with dense (rays, samples) layouts — jit/vmap/shard-
friendly, no dynamic shapes, no Python closures inside (the reference's
``spacing_to_euclidean_fn`` closure becomes an explicit SpacingSpec).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RayBundle:
    """A batch of rays. All fields (R, ...)."""

    origins: jnp.ndarray  # (R, 3)
    directions: jnp.ndarray  # (R, 3), unit norm
    nears: jnp.ndarray  # (R,)
    fars: jnp.ndarray  # (R,)
    camera_indices: Optional[jnp.ndarray] = None  # (R,) int32
    video_ids: Optional[jnp.ndarray] = None  # (R,) int32

    @property
    def num_rays(self) -> int:
        return self.origins.shape[0]


@struct.dataclass
class RaySamples:
    """Dense samples along rays. starts/ends are euclidean bin edges along
    the (unit) ray direction; spacing_* are the normalized [0,1] bins before
    the spacing warp (rays.py:107-150)."""

    origins: jnp.ndarray  # (R, 3)
    directions: jnp.ndarray  # (R, 3)
    starts: jnp.ndarray  # (R, S)
    ends: jnp.ndarray  # (R, S)
    spacing_starts: jnp.ndarray  # (R, S)
    spacing_ends: jnp.ndarray  # (R, S)
    camera_indices: Optional[jnp.ndarray] = None  # (R,)
    video_ids: Optional[jnp.ndarray] = None  # (R,)

    @property
    def num_samples(self) -> int:
        return self.starts.shape[-1]

    def positions(self) -> jnp.ndarray:
        """Frustum centers: origin + direction * (start + end) / 2
        (rays.py:58-64 Frustums.get_positions)."""
        mids = (self.starts + self.ends) / 2.0
        return self.origins[..., None, :] + self.directions[..., None, :] * mids[..., None]

    def deltas(self) -> jnp.ndarray:
        return self.ends - self.starts

    def steps(self) -> jnp.ndarray:
        """Midpoint distance per sample, used by depth renderers."""
        return (self.starts + self.ends) / 2.0


def get_weights(deltas: jnp.ndarray, densities: jnp.ndarray) -> jnp.ndarray:
    """Volume-rendering weights from densities.

    alpha_i = 1 - exp(-sigma_i * delta_i)
    T_i     = exp(-sum_{j<i} sigma_j delta_j)
    w_i     = alpha_i * T_i, NaNs flushed to 0.

    Reference spec: nerfstudio-0.3.3/nerfstudio/cameras/rays.py:128-150.

    Args:
      deltas: (..., S) bin widths.
      densities: (..., S).
    Returns:
      weights (..., S).
    """
    delta_density = deltas * densities
    alphas = 1.0 - jnp.exp(-delta_density)
    # Exclusive cumsum of delta_density along the sample axis.
    csum = jnp.cumsum(delta_density[..., :-1], axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(delta_density[..., :1]), csum], axis=-1)
    transmittance = jnp.exp(-csum)
    weights = alphas * transmittance
    return jnp.nan_to_num(weights)
