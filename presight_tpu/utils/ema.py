"""Model EMA with MEGVII/BEVDepth ramped decay, as a pure pytree transform.

Reference spec: occupancy/mmdet3d/core/hook/ema.py (ModelEMA + MEGVIIEMAHook)
— every PreSight BEVDet occupancy config trains under it
(bevdet-occ-r50d-8x4-24e_wcamprior_randomdrop.py:281). Semantics:

  d(t)     = decay * (1 - exp(-t / ramp))        # ramp helps early epochs
  ema_t    = d(t) * ema_{t-1} + (1 - d(t)) * params_t
  t starts at 1 on the first update; resume restores (ema, t).

TPU-native: the EMA is a second parameter pytree updated inside the jitted
train step (one fused multiply-add per leaf) instead of a host-side hook
mutating module state.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: Any  # EMA pytree, same structure as the model params
    updates: jnp.ndarray  # () int32 update counter


def ema_init(params, init_updates: int = 0) -> EMAState:
    """EMA starts as a copy of the initial parameters (ema.py:39).

    ``init_updates`` seeds the ramp counter: MEGVIIEMAHook resumes mid-run
    with ``init_updates=10560`` in the shipped PreSight config
    (bevdet-occ-r50d-8x4-24e_wcamprior_randomdrop.py:281), which puts d(t)
    immediately at the asymptotic decay instead of replaying the ramp.
    """
    return EMAState(
        params=jax.tree_util.tree_map(jnp.asarray, params),
        updates=jnp.asarray(init_updates, jnp.int32),
    )


def ema_update(state: EMAState, params, decay: float = 0.9990,
               ramp: float = 2000.0) -> EMAState:
    """One EMA step (ema.py:48-59). jit-safe; call inside the train step."""
    t = state.updates + 1
    d = decay * (1.0 - jnp.exp(-t.astype(jnp.float32) / ramp))
    new = jax.tree_util.tree_map(
        lambda e, p: e * d + (1.0 - d) * p, state.params, params
    )
    return EMAState(params=new, updates=t)
