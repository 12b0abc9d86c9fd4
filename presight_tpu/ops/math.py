"""Core pointwise math used across fields and renderers.

Functional specs derived from the reference implementation (cited per
function); everything here is pure jnp and safe under jit/vmap/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    """exp with a clamped backward pass.

    Forward ``exp(x)``; backward ``g * exp(clamp(x, -15, 15))``. Prevents
    exploding gradients from large density logits.

    Reference spec: nerfstudio-0.3.3/nerfstudio/field_components/activations.py:14-40.
    """
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def contract_linf(x: jnp.ndarray) -> jnp.ndarray:
    """MipNeRF-360 scene contraction with the L-infinity norm.

    f(x) = x                      if ||x||_inf <= 1
         = (2 - 1/||x||) * x/||x|| otherwise

    Maps all of space into a cube of side 4 ([-2, 2]^3).

    Reference spec:
    nerfstudio-0.3.3/nerfstudio/field_components/spatial_distortions.py:42-90
    (order=inf as used by the PreSight model).
    """
    mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    # Guard the division for mag ~ 0 (inside the unit cube the branch is unused).
    safe_mag = jnp.maximum(mag, 1e-12)
    contracted = (2.0 - 1.0 / safe_mag) * (x / safe_mag)
    return jnp.where(mag < 1.0, x, contracted)


def normalize_aabb(positions: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
    """Normalize world positions into the AABB frame, output in [-1, 1].

    ``aabb`` is (..., 2, 3) with [min, max] rows; broadcasting against
    positions (..., 3) is supported (per-sample AABBs for expert routing).

    Reference spec: nerfstudio-0.3.3/nerfstudio/fields/PreSight/utils.py:6-10.
    """
    aabb_min = aabb[..., 0, :]
    aabb_max = aabb[..., 1, :]
    positions = (positions - aabb_min) / (aabb_max - aabb_min)
    return positions * 2.0 - 1.0


def contract_positions(positions: jnp.ndarray, aabb: jnp.ndarray):
    """AABB-normalize -> L-inf contraction -> map [-2,2] to [0,1], with the
    out-of-range selector that zeroes coordinates outside (0, 1).

    Returns (unit_positions, selector) where selector is (...,) bool.

    Reference spec: nerfstudio-0.3.3/nerfstudio/fields/PreSight/ingp_field.py:168-191
    (density_fn normalization path shared by all PreSight fields).
    """
    positions = normalize_aabb(positions, aabb)
    positions = contract_linf(positions)
    positions = (positions + 2.0) / 4.0
    selector = jnp.all((positions > 0.0) & (positions < 1.0), axis=-1)
    positions = positions * selector[..., None]
    return positions, selector


def sh_encoding(directions: jnp.ndarray, levels: int = 4) -> jnp.ndarray:
    """Real spherical-harmonics basis up to ``levels`` (levels**2 components).

    Pass *unit* directions in [-1, 1]. Note: the reference default backend is
    tcnn's SH encoding, which takes the [0,1]-shifted directions from
    get_normalized_directions and internally maps them back to [-1,1] before
    evaluating the polynomial — so the polynomial is evaluated on true unit
    directions. We follow the tcnn (deployed) semantics; callers feed raw
    unit directions and skip the [0,1] shift. (The nerfstudio torch fallback
    evaluates the polynomial on the shifted values instead — an upstream
    inconsistency we do not reproduce.)

    Reference spec: nerfstudio-0.3.3/nerfstudio/utils/math.py:27-100,
    encodings.py:686-718.
    """
    if not 1 <= levels <= 4:
        raise ValueError(f"SH levels must be in [1, 4], got {levels}")
    x = directions[..., 0]
    y = directions[..., 1]
    z = directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z

    comps = [jnp.full(x.shape, 0.28209479177387814, dtype=directions.dtype)]
    if levels > 1:
        comps += [
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
        ]
    if levels > 2:
        comps += [
            1.0925484305920792 * x * y,
            1.0925484305920792 * y * z,
            0.9461746957575601 * zz - 0.31539156525251999,
            1.0925484305920792 * x * z,
            0.5462742152960396 * (xx - yy),
        ]
    if levels > 3:
        comps += [
            0.5900435899266435 * y * (3 * xx - yy),
            2.890611442640554 * x * y * z,
            0.4570457994644658 * y * (5 * zz - 1),
            0.3731763325901154 * z * (5 * zz - 3),
            0.4570457994644658 * x * (5 * zz - 1),
            1.445305721320277 * z * (xx - yy),
            0.5900435899266435 * x * (xx - 3 * yy),
        ]
    return jnp.stack(comps, axis=-1)


# Above this many cube elements the all-pairs compare-reduce gives way to
# the double-argsort rank path. Module-level so tests can patch it low and
# exercise the fallback without multi-GB inputs.
_SEARCHSORTED_CUBE_LIMIT = 1 << 31


def searchsorted(a: jnp.ndarray, v: jnp.ndarray, side: str = "right") -> jnp.ndarray:
    """Batched searchsorted: ``a`` (..., M) sorted along the last axis,
    ``v`` (..., K) *sorted along the last axis*; returns int32 insertion
    indices in [0, M].

    jnp.searchsorted only supports 1-D ``a``. The all-pairs
    compare-and-reduce "cube" is the fast path: XLA fuses the comparison
    into the reduction (nothing materializes) and one VPU pass over
    R*M*K elements measures ~3.6 ms even at 275M on v5e — beating both a
    double-argsort rank trick (~5 ms) and a take_along_axis bisection
    (~10-40x slower: each probe is a per-element row gather). The sort
    path remains only as an asymptotic fallback for astronomically large
    cubes; the bisection was measured and rejected.
    """
    m = a.shape[-1]
    k = v.shape[-1]
    rows = 1
    for d in a.shape[:-1]:
        rows *= d
    if side not in ("right", "left"):
        raise ValueError(f"invalid side {side!r}")
    if rows * m * k <= _SEARCHSORTED_CUBE_LIMIT:
        if side == "right":
            mask = a[..., :, None] <= v[..., None, :]
        else:
            mask = a[..., :, None] < v[..., None, :]
        return jnp.sum(mask, axis=-2).astype(jnp.int32)

    if side == "right":
        # Stable sort puts equal a's before v's -> rank counts a <= v.
        # Requires v sorted along the last axis (all internal callers do).
        comb = jnp.concatenate([a, v], axis=-1)
        order = jnp.argsort(comb, axis=-1, stable=True)
        ranks = jnp.argsort(order, axis=-1, stable=True)
        rank_v = ranks[..., m:]
    else:
        comb = jnp.concatenate([v, a], axis=-1)
        order = jnp.argsort(comb, axis=-1, stable=True)
        ranks = jnp.argsort(order, axis=-1, stable=True)
        rank_v = ranks[..., :k]
    idx = rank_v - jnp.arange(k, dtype=rank_v.dtype)
    return idx.astype(jnp.int32)


def take_batched(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched per-row take: arr (..., M), idx (..., K) -> (..., K).

    Replaces jnp.take_along_axis on small last axes with a fused
    one-hot masked-sum: on v5e a (8192, 130)->(8192, 129) take_along_axis
    costs ~14 ms (each element lowers to its own row gather) while the
    compare+select+reduce pass costs ~3.8 ms and its transpose (backward)
    is the same cube pass instead of a scatter. Use for bin/CDF indexing
    (M up to a few hundred); large-row gathers should stay gathers.
    """
    m = arr.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)  # (M, 1)
    mask = idx[..., None, :] == iota  # (..., M, K)
    return jnp.sum(jnp.where(mask, arr[..., :, None], 0), axis=-2)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Shape-stable replacement for ``values[mask].mean()``.

    The reference relies on boolean indexing (dynamic shapes); under jit we
    compute sum(mask * values) / sum(mask) instead. ``mask`` broadcasts
    against ``values``; the denominator counts broadcast elements so the
    result matches the dynamic-shape mean exactly.
    """
    mask = mask.astype(values.dtype)
    mask_b = jnp.broadcast_to(mask, values.shape)
    total = jnp.sum(values * mask_b)
    count = jnp.sum(mask_b)
    return total / jnp.maximum(count, eps)
