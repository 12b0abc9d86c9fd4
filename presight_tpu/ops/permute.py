"""Row permutation/padding as dual gathers (custom VJP) — no scatters.

Motivation (measured on v5e): XLA lowers the transpose of a row-gather to a
scatter-add, and scatter cost cliffs with the output buffer size (~16 ns/row
below ~8 MB, 62-86 ns/row above). The expert-routing machinery (sort by
expert, pad to block-aligned slabs, unsort) is built from gathers whose
indices are *permutations* (or injections), so their true transposes are
themselves gathers by the inverse mapping. Declaring that inverse explicitly
via jax.custom_vjp removes every big scatter from the routing hot path —
forward AND backward become ~4-6 ns/row gathers.

Used by ops/mlp.py (blocked grouped matmul layout) and the field routing in
models/nerfacto_ms.py. The hash-table gradient scatter (a genuine many-to-one
reduction) is handled separately by per-level table slabs in
ops/hash_encoding.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=())
def permute(x: jnp.ndarray, fwd_idx: jnp.ndarray, bwd_idx: jnp.ndarray,
            fwd_valid: Optional[jnp.ndarray] = None,
            bwd_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """y[i] = x[fwd_idx[i]] (zeroed where fwd_valid[i] is False).

    The caller asserts the mapping is injective on live slots: each row of
    ``x`` is read by AT MOST one live output slot, and ``bwd_idx[j]`` names
    that slot for row j (``bwd_valid[j]`` False when row j is read by no
    live slot). Under that contract the exact VJP is
    ``dx[j] = g[bwd_idx[j]]`` — a gather, not a scatter.

    Shapes: x (N, ...), fwd_idx (M,), bwd_idx (N,), y (M, ...).
    """
    y = x[fwd_idx]
    if fwd_valid is not None:
        y = y * fwd_valid.astype(y.dtype).reshape((-1,) + (1,) * (y.ndim - 1))
    return y


def _permute_fwd(x, fwd_idx, bwd_idx, fwd_valid=None, bwd_valid=None):
    return (
        permute(x, fwd_idx, bwd_idx, fwd_valid, bwd_valid),
        (fwd_idx, bwd_idx, fwd_valid, bwd_valid),
    )


def _permute_bwd(res, g):
    fwd_idx, bwd_idx, fwd_valid, bwd_valid = res
    if fwd_valid is not None:
        g = g * fwd_valid.astype(g.dtype).reshape((-1,) + (1,) * (g.ndim - 1))
    dx = g[bwd_idx]
    if bwd_valid is not None:
        dx = dx * bwd_valid.astype(dx.dtype).reshape((-1,) + (1,) * (dx.ndim - 1))
    return (dx, None, None, None, None)


permute.defvjp(_permute_fwd, _permute_bwd)


def sort_rows(x: jnp.ndarray, order: jnp.ndarray, inverse: jnp.ndarray) -> jnp.ndarray:
    """x[order] with a gather backward (g[inverse])."""
    return permute(x, order, inverse)


def unsort_rows(x_sorted: jnp.ndarray, order: jnp.ndarray, inverse: jnp.ndarray) -> jnp.ndarray:
    """x_sorted[inverse] with a gather backward (g[order])."""
    return permute(x_sorted, inverse, order)
