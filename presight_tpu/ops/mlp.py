"""Functional MLPs, single-expert and expert-grouped (ragged) variants.

The reference's field MLPs (nerfstudio-0.3.3/nerfstudio/field_components/
mlp.py:65-179) are plain Linear/ReLU stacks: ``num_layers`` linear layers
where the last maps to ``out_dim`` (num_layers==1 means a single linear).
PreSight's default implementation is ``tcnn+fp32`` which routes MLPs through
the *torch* path (ingp_field.py:129), so torch-Linear semantics are the
parity target, including the default torch init
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias).

TPU design: widths of 32/64 map onto MXU tiles once the sample axis is
batched; the multi-scene router evaluates per-expert MLPs through
``jax.lax.ragged_dot`` over samples sorted by expert, which XLA lowers to
grouped matmuls — no per-expert Python loop, no dynamic shapes.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = List[Tuple[jnp.ndarray, jnp.ndarray]]  # [(W (in,out), b (out,)), ...]


def mlp_layer_dims(in_dim: int, num_layers: int, layer_width: int, out_dim: int) -> List[Tuple[int, int]]:
    """Layer (fan_in, fan_out) list matching mlp.py:138-153."""
    if num_layers == 1:
        return [(in_dim, out_dim)]
    dims = [(in_dim, layer_width)]
    dims += [(layer_width, layer_width)] * (num_layers - 2)
    dims += [(layer_width, out_dim)]
    return dims


def init_mlp(
    key: jax.Array,
    in_dim: int,
    num_layers: int,
    layer_width: int,
    out_dim: int,
    num_experts: int = 0,
    dtype=jnp.float32,
) -> Params:
    """torch.nn.Linear default init. num_experts=0 -> unstacked (in,out)
    matrices; num_experts>=1 -> stacked (E, in, out) for the router."""
    params: Params = []
    for fan_in, fan_out in mlp_layer_dims(in_dim, num_layers, layer_width, out_dim):
        key, kw, kb = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(fan_in)
        shape_w = (num_experts, fan_in, fan_out) if num_experts else (fan_in, fan_out)
        shape_b = (num_experts, fan_out) if num_experts else (fan_out,)
        w = jax.random.uniform(kw, shape_w, dtype=dtype, minval=-bound, maxval=bound)
        b = jax.random.uniform(kb, shape_b, dtype=dtype, minval=-bound, maxval=bound)
        params.append((w, b))
    return params


def apply_mlp(
    params: Params,
    x: jnp.ndarray,
    out_activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Plain MLP forward: ReLU between layers, optional output activation."""
    n = len(params)
    for i, (w, b) in enumerate(params):
        x = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype) + b.astype(x.dtype)
        if i < n - 1:
            x = jax.nn.relu(x)
    if out_activation is not None:
        x = out_activation(x)
    return x


def apply_mlp_grouped(
    params: Params,
    x: jnp.ndarray,
    group_sizes: jnp.ndarray,
    expert_ids_sorted: jnp.ndarray,
    out_activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Expert-grouped MLP over samples sorted by expert.

    Args:
      params: stacked per-expert layers [(W (E,in,out), b (E,out)), ...].
      x: (N, in) inputs *sorted by expert id*.
      group_sizes: (E,) int32 — count of rows per expert (sums to N).
      expert_ids_sorted: (N,) int32 — expert of each (sorted) row, used for
        the bias gather.
      out_activation: optional final activation.

    Returns (N, out).
    """
    n = len(params)
    for i, (w, b) in enumerate(params):
        x = jax.lax.ragged_dot(x, w.astype(x.dtype), group_sizes)
        x = x + b.astype(x.dtype)[expert_ids_sorted]
        if i < n - 1:
            x = jax.nn.relu(x)
    if out_activation is not None:
        x = out_activation(x)
    return x


def apply_mlp_dense_experts(
    params: Params,
    x: jnp.ndarray,
    expert_ids: jnp.ndarray,
    num_experts: int,
    out_activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Reference path for testing: evaluate every expert on every sample and
    select per sample (E x FLOPs; numerically identical to grouped)."""
    stacked = jax.vmap(
        lambda e: apply_mlp([(w[e], b[e]) for (w, b) in params], x, out_activation)
    )(jnp.arange(num_experts))  # (E, N, out)
    return jnp.take_along_axis(stacked, expert_ids[None, :, None], axis=0)[0]
