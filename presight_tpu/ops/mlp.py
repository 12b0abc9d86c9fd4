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

from .permute import permute

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


GROUP_BLOCK = 512  # rows per expert block in the grouped matmul


def block_offsets(group_sizes: jnp.ndarray, block: int):
    """Per-expert (padded_sizes, pad_offsets, orig_offsets) of the
    block-aligned slab layout.

    This is THE definition of the padding rule: _blocked_layout (pad/unpad
    maps inside grouped matmuls) and fields/router.py build_padded_routing
    (the fused from_slot arithmetic) both derive from it, so they can never
    disagree on where an expert's slab starts."""
    padded_sizes = ((group_sizes + block - 1) // block) * block
    pad_offsets = jnp.concatenate(
        [jnp.zeros((1,), group_sizes.dtype), jnp.cumsum(padded_sizes)[:-1]]
    )
    orig_offsets = jnp.concatenate(
        [jnp.zeros((1,), group_sizes.dtype), jnp.cumsum(group_sizes)[:-1]]
    )
    return padded_sizes, pad_offsets, orig_offsets


def _blocked_layout(group_sizes: jnp.ndarray, n: int, block: int):
    """Padded block layout for expert-grouped matmuls.

    Each expert's contiguous run of sorted rows is padded up to a multiple
    of ``block`` so every block belongs to exactly one expert. Everything is
    computed analytically (offset arithmetic — no scatters):

    Returns (dest (N,), src (n_pad,), slot_valid (n_pad,),
    block_expert (num_blocks,), n_pad) where ``dest`` maps sorted row i to
    its padded slot and ``src`` maps each padded slot back to its sorted row
    (``slot_valid`` False on padding slots).
    """
    e = group_sizes.shape[0]
    # Static upper bound on padded length, rounded to a block multiple.
    n_pad = (-(-n // block) + e) * block
    padded_sizes, pad_offsets, orig_offsets = block_offsets(group_sizes, block)
    # expert of each sorted row, derived from offsets (rows >= offset_e).
    row_ids = jnp.arange(n, dtype=group_sizes.dtype)
    expert_of_row = jnp.sum(
        row_ids[:, None] >= (orig_offsets + group_sizes)[None, :], axis=-1
    ).astype(jnp.int32)
    dest = pad_offsets[expert_of_row] + (row_ids - orig_offsets[expert_of_row])

    num_blocks = n_pad // block
    block_starts = jnp.arange(num_blocks, dtype=group_sizes.dtype) * block
    block_expert = (
        jnp.sum(block_starts[:, None] >= (pad_offsets + padded_sizes)[None, :], axis=-1)
    ).astype(jnp.int32)
    block_expert = jnp.minimum(block_expert, e - 1)

    # Inverse mapping, slot -> sorted row, by the same offset arithmetic.
    slot_ids = jnp.arange(n_pad, dtype=group_sizes.dtype)
    e_slot = jnp.repeat(block_expert, block)
    slot_off = slot_ids - pad_offsets[e_slot]
    src = orig_offsets[e_slot] + slot_off
    slot_valid = (slot_off >= 0) & (slot_off < group_sizes[e_slot])
    src = jnp.clip(src, 0, max(n - 1, 0)).astype(jnp.int32)
    return dest.astype(jnp.int32), src, slot_valid, block_expert, n_pad


def apply_mlp_grouped(
    params: Params,
    x: jnp.ndarray,
    group_sizes: jnp.ndarray,
    out_activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    block: int = GROUP_BLOCK,
) -> jnp.ndarray:
    """Expert-grouped MLP over samples sorted by expert.

    Implemented as a *blocked* grouped matmul: sorted rows are arranged
    into per-expert block-aligned slabs (padding < block rows per expert),
    each block gathers its expert's weights once, and the whole layer is one
    batched einsum (num_blocks, block, in) x (num_blocks, in, out) that maps
    straight onto the MXU. The pad/unpad moves are dual GATHERS via
    ops/permute.py (slot->row and row->slot maps are computed analytically)
    — measured on v5e, the scatter XLA would otherwise emit for the layout
    (forward) and for the gathers' transposes (backward) costs 16-86 ns/row
    against ~4-6 ns for a gather, and was the dominant cost of every
    grouped-MLP call. We deliberately avoid jax.lax.ragged_dot: on the
    current TPU toolchain it lowers to a dense (E, N, out) one-hot
    contraction — E-fold FLOPs *and* memory, which OOMs compilation at
    PreSight's 16-expert scale.

    Args:
      params: stacked per-expert layers [(W (E,in,out), b (E,out)), ...].
      x: (N, in) inputs *sorted by expert id*.
      group_sizes: (E,) int32 — count of rows per expert (sums to N).
      out_activation: optional final activation.
      block: rows per block (expert-segment padding granularity).

    Returns (N, out).
    """
    n = x.shape[0]
    dest, src, slot_valid, block_expert, n_pad = _blocked_layout(group_sizes, n, block)

    h = permute(x, src, dest, fwd_valid=slot_valid)  # (n_pad, in), gather both ways
    h = apply_mlp_blocks(params, h, block_expert)
    out = permute(h, dest, src, bwd_valid=slot_valid)  # (n, out)
    # The final activation is elementwise, so applying it after the unpad
    # gather is equivalent and touches n rows instead of n_pad.
    if out_activation is not None:
        out = out_activation(out)
    return out


def apply_mlp_blocks(
    params: Params,
    h: jnp.ndarray,
    block_expert: jnp.ndarray,
    out_activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Expert-grouped MLP on an ALREADY block-padded batch (n_pad, in).

    The pad/unpad permutes of apply_mlp_grouped are hoisted out by the
    caller (fields/router.py PaddedRouting), so several MLP heads can share
    one padded layout and the per-head permutes disappear. Blocks are the
    batched-einsum grouped matmul, same as apply_mlp_grouped. The block
    size is implied by the shapes: n_pad / num_blocks.
    """
    n_pad = h.shape[0]
    num_blocks = block_expert.shape[0]
    num_layers = len(params)
    for i, (w, b) in enumerate(params):
        hb = h.reshape(num_blocks, n_pad // num_blocks, -1)
        wb = w.astype(h.dtype)[block_expert]  # (num_blocks, in, out)
        bb = b.astype(h.dtype)[block_expert]  # (num_blocks, out)
        hb = jnp.einsum("bik,bko->bio", hb, wb,
                        preferred_element_type=h.dtype) + bb[:, None, :]
        if i < num_layers - 1:
            hb = jax.nn.relu(hb)
        h = hb.reshape(n_pad, -1)
    if out_activation is not None:
        h = out_activation(h)
    return h


def apply_mlp_ragged(
    params: Params,
    x: jnp.ndarray,
    group_sizes: jnp.ndarray,
    expert_ids_sorted: jnp.ndarray,
    out_activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """jax.lax.ragged_dot variant (kept for A/B testing; see
    apply_mlp_grouped's docstring for why it is not the default)."""
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
