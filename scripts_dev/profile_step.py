"""Decompose the grid-profile train step: time each stage separately on TPU.

Pieces (all jitted separately, chained x N in-jit via repeated application
where possible, else timed with block_until_ready over K calls):
  A. full grad program (one 16384-ray microbatch)
  B. forward only (no grad)
  C. proposal sampling only (grid round + fine prop round + PDF chains)
  D. main-field eval only (fixed positions)
  E. losses only (fixed outputs)
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp

import os
os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
from bench import build

MODE = sys.argv[1] if len(sys.argv) > 1 else "grid-profile"
R = 16384

step, state, cameras, batch_for, scalars, refresh, config = build(16, 15, R, MODE)
batch = batch_for(0)
params = state.params

from presight_tpu.data.cameras import generate_rays
from presight_tpu.models.nerfacto_ms import (
    forward, compute_losses, _density_fns, apply_collider, make_prop_grid)
from presight_tpu.ops.samplers import proposal_sample
from presight_tpu.ops.rays import get_weights

grid = make_prop_grid(params, config)

def timeit(name, fn, *args, iters=8, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:8.1f} ms")
    return out

key = jax.random.PRNGKey(0)

# A. full grad (value_and_grad of the one-chunk loss)
def full_loss(params, grid):
    bundle = generate_rays(cameras, batch["ray_index"])
    outputs = forward(params, config, bundle, key, scalars.anneal, train=True,
                      stop_prop_grad=True, prop_grid=grid)
    losses = compute_losses(outputs, batch, config, scalars.sigma, scalars.los_mult)
    return sum(losses.values())

grad_j = jax.jit(jax.grad(full_loss))
timeit("A. grad (stop_prop_grad=True)", grad_j, params, grid)

def full_loss_pg(params, grid):
    bundle = generate_rays(cameras, batch["ray_index"])
    outputs = forward(params, config, bundle, key, scalars.anneal, train=True,
                      stop_prop_grad=False, prop_grid=grid)
    losses = compute_losses(outputs, batch, config, scalars.sigma, scalars.los_mult)
    return sum(losses.values())
grad_pg_j = jax.jit(jax.grad(full_loss_pg))
timeit("A2. grad (prop grads on)", grad_pg_j, params, grid)

# B. forward only
fwd_j = jax.jit(lambda p, g: forward(p, config, generate_rays(cameras, batch["ray_index"]),
                                     key, scalars.anneal, train=True,
                                     stop_prop_grad=True, prop_grid=g)["rgb"])
timeit("B. forward only", fwd_j, params, grid)

# C. proposal chain only
def props_only(p, g):
    bundle = apply_collider(generate_rays(cameras, batch["ray_index"]), config)
    rs, wl, rsl = proposal_sample(
        key, bundle, _density_fns(p, config, g),
        num_proposal_samples=config.num_proposal_samples_per_ray,
        num_nerf_samples=config.num_nerf_samples_per_ray,
        spec=config.spacing, anneal=scalars.anneal, stratified=True,
        single_jitter=True, stop_prop_grad=True)
    return rs.starts
timeit("C. proposal chain (sample+prop evals)", jax.jit(props_only), params, grid)

# C2: round-1 only (initial sample + round-1 density)
def round1_only(p, g):
    bundle = apply_collider(generate_rays(cameras, batch["ray_index"]), config)
    rs, wl, rsl = proposal_sample(
        key, bundle, _density_fns(p, config, g),
        num_proposal_samples=(config.num_proposal_samples_per_ray[0],),
        num_nerf_samples=config.num_nerf_samples_per_ray,
        spec=config.spacing, anneal=scalars.anneal, stratified=True,
        single_jitter=True, stop_prop_grad=True)
    return rs.starts
timeit("C2. round1+pdf+final-bins only", jax.jit(round1_only), params, grid)

# D. main field + render, fwd and grad, at fixed positions
bundle0 = apply_collider(generate_rays(cameras, batch["ray_index"]), config)
rs, wl, rsl = jax.jit(lambda p, g: proposal_sample(
    key, bundle0, _density_fns(p, config, g),
    num_proposal_samples=config.num_proposal_samples_per_ray,
    num_nerf_samples=config.num_nerf_samples_per_ray,
    spec=config.spacing, anneal=scalars.anneal, stratified=True,
    single_jitter=True, stop_prop_grad=True))(params, grid)
jax.block_until_ready(rs)

def main_field_loss(p, rs):
    num_rays, num_samples = rs.starts.shape
    positions = rs.positions().reshape(-1, 3)
    from presight_tpu.fields.router import route_positions_padded, pad_rows, unpad_rows
    from presight_tpu.fields.ingp_field import density_and_embedding_padded, rgb_padded, semantics_padded
    from presight_tpu.ops.mlp import GROUP_BLOCK
    routing = route_positions_padded(positions, p["field"]["centroids"], GROUP_BLOCK)
    ray_of_slot = routing.to_slot // num_samples
    pos_p = pad_rows(positions, routing)
    density_p, geo_p, sem_p = density_and_embedding_padded(p["field"], config.field, pos_p, routing)
    app = jnp.concatenate([p["appearance_embedding"][rs.camera_indices],
                           p["video_embedding"][rs.video_ids]], -1)
    rgb_p = rgb_padded(p["field"], config.field, rs.directions[ray_of_slot], geo_p,
                       app[ray_of_slot], routing)
    density = unpad_rows(density_p, routing).reshape(num_rays, num_samples)
    weights = get_weights(rs.deltas(), density)
    w_slot = pad_rows(weights.reshape(-1), routing)
    rgb = jax.ops.segment_sum(rgb_p * w_slot[:, None], ray_of_slot, num_segments=num_rays)
    sem_feats_p = semantics_padded(p["field"], config.field, sem_p, routing)
    sem = jax.ops.segment_sum(sem_feats_p * w_slot[:, None], ray_of_slot, num_segments=num_rays)
    return jnp.sum(rgb) + 0.1 * jnp.sum(sem) + jnp.sum(weights)

timeit("D. main field+render fwd", jax.jit(main_field_loss), params, rs)
timeit("D2. main field+render grad", jax.jit(jax.grad(main_field_loss)), params, rs)

# E. losses only, from a precomputed forward
outputs = jax.jit(lambda p, g: forward(p, config, generate_rays(cameras, batch["ray_index"]),
                                       key, scalars.anneal, train=True,
                                       stop_prop_grad=True, prop_grid=g))(params, grid)
jax.block_until_ready(outputs)
loss_j = jax.jit(lambda o: sum(compute_losses(o, batch, config, scalars.sigma, scalars.los_mult).values()))
timeit("E. losses fwd (fixed outputs)", loss_j, outputs)

# F. grid refresh
timeit("F. grid refresh", jax.jit(lambda p: make_prop_grid(p, config)), params, iters=3)
