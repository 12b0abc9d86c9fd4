"""Backward decomposition: table scatters vs routing duals vs render."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp
from bench import build

R = 16384
step, state, cameras, batch_for, scalars, refresh, config = build(16, 15, R, "grid-profile")
batch = batch_for(0)
params = state.params
from presight_tpu.data.cameras import generate_rays
from presight_tpu.models.nerfacto_ms import _density_fns, apply_collider, make_prop_grid
from presight_tpu.ops.samplers import proposal_sample, pdf_sample, spaced_sample
from presight_tpu.ops.rays import get_weights
from presight_tpu.fields.router import route_positions_padded, pad_rows, unpad_rows
from presight_tpu.fields.ingp_field import density_and_embedding_padded, rgb_padded, semantics_padded
from presight_tpu.ops.hash_encoding import hash_encode
from presight_tpu.ops.mlp import GROUP_BLOCK
from presight_tpu.ops.math import contract_positions

key = jax.random.PRNGKey(0)
grid = make_prop_grid(params, config)
bundle0 = apply_collider(generate_rays(cameras, batch["ray_index"]), config)
rs, _, _ = jax.jit(lambda p, g: proposal_sample(
    key, bundle0, _density_fns(p, config, g),
    num_proposal_samples=config.num_proposal_samples_per_ray,
    num_nerf_samples=config.num_nerf_samples_per_ray,
    spec=config.spacing, anneal=scalars.anneal, stratified=True,
    single_jitter=True, stop_prop_grad=True))(params, grid)
jax.block_until_ready(rs)
positions_j = jnp.asarray(np.asarray(rs.positions().reshape(-1, 3)))
num_rays, num_samples = rs.starts.shape

def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/iters*1e3:8.1f} ms")

routing0 = jax.jit(lambda p, x: route_positions_padded(x, p["field"]["centroids"], GROUP_BLOCK))(params, positions_j)
jax.block_until_ready(routing0)
n_pad = routing0.to_slot.shape[0]
unit0 = jax.jit(lambda p, x: contract_positions(pad_rows(x, routing0), p["field"]["aabbs"][routing0.expert_of_slot])[0])(params, positions_j)
jax.block_until_ready(unit0)

# 1. hash encode fwd (fixed unit coords + routing)
def henc(p, u):
    return hash_encode(p["field"]["hash_table"], u, config.field.hash,
                       expert_ids=routing0.expert_of_slot)
timeit("hash encode fwd (fixed unit)", jax.jit(lambda p, u: henc(p, u).sum()), params, unit0)

# 2. grad wrt TABLE only (scatter cost isolated; unit coords fixed, no dual gather for positions)
timeit("hash encode grad wrt table (5 scatters)", jax.jit(
    lambda p, u: jax.grad(lambda t: henc({"field": {**p["field"], "hash_table": t}}, u).sum())(p["field"]["hash_table"])), params, unit0)

# 3. grad wrt unit positions only (dual gather + trilerp bwd)
timeit("hash encode grad wrt positions", jax.jit(
    lambda p, u: jax.grad(lambda uu: henc(p, uu).sum())(u)), params, unit0)

# 4. segment-sum render fwd+bwd vs dense render
w0 = jnp.asarray(np.random.RandomState(1).rand(num_rays, num_samples).astype(np.float32))
rgb_p0 = jnp.asarray(np.random.RandomState(2).rand(n_pad, 3).astype(np.float32))
sem_p0 = jnp.asarray(np.random.RandomState(3).rand(n_pad, 64).astype(np.float32))
ray_of_slot = routing0.to_slot // num_samples

def render_scatter(rgb_p, sem_p, w):
    w_slot = pad_rows(w.reshape(-1), routing0)
    rgb = jax.ops.segment_sum(rgb_p * w_slot[:, None], ray_of_slot, num_segments=num_rays)
    sem = jax.ops.segment_sum(sem_p * w_slot[:, None], ray_of_slot, num_segments=num_rays)
    return rgb.sum() + sem.sum()

def render_dense(rgb_p, sem_p, w):
    rgb = unpad_rows(rgb_p, routing0).reshape(num_rays, num_samples, 3)
    sem = unpad_rows(sem_p, routing0).reshape(num_rays, num_samples, 64)
    rgbr = jnp.sum(rgb * w[..., None], axis=1)
    semr = jnp.sum(sem * w[..., None], axis=1)
    return rgbr.sum() + semr.sum()

timeit("render segment-sum fwd", jax.jit(render_scatter), rgb_p0, sem_p0, w0)
timeit("render dense fwd", jax.jit(render_dense), rgb_p0, sem_p0, w0)
timeit("render segment-sum grad", jax.jit(jax.grad(render_scatter, argnums=(0,1,2))), rgb_p0, sem_p0, w0)
timeit("render dense grad", jax.jit(jax.grad(render_dense, argnums=(0,1,2))), rgb_p0, sem_p0, w0)

# 5. PDF chain pieces
w_prop = jnp.asarray(np.random.RandomState(4).rand(num_rays, 128).astype(np.float32))
rs1 = jax.jit(lambda: spaced_sample(key, bundle0, 128, config.spacing, True, True))()
jax.block_until_ready(rs1)
timeit("pdf_sample 128->64 bins", jax.jit(
    lambda w: pdf_sample(key, bundle0, rs1, w, 64, config.spacing, True, True).starts), w_prop)

from presight_tpu.ops.stepfun import z_anti_aliasing_interlevel_loss, distortion_loss
