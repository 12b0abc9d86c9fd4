"""Bisect the main-field 114 ms: hash encode vs MLPs vs routing vs render."""
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
from presight_tpu.ops.samplers import proposal_sample
from presight_tpu.ops.rays import get_weights
from presight_tpu.fields.router import route_positions_padded, pad_rows, unpad_rows, assign_experts, build_padded_routing
from presight_tpu.fields.ingp_field import density_and_embedding_padded, rgb_padded, semantics_padded
from presight_tpu.ops.hash_encoding import hash_encode
from presight_tpu.ops.mlp import GROUP_BLOCK, apply_mlp_blocks
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
positions = np.asarray(rs.positions().reshape(-1, 3))
positions_j = jnp.asarray(positions)
num_rays, num_samples = rs.starts.shape

def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:8.1f} ms")

# 0. routing only
timeit("routing (assign+sort+pad maps)", jax.jit(
    lambda p, x: route_positions_padded(x, p["field"]["centroids"], GROUP_BLOCK).to_slot), params, positions_j)

# 1. routing + pad positions + contract
def r1(p, x):
    routing = route_positions_padded(x, p["field"]["centroids"], GROUP_BLOCK)
    pos_p = pad_rows(x, routing)
    aabb = p["field"]["aabbs"][routing.expert_of_slot]
    unit, sel = contract_positions(pos_p, aabb)
    return unit
timeit("+ pad + contract", jax.jit(r1), params, positions_j)

# 2. + hash encode
def r2(p, x):
    routing = route_positions_padded(x, p["field"]["centroids"], GROUP_BLOCK)
    pos_p = pad_rows(x, routing)
    aabb = p["field"]["aabbs"][routing.expert_of_slot]
    unit, sel = contract_positions(pos_p, aabb)
    feats = hash_encode(p["field"]["hash_table"], unit, config.field.hash,
                        expert_ids=routing.expert_of_slot)
    return feats
timeit("+ hash encode (5 levels)", jax.jit(r2), params, positions_j)

# 3. + base mlp
def r3(p, x):
    routing = route_positions_padded(x, p["field"]["centroids"], GROUP_BLOCK)
    pos_p = pad_rows(x, routing)
    d, g, s = density_and_embedding_padded(p["field"], config.field, pos_p, routing)
    return d
timeit("+ base MLP (density/geo/sem)", jax.jit(r3), params, positions_j)

# 4. full field eval (matches profile D)
app = jnp.concatenate([params["appearance_embedding"][rs.camera_indices],
                       params["video_embedding"][rs.video_ids]], -1)
def r4(p, x):
    routing = route_positions_padded(x, p["field"]["centroids"], GROUP_BLOCK)
    ray_of_slot = routing.to_slot // num_samples
    pos_p = pad_rows(x, routing)
    d_p, g_p, s_p = density_and_embedding_padded(p["field"], config.field, pos_p, routing)
    rgb_p = rgb_padded(p["field"], config.field, rs.directions[ray_of_slot], g_p, app[ray_of_slot], routing)
    density = unpad_rows(d_p, routing).reshape(num_rays, num_samples)
    weights = get_weights(rs.deltas(), density)
    w_slot = pad_rows(weights.reshape(-1), routing)
    rgb = jax.ops.segment_sum(rgb_p * w_slot[:, None], ray_of_slot, num_segments=num_rays)
    sem_p2 = semantics_padded(p["field"], config.field, s_p, routing)
    sem = jax.ops.segment_sum(sem_p2 * w_slot[:, None], ray_of_slot, num_segments=num_rays)
    return rgb.sum() + sem.sum()
timeit("full field+render fwd", jax.jit(r4), params, positions_j)

# 5. hash encode only at PRE-SORTED identity routing (no pad gather)
def r5(p, x):
    eids = assign_experts(x, p["field"]["centroids"])
    aabb = p["field"]["aabbs"][eids]
    unit, sel = contract_positions(x, aabb)
    feats = hash_encode(p["field"]["hash_table"], unit, config.field.hash, expert_ids=eids)
    return feats
timeit("hash encode unsorted (no pad)", jax.jit(r5), params, positions_j)

# 6. MLP-only on fixed padded input
routing0 = jax.jit(lambda p, x: route_positions_padded(x, p["field"]["centroids"], GROUP_BLOCK))(params, positions_j)
n_pad = routing0.to_slot.shape[0]
h0 = jnp.asarray(np.random.RandomState(0).rand(n_pad, config.field.hash.out_dim).astype(np.float32))
timeit("base MLP alone (fixed input)", jax.jit(
    lambda p, h: apply_mlp_blocks(p["field"]["base_mlp"], h, routing0.block_expert)), params, h0)
