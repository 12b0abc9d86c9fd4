import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp

PIECE = sys.argv[1]

# Standalone shapes mirroring the grid-profile main field at 16384 rays.
R, S = 16384, 64
N = R * S  # 1,048,576 samples
L, T, F = 5, 1 << 15, 8  # levels, rows/level, features (row = 8F = 64)
E = 16
rng = np.random.RandomState(0)

def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/iters*1e3:8.1f} ms", flush=True)

if PIECE == "scatter":
    # Table-gradient scatter: N rows into 5 leaves of (T, 64).
    tables = [jnp.asarray(rng.rand(T, 8 * F).astype(np.float32)) for _ in range(L)]
    unit = jnp.asarray(rng.rand(N, 3).astype(np.float32))
    eids = jnp.asarray(rng.randint(0, E, N).astype(np.int32))
    from presight_tpu.ops.hash_encoding import HashEncodingConfig, hash_encode
    cfg = HashEncodingConfig(num_levels=L, min_res=16, max_res=16384,
                             log2_hashmap_size=15, features_per_level=F,
                             storage="shared")
    def enc_sum(tables, unit):
        return hash_encode(tables, unit, cfg, expert_ids=eids).sum()
    timeit("hash fwd (5 levels, 1M rows/level)", jax.jit(lambda t, u: enc_sum(t, u)), tables, unit)
    timeit("grad wrt tables (5 scatters)", jax.jit(jax.grad(enc_sum, argnums=0)), tables, unit)
    timeit("grad wrt positions (dual gather)", jax.jit(jax.grad(enc_sum, argnums=1)), tables, unit)
elif PIECE == "render":
    n_pad = N + 512 * E
    w0 = jnp.asarray(rng.rand(R, S).astype(np.float32))
    rgb_p0 = jnp.asarray(rng.rand(n_pad, 3).astype(np.float32))
    sem_p0 = jnp.asarray(rng.rand(n_pad, 64).astype(np.float32))
    to_slot = jnp.asarray(np.concatenate([np.arange(N), rng.randint(0, N, n_pad - N)]).astype(np.int32))
    from_slot = jnp.asarray(np.arange(N).astype(np.int32))
    ray_of_slot = to_slot // S
    def render_scatter(rgb_p, sem_p, w):
        w_slot = w.reshape(-1)[to_slot]
        rgb = jax.ops.segment_sum(rgb_p * w_slot[:, None], ray_of_slot, num_segments=R)
        sem = jax.ops.segment_sum(sem_p * w_slot[:, None], ray_of_slot, num_segments=R)
        return rgb.sum() + sem.sum()
    def render_dense(rgb_p, sem_p, w):
        rgb = rgb_p[from_slot].reshape(R, S, 3)
        sem = sem_p[from_slot].reshape(R, S, 64)
        return jnp.sum(rgb * w[..., None]) + jnp.sum(sem * w[..., None])
    timeit("render segment-sum fwd", jax.jit(render_scatter), rgb_p0, sem_p0, w0)
    timeit("render dense fwd", jax.jit(render_dense), rgb_p0, sem_p0, w0)
    timeit("render segment-sum grad", jax.jit(jax.grad(render_scatter, argnums=(0,1,2))), rgb_p0, sem_p0, w0)
    timeit("render dense grad", jax.jit(jax.grad(render_dense, argnums=(0,1,2))), rgb_p0, sem_p0, w0)
elif PIECE == "routing":
    from presight_tpu.fields.router import route_positions_padded, build_padded_routing, assign_experts
    from presight_tpu.ops.mlp import GROUP_BLOCK
    pos = jnp.asarray((rng.rand(N, 3) * 8 - 4).astype(np.float32))
    cent = jnp.asarray((rng.randn(E, 3) * 2).astype(np.float32))
    timeit("assign_experts (cdist argmin)", jax.jit(lambda p, c: assign_experts(p, c)), pos, cent)
    timeit("full padded routing", jax.jit(lambda p, c: route_positions_padded(p, c, GROUP_BLOCK).to_slot), pos, cent)
