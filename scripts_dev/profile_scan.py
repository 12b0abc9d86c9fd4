"""In-jit scan-repetition microbenchmarks; all big arrays passed as jit
ARGUMENTS (closures upload them as constants -> remote-compile HTTP 413)."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp

N = 1 << 20
T = 1 << 15
C = 64
R, S = 16384, 64
K = 12
rng = np.random.RandomState(0)
idx0 = jnp.asarray(rng.randint(0, T, N).astype(np.int32))
g0 = jnp.asarray(rng.rand(N, C).astype(np.float32))

def scan_time(name, body, init_carry, *arrays):
    def run(carry, *arrs):
        def sbody(c, i):
            return body(c, i, *arrs), None
        return jax.lax.scan(sbody, carry, jnp.arange(K, dtype=jnp.int32))[0]
    f = jax.jit(run)
    c = f(init_carry, *arrays)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = f(c, *arrays)
    jax.block_until_ready(c)
    print(f"{name:48s} {(time.perf_counter()-t0)/K*1e3:8.2f} ms", flush=True)

scan_time("A. segment_sum unsorted (N,64)->(T,64)",
          lambda c, i, idx, g: jnp.sum(jax.ops.segment_sum(
              g + c, (idx + i) & (T - 1), num_segments=T) ** 2,
              keepdims=False)[None] * 1e-18,
          jnp.zeros((1,)), idx0, g0)

idx_sorted = jnp.sort(idx0)
scan_time("B. segment_sum sorted+hint",
          lambda c, i, idx, g: jnp.sum(jax.ops.segment_sum(
              g + c, idx, num_segments=T,
              indices_are_sorted=True) ** 2)[None] * 1e-18,
          jnp.zeros((1,)), idx_sorted, g0)

scan_time("C. argsort 1M i32",
          lambda c, i, idx: (jnp.sum(jnp.argsort(idx + i)[::7]) % 1000)[None],
          jnp.zeros((1,), jnp.int32), idx0)

order0 = jnp.argsort(idx0)
scan_time("D. gather 1M x 64f rows",
          lambda c, i, g, o: jnp.sum((g + c)[o] ** 2)[None] * 1e-18,
          jnp.zeros((1,)), g0, order0)

from presight_tpu.ops.permute import permute
n_pad = N + 8192
to_slot = jnp.asarray(np.concatenate([
    np.arange(N), rng.randint(0, N, n_pad - N)]).astype(np.int32))
from_slot = jnp.asarray(np.arange(N).astype(np.int32))
slot_valid = jnp.asarray((np.arange(n_pad) < N))
ray_of_slot = to_slot // S
rgb_p0 = jnp.asarray(rng.rand(n_pad, 3).astype(np.float32))
sem_p0 = jnp.asarray(rng.rand(n_pad, C).astype(np.float32))
w0 = jnp.asarray(rng.rand(R, S).astype(np.float32))

def render_scatter(rgb_p, sem_p, w, ts, fs, sv, ros):
    w_slot = permute(w.reshape(-1), ts, fs, fwd_valid=sv)
    rgb = jax.ops.segment_sum(rgb_p * w_slot[:, None], ros, num_segments=R)
    sem = jax.ops.segment_sum(sem_p * w_slot[:, None], ros, num_segments=R)
    return jnp.sum(rgb ** 2) + jnp.sum(sem ** 2)

def render_dense(rgb_p, sem_p, w, ts, fs, sv, ros):
    rgb = jnp.sum(permute(rgb_p, fs, ts, bwd_valid=sv).reshape(R, S, 3)
                  * w[..., None], axis=1)
    sem = jnp.sum(permute(sem_p, fs, ts, bwd_valid=sv).reshape(R, S, C)
                  * w[..., None], axis=1)
    return jnp.sum(rgb ** 2) + jnp.sum(sem ** 2)

aux = (to_slot, from_slot, slot_valid, ray_of_slot)
scan_time("F. render scatter fwd",
          lambda c, i, rp, sp, w, *a: c + render_scatter(rp + c * 1e-9, sp, w, *a) * 1e-12,
          jnp.zeros(()), rgb_p0, sem_p0, w0, *aux)
scan_time("G. render dense fwd",
          lambda c, i, rp, sp, w, *a: c + render_dense(rp + c * 1e-9, sp, w, *a) * 1e-12,
          jnp.zeros(()), rgb_p0, sem_p0, w0, *aux)

gs = jax.grad(render_scatter, argnums=(0, 1, 2))
gd = jax.grad(render_dense, argnums=(0, 1, 2))
scan_time("H. render scatter grad",
          lambda c, i, rp, sp, w, *a: c + gs(rp + c * 1e-9, sp, w, *a)[0][0, 0] * 1e-12,
          jnp.zeros(()), rgb_p0, sem_p0, w0, *aux)
scan_time("I. render dense grad (permute vjp)",
          lambda c, i, rp, sp, w, *a: c + gd(rp + c * 1e-9, sp, w, *a)[0][0, 0] * 1e-12,
          jnp.zeros(()), rgb_p0, sem_p0, w0, *aux)
