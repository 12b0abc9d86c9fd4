import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp
from presight_tpu.ops.permute import permute

N, C = 1 << 20, 64
R, S = 16384, 64
K1, K2 = 8, 40
rng = np.random.RandomState(0)
n_pad = N + 8192
to_slot = jnp.asarray(np.concatenate([
    np.arange(N), rng.randint(0, N, n_pad - N)]).astype(np.int32))
from_slot = jnp.asarray(np.arange(N).astype(np.int32))
slot_valid = jnp.asarray((np.arange(n_pad) < N))
ray_of_slot = to_slot // S
rgb_p0 = jnp.asarray(rng.rand(n_pad, 3).astype(np.float32))
sem_p0 = jnp.asarray(rng.rand(n_pad, C).astype(np.float32))
w0 = jnp.asarray(rng.rand(R, S).astype(np.float32))

def measure(name, body, *arrays):
    fs = {}
    for K in (K1, K2):
        def run(carry, *arrs, K=K):
            def sbody(c, i):
                return body(c, i, *arrs), None
            return jax.lax.scan(sbody, carry, jnp.arange(K, dtype=jnp.int32))[0]
        fs[K] = jax.jit(run)
        float(np.asarray(fs[K](jnp.zeros(()), *arrays)))
    diffs = []
    for rep in range(3):
        ts = {}
        for K in (K1, K2):
            t0 = time.perf_counter()
            c = fs[K](jnp.full((), 1e-9 * (rep + 1)), *arrays)
            float(np.asarray(c))
            ts[K] = time.perf_counter() - t0
        diffs.append((ts[K2] - ts[K1]) / (K2 - K1) * 1e3)
    diffs.sort()
    print(f"{name:44s} {diffs[1]:8.2f} ms (reps {[f'{d:.2f}' for d in diffs]})", flush=True)

def render_scatter(rgb_p, sem_p, w, ts, fs_, sv, ros):
    w_slot = permute(w.reshape(-1), ts, fs_, fwd_valid=sv)
    rgb = jax.ops.segment_sum(rgb_p * w_slot[:, None], ros, num_segments=R)
    sem = jax.ops.segment_sum(sem_p * w_slot[:, None], ros, num_segments=R)
    return jnp.sum(rgb ** 2) + jnp.sum(sem ** 2)

def render_dense(rgb_p, sem_p, w, ts, fs_, sv, ros):
    rgb = jnp.sum(permute(rgb_p, fs_, ts, bwd_valid=sv).reshape(R, S, 3)
                  * w[..., None], axis=1)
    sem = jnp.sum(permute(sem_p, fs_, ts, bwd_valid=sv).reshape(R, S, C)
                  * w[..., None], axis=1)
    return jnp.sum(rgb ** 2) + jnp.sum(sem ** 2)

aux = (to_slot, from_slot, slot_valid, ray_of_slot)
measure("F. render scatter fwd",
        lambda c, i, rp, sp, w, *a: render_scatter(rp + c * 1e-9, sp, w, *a) * 1e-12,
        rgb_p0, sem_p0, w0, *aux)
measure("G. render dense fwd",
        lambda c, i, rp, sp, w, *a: render_dense(rp + c * 1e-9, sp, w, *a) * 1e-12,
        rgb_p0, sem_p0, w0, *aux)
gs = jax.grad(render_scatter, argnums=(0, 1, 2))
gd = jax.grad(render_dense, argnums=(0, 1, 2))
measure("H. render scatter grad",
        lambda c, i, rp, sp, w, *a: sum(jnp.sum(x ** 2) for x in gs(rp + c * 1e-9, sp, w, *a)) * 1e-12,
        rgb_p0, sem_p0, w0, *aux)
measure("I. render dense grad (permute vjp)",
        lambda c, i, rp, sp, w, *a: sum(jnp.sum(x ** 2) for x in gd(rp + c * 1e-9, sp, w, *a)) * 1e-12,
        rgb_p0, sem_p0, w0, *aux)
