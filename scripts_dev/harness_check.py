import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp

N, T, C = 1 << 20, 1 << 15, 64
rng = np.random.RandomState(0)
idx0 = jnp.asarray(rng.randint(0, T, N).astype(np.int32))
g0 = jnp.asarray(rng.rand(N, C).astype(np.float32))

def run_K(K):
    def run(carry, idx, g):
        def sbody(c, i):
            out = jax.ops.segment_sum(g + c, (idx + i) & (T - 1), num_segments=T)
            return jnp.sum(out ** 2)[None] * 1e-18, None
        return jax.lax.scan(sbody, carry, jnp.arange(K, dtype=jnp.int32))[0]
    f = jax.jit(run)
    c = f(jnp.zeros((1,)), idx0, g0)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = f(c, idx0, g0)
    jax.block_until_ready(c)
    dt = time.perf_counter() - t0
    print(f"K={K}: total {dt*1e3:.2f} ms, per-iter {dt/K*1e3:.3f} ms, carry={np.asarray(c)}", flush=True)

run_K(8)
run_K(32)

# known-cost control: big matmul 4096x4096x4096 = 137 GFLOP -> ~2-3 ms on v5e
a0 = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))
def runm(K):
    def run(carry, a):
        def sbody(c, i):
            m = a + c
            return jnp.sum((m @ m) ** 2)[None] * 1e-18, None
        return jax.lax.scan(sbody, carry, jnp.arange(K, dtype=jnp.int32))[0]
    f = jax.jit(run)
    c = f(jnp.zeros((1,)), a0)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = f(c, a0)
    jax.block_until_ready(c)
    dt = time.perf_counter() - t0
    print(f"matmul K={K}: per-iter {dt/K*1e3:.3f} ms", flush=True)
runm(8)
