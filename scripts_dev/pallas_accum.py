"""Sorted-run accumulate kernel prototype + correctness (interpret mode CPU)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = len(sys.argv) > 1 and sys.argv[1] == "cpu"
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

def make_sorted_accum(N, T, C, BLK=4096):
    def accum_kernel(keys_ref, rows_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            k = keys_ref[i, 0]
            out_ref[pl.ds(k, 1), :] += rows_ref[pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, BLK, body, 0)

    def sorted_accum(keys_sorted, rows_sorted):
        nblk = N // BLK
        return pl.pallas_call(
            accum_kernel,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
            interpret=INTERPRET,
        )(keys_sorted.reshape(N, 1), rows_sorted)
    return sorted_accum

N, T, C = (1 << 14, 1 << 10, 64) if INTERPRET else (1 << 20, 1 << 15, 64)
rng = np.random.RandomState(0)
idx = jnp.asarray(np.sort(rng.randint(0, T, N)).astype(np.int32))
g = jnp.asarray(rng.rand(N, C).astype(np.float32))
fn = jax.jit(make_sorted_accum(N, T, C, BLK=2048 if INTERPRET else 4096))
out = fn(idx, g)
ref = jax.ops.segment_sum(g, idx, num_segments=T)
err = float(jnp.max(jnp.abs(out - ref)))
print("max err:", err, flush=True)
assert err < 1e-3

if not INTERPRET:
    import time
    K = 12
    def run(carry):
        def body(c, i):
            o = fn(idx, g + c)
            return o[0, :1] * 1e-12, None
        return jax.lax.scan(body, carry, jnp.arange(K))[0]
    f = jax.jit(run)
    c = f(jnp.zeros((1,)))
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = f(c)
    jax.block_until_ready(c)
    print(f"pallas sorted accumulate: {(time.perf_counter()-t0)/K*1e3:.2f} ms", flush=True)
