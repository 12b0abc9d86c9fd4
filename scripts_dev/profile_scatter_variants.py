"""Scatter alternatives for the main-table gradient (N=1.05M rows -> (T,64))."""
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
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, T, N).astype(np.int32))
g = jnp.asarray(rng.rand(N, C).astype(np.float32))

def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/iters*1e3:8.1f} ms", flush=True)

timeit("a. segment_sum (N,64)->(T,64)",
       jax.jit(lambda i, v: jax.ops.segment_sum(v, i, num_segments=T)), idx, g)
timeit("b. 2x segment_sum (N,32)->(T,32)",
       jax.jit(lambda i, v: jax.ops.segment_sum(v[:, :32], i, num_segments=T)
               + 0 * jax.ops.segment_sum(v[:, 32:], i, num_segments=T)[:, :1]), idx, g)
timeit("c. segment_sum (N,64)->(T/2,64) halved table",
       jax.jit(lambda i, v: jax.ops.segment_sum(v, i // 2, num_segments=T // 2)), idx, g)
timeit("d. sort keys+payload-free argsort", jax.jit(lambda i: jnp.argsort(i)), idx)
order = jax.jit(lambda i: jnp.argsort(i))(idx)
jax.block_until_ready(order)
timeit("e. gather rows by order", jax.jit(lambda v, o: v[o]), g, order)
idx_sorted = jnp.sort(idx)
g_sorted = jax.jit(lambda v, o: v[o])(g, order)
jax.block_until_ready(g_sorted)
timeit("f. segment_sum on SORTED idx",
       jax.jit(lambda i, v: jax.ops.segment_sum(v, i, num_segments=T)), idx_sorted, g_sorted)

# g. Pallas sorted-run accumulate
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 4096

def accum_kernel(keys_ref, rows_ref, out_ref, acc_ref):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, _):
        k = keys_ref[i, 0]
        acc_ref[pl.ds(k, 1), :] += rows_ref[pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, BLK, body, 0)

    @pl.when(step == nsteps - 1)
    def _():
        out_ref[:] = acc_ref[:]

def sorted_accum(keys_sorted, rows_sorted):
    nblk = N // BLK
    return pl.pallas_call(
        accum_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, C), jnp.float32)],
    )(keys_sorted.reshape(N, 1), rows_sorted)

try:
    out_pallas = jax.jit(sorted_accum)(idx_sorted, g_sorted)
    ref = jax.ops.segment_sum(g_sorted, idx_sorted, num_segments=T)
    err = float(jnp.max(jnp.abs(out_pallas - ref)))
    print(f"pallas accumulate max err: {err:.2e}", flush=True)
    timeit("g. pallas sorted-run accumulate", jax.jit(sorted_accum), idx_sorted, g_sorted)
except Exception as e:
    print("pallas failed:", type(e).__name__, str(e)[:500], flush=True)
