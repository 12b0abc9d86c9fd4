"""K-differencing with VALUE FETCH: per-iter = (T(K2)-T(K1))/(K2-K1); a
host fetch of the result cannot return early, and differencing removes
constant overhead. Median of 3 repeats."""
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
idx_sorted = jnp.sort(idx0)

K1, K2 = 8, 40

def measure(name, body, *arrays):
    fs = {}
    for K in (K1, K2):
        def run(carry, *arrs, K=K):
            def sbody(c, i):
                return body(c, i, *arrs), None
            return jax.lax.scan(sbody, carry, jnp.arange(K, dtype=jnp.int32))[0]
        fs[K] = jax.jit(run)
        c = fs[K](jnp.zeros((1,)), *arrays)
        float(np.asarray(c)[0])
    diffs = []
    for rep in range(3):
        ts = {}
        for K in (K1, K2):
            c0 = jnp.full((1,), 1e-9 * (rep + 1))
            t0 = time.perf_counter()
            c = fs[K](c0, *arrays)
            float(np.asarray(c)[0])
            ts[K] = time.perf_counter() - t0
        diffs.append((ts[K2] - ts[K1]) / (K2 - K1) * 1e3)
    diffs.sort()
    print(f"{name:44s} {diffs[1]:8.2f} ms (reps {diffs})", flush=True)

measure("A. segment_sum unsorted",
        lambda c, i, idx, g: jnp.sum(jax.ops.segment_sum(
            g + c, (idx + i) & (T - 1), num_segments=T) ** 2)[None] * 1e-18,
        idx0, g0)
measure("B. segment_sum sorted+hint",
        lambda c, i, idx, g: jnp.sum(jax.ops.segment_sum(
            g + c, idx, num_segments=T,
            indices_are_sorted=True) ** 2)[None] * 1e-18,
        idx_sorted, g0)
measure("C. argsort 1M i32",
        lambda c, i, idx: (jnp.sum(
            jnp.argsort(idx + i).astype(jnp.float32) ** 2)[None] * 1e-18),
        idx0)
order0 = jnp.argsort(idx0)
measure("D. gather 1M x 64f rows",
        lambda c, i, g, o: jnp.sum((g + c)[o] ** 2)[None] * 1e-18,
        g0, order0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
BLK = 4096

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
    return pl.pallas_call(
        accum_kernel,
        grid=(N // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
    )(keys_sorted.reshape(N, 1), rows_sorted)

try:
    out_pallas = jax.jit(sorted_accum)(idx_sorted, g0)
    ref = jax.ops.segment_sum(g0, idx_sorted, num_segments=T)
    print("pallas max err:", float(jnp.max(jnp.abs(out_pallas - ref))), flush=True)
    measure("E. pallas sorted-run accumulate",
            lambda c, i, idx, g: jnp.sum(
                sorted_accum(idx, g + c) ** 2)[None] * 1e-18,
            idx_sorted, g0)
except Exception as e:
    print("pallas failed:", type(e).__name__, str(e)[:800], flush=True)
