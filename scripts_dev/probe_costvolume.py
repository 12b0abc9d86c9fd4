"""Stereo cost-volume probe (round 5, VERDICT item 7): where does the
BEVDet-occ batch-4 regression come from, and what does bf16 matching buy?

Reference shapes: 6 cams, 88 depth bins, 64x176 stereo features x 256ch
(input 256x704, cv_downsample 4). K-differenced chained runs.
  python scripts_dev/probe_costvolume.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp

from presight_tpu.occupancy.view_transformer import (
    stereo_cost_volume, gen_stereo_grid, create_frustum,
)

Hs, Ws, Cs, D, N = 64, 176, 256, 88, 6
K1, K2, REPS = 2, 8, 3


def kdiff(name, fn, consts, example, samples=1):
    def chain(c, x, k):
        def body(carry, _):
            o = fn(c, carry)
            return x + o * 1e-30, o
        _, outs = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(outs)

    variants = [jax.block_until_ready(example + (i + 1) * 1e-6)
                for i in range((REPS + 1) * 2)]
    vi = iter(variants)
    meds = []
    for k in (K1, K2):
        f = jax.jit(lambda c, x, k=k: chain(c, x, k))
        _ = float(f(consts, next(vi)))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            _ = float(f(consts, next(vi)))
            ts.append(time.perf_counter() - t0)
        meds.append(sorted(ts)[REPS // 2])
    per = (meds[1] - meds[0]) / (K2 - K1)
    print(f"{name:46s} {per*1e3:8.1f} ms/app  {samples/per:7.2f} samples/s",
          flush=True)
    return per


def consts_for(B, dtype):
    rng = np.random.RandomState(0)
    BN = B * N
    prev = jnp.asarray(rng.rand(BN, Hs, Ws, Cs).astype(np.float32)).astype(dtype)
    curr = jnp.asarray(rng.rand(BN, Hs, Ws, Cs).astype(np.float32)).astype(dtype)
    frustum = jnp.asarray(create_frustum((1.0, 45.0, 0.5), (256, 704), 4))
    k2s = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1)))
    intr = np.array([[1266.0, 0, 352.0], [0, 1266.0, 128.0], [0, 0, 1]],
                    np.float32)
    c2i = jnp.asarray(np.tile(intr, (B, N, 1, 1)))
    pr = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1)))
    pt = jnp.zeros((B, N, 3))
    grid = gen_stereo_grid(frustum, k2s, c2i, pr, pt, (256, 704))
    return prev, curr, jax.block_until_ready(grid)


for B in (1, 4):
    for dtype, label in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        prev, curr, grid = consts_for(B, dtype)

        def cv(c, x):
            p, cu, g = c
            out = stereo_cost_volume(p, cu + (x * 1e-30).astype(cu.dtype),
                                     g, D)
            return jnp.mean(out.astype(jnp.float32))

        kdiff(f"cost_volume B={B} {label}", cv, (prev, curr, grid),
              jnp.zeros((), jnp.float32), samples=B)
