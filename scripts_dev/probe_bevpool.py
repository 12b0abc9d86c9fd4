"""bev_pool_v2 scatter regime at occ reference scale (round 5, item 7).

Points = B x 6 cams x 88 bins x 16x44 feature cells; output grid
(200, 200, 16) x C. The segment_sum output buffer is ~0.7 GB*C/64 per
batch item — deep in XLA's slow scatter regime — so batch 4 quadruples
both rows AND buffer. Variants: unsorted (current) vs argsort + sorted.
Run: python scripts_dev/probe_bevpool.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp
from functools import partial

N, D, Hf, Wf, C = 6, 88, 16, 44, 64
GX, GY, GZ = 200, 200, 16
K1, K2, REPS = 2, 8, 3


def kdiff(name, fn, consts, example):
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
        f = jax.jit(partial(chain, k=k))
        _ = float(f(consts, next(vi)))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            _ = float(f(consts, next(vi)))
            ts.append(time.perf_counter() - t0)
        meds.append(sorted(ts)[REPS // 2])
    per = (meds[1] - meds[0]) / (K2 - K1)
    print(f"{name:40s} {per*1e3:8.1f} ms/app", flush=True)


for B in (1, 4):
    rng = np.random.RandomState(0)
    P = B * N * D * Hf * Wf
    num_cells = B * GZ * GY * GX
    rank = jnp.asarray(rng.randint(0, num_cells, P).astype(np.int32))
    depth = jnp.asarray(rng.rand(P).astype(np.float32))
    feat_small = jnp.asarray(
        rng.rand(B * N * Hf * Wf, C).astype(np.float32))
    # expand feat per depth bin the way the pool's outer product does
    fidx = jnp.asarray(
        (np.arange(P) // D % (B * N * Hf * Wf)).astype(np.int32))

    def unsorted(c, x):
        rk, dp, ft, fi = c
        w = dp[:, None] * ft[fi]
        out = jax.ops.segment_sum(w * (1 + x * 1e-30), rk,
                                  num_segments=num_cells + 1)
        return jnp.sum(out) * 1e-6

    def sorted_v(c, x):
        rk, dp, ft, fi = c
        order = jnp.argsort(rk)
        w = (dp[:, None] * ft[fi]) * (1 + x * 1e-30)
        out = jax.ops.segment_sum(w[order], rk[order],
                                  num_segments=num_cells + 1,
                                  indices_are_sorted=True)
        return jnp.sum(out) * 1e-6

    consts = (rank, depth, feat_small, fidx)
    kdiff(f"B={B} segment_sum unsorted (current)", unsorted, consts,
          jnp.zeros((), jnp.float32))
    kdiff(f"B={B} argsort + sorted segment_sum", sorted_v, consts,
          jnp.zeros((), jnp.float32))
