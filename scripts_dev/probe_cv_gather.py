"""Cost-volume gather variants at exact BEVDet-stereo shapes (round 5).

Per depth bin the warp gathers 67.6k rows of 4C=4 KB from a packed
(6, 65*177, 4096B) table; 88 bins -> 5.95M rows/frame = 175 ms measured
(~29 ns/row, bf16-insensitive => issue-bound, not bandwidth-bound).
Variants probed here, K-differenced inside one jit scan over bins:
  a) vmap per-camera gather (what stereo_cost_volume does today)
  b) one flat global gather (bn folded into the row index)
  c) argsort per (cam,bin) + sorted-hint gather + scalar-cost unsort
  d) unpacked: 4 gathers of C-wide rows (4x rows, 1/4 bytes each)
Run: python scripts_dev/probe_cv_gather.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp
from functools import partial

Hs, Ws, Cs, D, BN = 64, 176, 256, 88, 6
P = Hs * Ws
K1, K2, REPS = 2, 8, 3

rng = np.random.RandomState(0)
packed = jnp.asarray(rng.rand(BN, (Hs + 1) * (Ws + 1), 4 * Cs)
                     .astype(np.float32))
curr = jnp.asarray(rng.rand(BN, P, Cs).astype(np.float32))
# Nearly-sorted synthetic warp rows: monotone in pixel index with jitter,
# the structure a projective warp actually has.
base = np.linspace(0, (Hs + 1) * (Ws + 1) - 1, P)
rows_np = np.stack([
    np.clip(base + rng.randint(-Ws, Ws, P), 0, (Hs + 1) * (Ws + 1) - 1)
    for _ in range(BN * D)
], 0).astype(np.int32).reshape(D, BN, P)
rows = jnp.asarray(rows_np)
w4 = jnp.asarray(rng.rand(D, BN, P, 4).astype(np.float32))


def kdiff(name, body_fn):
    def chain(consts, x, k):
        def body(carry, _):
            o = body_fn(consts, carry)
            return x + o * 1e-30, o
        _, outs = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(outs)

    consts = (packed, curr, rows, w4)
    variants = [jax.block_until_ready(jnp.float32(0.0) + (i + 1) * 1e-6)
                for i in range((REPS + 1) * 2)]
    vi = iter(variants)
    meds = []
    for k in (K1, K2):
        fn = jax.jit(partial(chain, k=k))
        _ = float(fn(consts, next(vi)))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            _ = float(fn(consts, next(vi)))
            ts.append(time.perf_counter() - t0)
        meds.append(sorted(ts)[REPS // 2])
    per = (meds[1] - meds[0]) / (K2 - K1)
    print(f"{name:42s} {per*1e3:8.1f} ms/frame "
          f"({per/ (D*BN*P) * 1e9:.1f} ns/row-equiv)", flush=True)


def cost_from(rows_feat, cu, w):
    r = rows_feat.reshape(*rows_feat.shape[:-1], 4, Cs)
    warped = jnp.einsum("...kc,...k->...c", r, w)
    return jnp.sum(jnp.abs(cu - warped), axis=-1)


def v_vmap(c, x):
    pk, cu, rws, ww = c
    pk = pk + x * 1e-30

    def bin_body(_, args):
        rb, wb = args
        feat = jax.vmap(lambda p, i: p[i])(pk, rb)  # (BN, P, 4C)
        return 0.0, jnp.sum(cost_from(feat, cu, wb))

    _, out = jax.lax.scan(bin_body, 0.0, (rws, ww))
    return jnp.sum(out)


def v_flat(c, x):
    pk, cu, rws, ww = c
    pk = (pk + x * 1e-30).reshape(BN * (Hs + 1) * (Ws + 1), 4 * Cs)
    off = (jnp.arange(BN, dtype=jnp.int32) * ((Hs + 1) * (Ws + 1)))[:, None]

    def bin_body(_, args):
        rb, wb = args
        feat = pk[(rb + off).reshape(-1)].reshape(BN, P, 4 * Cs)
        return 0.0, jnp.sum(cost_from(feat, cu, wb))

    _, out = jax.lax.scan(bin_body, 0.0, (rws, ww))
    return jnp.sum(out)


def v_sorted(c, x):
    pk, cu, rws, ww = c
    pk = (pk + x * 1e-30).reshape(BN * (Hs + 1) * (Ws + 1), 4 * Cs)
    off = (jnp.arange(BN, dtype=jnp.int32) * ((Hs + 1) * (Ws + 1)))[:, None]

    def bin_body(_, args):
        rb, wb = args
        flat = (rb + off).reshape(-1)
        order = jnp.argsort(flat)
        feat = jnp.take(pk, flat[order], axis=0, indices_are_sorted=True)
        feat = feat.reshape(BN, P, 4 * Cs)  # sorted layout
        cu_s = jnp.take(cu.reshape(BN * P, Cs), order, axis=0).reshape(
            BN, P, Cs)
        w_s = jnp.take(wb.reshape(-1, 4), order, axis=0).reshape(BN, P, 4)
        return 0.0, jnp.sum(cost_from(feat, cu_s, w_s))

    _, out = jax.lax.scan(bin_body, 0.0, (rws, ww))
    return jnp.sum(out)


def v_unpacked(c, x):
    pk, cu, rws, ww = c
    # Treat the packed table's four corner strips as separate C-wide tables.
    tabs = [(pk[..., k * Cs:(k + 1) * Cs] + x * 1e-30) for k in range(4)]

    def bin_body(_, args):
        rb, wb = args
        acc = 0.0
        warped = 0
        for k in range(4):
            rowsk = jax.vmap(lambda t, i: t[i])(tabs[k], rb)
            warped = warped + rowsk * wb[..., k:k+1]
        return 0.0, jnp.sum(jnp.sum(jnp.abs(cu - warped), axis=-1))

    _, out = jax.lax.scan(bin_body, 0.0, (rws, ww))
    return jnp.sum(out)


kdiff("a) vmap per-camera (current)", v_vmap)
kdiff("b) flat global gather", v_flat)
kdiff("c) argsort + sorted-hint + unsorted cost", v_sorted)
kdiff("d) unpacked 4x C-wide gathers", v_unpacked)
