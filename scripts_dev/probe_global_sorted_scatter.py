"""Primitive probe (round 5): the per-STEP table-gradient reduction at
exact model shapes — 3.1M cotangent rows (80 floats) into a (2^19, 80)
table — comparing per-microbatch scatters (what the scan does today)
against one global argsort + reorder + sorted scatter per step (writes
become ~6-hit-dense over the table, i.e. near-sequential).

K-differenced (in-jit scan repetition K=40 vs K=8, value fetch), median
of 3. Run on the attached TPU: python scripts_dev/probe_global_sorted_scatter.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp
from functools import partial

T = 2 ** 19
W = 80
N_STEP = 65536 * 48          # 3.15M rows per level per step
MB_ROWS = 4096 * 48          # 196,608 rows per microbatch at mb 4096
K_HI, K_LO = 40, 8

rng = np.random.RandomState(0)
idx_np = rng.randint(0, T, N_STEP).astype(np.int32)
rows_np = rng.randn(N_STEP, W).astype(np.float32)


def timed(fn, *args):
    def loop(k, args):
        def body(c, _):
            out = fn(*args, c)
            return out, ()
        c0 = jnp.zeros((T, W), jnp.float32)
        c, _ = jax.lax.scan(body, c0, None, length=k)
        return c.sum()
    j_hi = jax.jit(partial(loop, K_HI))
    j_lo = jax.jit(partial(loop, K_LO))
    # warm
    float(j_hi(args)); float(j_lo(args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(j_lo(args)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(j_hi(args)); t_hi = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / (K_HI - K_LO))
    return sorted(ts)[1]


idx = jnp.asarray(idx_np)
rows = jnp.asarray(rows_np)
order_np = np.argsort(idx_np, kind="stable")
idx_sorted = jnp.asarray(idx_np[order_np])
rows_sorted = jnp.asarray(rows_np[order_np])

# (a) one global PRE-sorted scatter (isolates the scatter itself)
t = timed(lambda i, r, c: c.at[i].add(r, indices_are_sorted=True),
          idx_sorted, rows_sorted)
print(f"global pre-sorted scatter {N_STEP} rows -> ({T},{W}): {t*1e3:.2f} ms"
      f"  ({t/N_STEP*1e9:.1f} ns/row)", flush=True)

# (b) one global unsorted scatter
t = timed(lambda i, r, c: c.at[i].add(r), idx, rows)
print(f"global unsorted scatter: {t*1e3:.2f} ms ({t/N_STEP*1e9:.1f} ns/row)",
      flush=True)

# (c) global argsort + reorder + sorted scatter (the full step-end path)
def full(i, r, c):
    o = jnp.argsort(i)
    return c.at[i[o]].add(r[o], indices_are_sorted=True)
t = timed(full, idx, rows)
print(f"global argsort+reorder+sorted scatter: {t*1e3:.2f} ms "
      f"({t/N_STEP*1e9:.1f} ns/row)", flush=True)

# (d) per-microbatch sorted scatters (what the scan body does today)
def per_mb(i, r, c):
    k = N_STEP // MB_ROWS
    i2 = i.reshape(k, MB_ROWS)
    r2 = r.reshape(k, MB_ROWS, W)
    def body(c, x):
        ii, rr = x
        o = jnp.argsort(ii)
        return c.at[ii[o]].add(rr[o], indices_are_sorted=True), ()
    c, _ = jax.lax.scan(body, c, (i2, r2))
    return c
t = timed(per_mb, idx, rows)
print(f"16 per-microbatch sorted scatters (196k rows each): {t*1e3:.2f} ms "
      f"({t/N_STEP*1e9:.1f} ns/row)", flush=True)

# (e) the reorder gather alone (3.1M x 80 permute)
t = timed(lambda o, r, c: c + r[o].reshape(T, -1, W).sum(1) * 0 +
          jax.lax.dynamic_slice(r[o], (0, 0), (T, W)),
          jnp.asarray(order_np), rows)
print(f"reorder gather alone (approx): {t*1e3:.2f} ms", flush=True)

# (f) per-microbatch UNSORTED (XLA default transpose) for reference
def per_mb_unsorted(i, r, c):
    k = N_STEP // MB_ROWS
    i2 = i.reshape(k, MB_ROWS)
    r2 = r.reshape(k, MB_ROWS, W)
    def body(c, x):
        ii, rr = x
        return c.at[ii].add(rr), ()
    c, _ = jax.lax.scan(body, c, (i2, r2))
    return c
t = timed(per_mb_unsorted, idx, rows)
print(f"16 per-microbatch unsorted scatters: {t*1e3:.2f} ms "
      f"({t/N_STEP*1e9:.1f} ns/row)", flush=True)
