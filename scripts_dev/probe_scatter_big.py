"""Dissect the deploy-capacity scatter cliff (VERDICT r4 item 2a follow-up).

cap_sweep measured the headline profile at log2=19 shared tables: 1717 ms/step
vs 692 at log2=17 (+1025 ms). Two hypotheses for the +1025:
  H1 per-row slow-regime RMW: ~12.6M scatter rows/step at 62-86 ns/row.
  H2 dense-grad materialization: each microbatch's backward materializes a
     dense (T,80) grad per level (64 microbatches x 4 levels x 167 MB).

This probe times the primitive at the EXACT model shapes (T=2^19, F_row=80,
N=49152 rows per scatter = 1024 rays x 48 samples) and the same op at
log2=17, plus consolidation variants. K-differencing (time k1 and k2
chained applications, report (t2-t1)/(k2-k1)) so dispatch overhead cancels.

Run on the attached TPU:  python scripts_dev/probe_scatter_big.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp
from functools import partial


def kdiff(name, make_fn, k1=4, k2=12, reps=3):
    """Median K-differenced per-application ms for fn chained k times."""
    fn1, fn2 = make_fn(k1), make_fn(k2)
    outs = []
    for fn in (fn1, fn2):
        fn_c = jax.jit(fn)
        r = fn_c()  # compile + warm
        jax.block_until_ready(r)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn_c())
            ts.append(time.perf_counter() - t0)
        outs.append(sorted(ts)[reps // 2])
    per = (outs[1] - outs[0]) / (k2 - k1)
    print(f"{name:58s} {per*1e3:9.2f} ms/app", flush=True)
    return per


N = 1024 * 48          # rows per microbatch-level scatter
F = 80                 # 8 corners x 10 features (cap4x shared row)
rng = np.random.RandomState(0)
g = jnp.asarray(rng.rand(N, F).astype(np.float32))

for log2 in (17, 19):
    T = 1 << log2
    idx = jnp.asarray(rng.randint(0, T, N).astype(np.int32))
    idx_sorted = jnp.sort(idx)

    def scatter_chain(k, T=T, idx=idx):
        def fn():
            out = jnp.zeros((T, F), jnp.float32)
            v = g
            for i in range(k):
                out = out.at[idx].add(v)
                v = v + out[0]  # serialize: next scatter depends on prior
            return out[0]
        return fn

    def scatter_sorted_chain(k, T=T, i_s=idx_sorted):
        def fn():
            out = jnp.zeros((T, F), jnp.float32)
            v = g
            for i in range(k):
                out = out.at[i_s].add(v, indices_are_sorted=True)
                v = v + out[0]
            return out[0]
        return fn

    def sort_then_scatter_chain(k, T=T, idx=idx):
        def fn():
            out = jnp.zeros((T, F), jnp.float32)
            v = g
            for i in range(k):
                order = jnp.argsort(idx)
                out = out.at[idx[order]].add(v[order], indices_are_sorted=True)
                v = v + out[0]
            return out[0]
        return fn

    def grad_of_gather_chain(k, T=T, idx=idx):
        tbl = jnp.zeros((T, F), jnp.float32)
        def loss(t, v):
            return jnp.sum(t[idx] * v)
        gr = jax.grad(loss)
        def fn():
            v = g
            acc = jnp.zeros((T, F), jnp.float32)
            for i in range(k):
                acc = acc + gr(tbl, v)
                v = v + acc[0]
            return acc[0]
        return fn

    kdiff(f"log2={log2} scatter-add (N=49k,F=80) fresh zeros", scatter_chain)
    kdiff(f"log2={log2} scatter-add PRE-SORTED idx", scatter_sorted_chain)
    kdiff(f"log2={log2} argsort+gather+sorted scatter", sort_then_scatter_chain)
    kdiff(f"log2={log2} grad-of-gather + dense accumulate", grad_of_gather_chain)

# Consolidation: one scatter of 64x rows vs 64 scatters (same total rows).
T = 1 << 19
NBIG = N * 64
idx_big = jnp.asarray(rng.randint(0, T, NBIG).astype(np.int32))
g_big = jnp.asarray(rng.rand(NBIG, F).astype(np.float32))

def big_scatter_chain(k):
    def fn():
        out = jnp.zeros((T, F), jnp.float32)
        v = g_big
        for i in range(k):
            out = out.at[idx_big].add(v)
            v = v + out[0]
        return out[0]
    return fn

def big_sorted_chain(k):
    def fn():
        out = jnp.zeros((T, F), jnp.float32)
        v = g_big
        for i in range(k):
            order = jnp.argsort(idx_big)
            out = out.at[idx_big[order]].add(v[order], indices_are_sorted=True)
            v = v + out[0]
        return out[0]
    return fn

kdiff("log2=19 ONE scatter of 64x49k=3.1M rows", big_scatter_chain, k1=2, k2=6)
kdiff("log2=19 3.1M rows argsort+gather+sorted", big_sorted_chain, k1=2, k2=6)

# Scan-accumulated microbatch emulation: does XLA fuse the scatter into the
# carried accumulator (H2 test)? 64 iterations, carry (T,80).
def scan_acc_chain(k):
    idxs = jnp.asarray(rng.randint(0, T, (8, N)).astype(np.int32))
    def fn():
        def body(acc, i):
            return acc.at[idxs[i % 8]].add(g), 0.0
        out = jnp.zeros((T, F), jnp.float32)
        for _ in range(k):
            out, _ = jax.lax.scan(body, out, jnp.arange(64))
        return out[0]
    return fn

kdiff("log2=19 scan of 64 scatters into carried acc", scan_acc_chain, k1=1, k2=3)
