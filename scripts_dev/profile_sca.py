"""Gather-formulation shootout at exact SCA scale (smn reference config).

SCA measured 168.7 ms of the 204 ms StreamMapNet frame (profile_map.py).
Its tap gathers are issued as 576 small ops: vmap-per-head inside
deformable_taps, vmap-per-anchor, a python level loop, vmap-per-cam
(6 cams x 3 levels x 4 anchors x 8 heads), each gathering only
Q x Pa = 5000 x 2 rows of 128 floats. Hypothesis: per-op overhead, not
row count, dominates. This probe times the same TOTAL row volume
(5.76M rows x 512 B) under progressively merged formulations:

  a) current shape: 576 gathers x 10k rows
  b) anchors merged into taps: 144 gathers x 40k rows
  c) heads folded into the table row axis: 18 gathers x 320k rows
  d) cams+levels also folded into ONE table: 1 gather x 5.76M rows
  e) (d) + per-cam query compaction K=2048: 1 gather x 2.36M rows
     + scatter-add back to (Q, D)

Rows are bilinear-packed (4C wide) as in the real sampler; indices are
random-but-fixed. kdiff harness as bench_stage3 (chained, non-foldable).
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import time

from presight_tpu.utils.jax_setup import setup as _setup_jax

_setup_jax()
import jax
import jax.numpy as jnp

SMOKE = bool(int(os.environ.get("SCA_SMOKE", "0")))
ONLY = set(filter(None, os.environ.get("SCA_ONLY", "").split(",")))
if SMOKE:
    # Tiny shapes on CPU: correctness smoke (a–e must agree; sitecustomize
    # pins the axon platform, so env vars alone don't switch backends).
    jax.config.update("jax_platforms", "cpu")
    N, L, A, Q, Hh, P = 2, 3, 4, 64, 4, 8
    HD, K = 8, 32
    SHAPES = [(9, 13), (5, 7), (3, 4)]
else:
    N, L, A, Q, Hh, P = 6, 3, 4, 5000, 8, 8
    HD = 32      # head_dim; packed row = 4*HD = 128 floats
    K = 2048     # compaction capacity per cam
    # Level l is (60,100)/2^l, packed (+1 each dim).
    SHAPES = [(61, 101), (31, 51), (16, 26)]
Pa = P // A


def kdiff(name, fn, example, consts, k1=2, k2=8, reps=3):
    def chain(consts, x, k):
        def body(carry, _):
            o = fn(consts, carry)
            return x + o * 1e-30, o

        _, outs = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(outs)

    variants = [jax.block_until_ready(example + (i + 1) * 1e-6)
                for i in range((reps + 1) * 2)]
    vi = iter(variants)
    meds = []
    for k in (k1, k2):
        f = jax.jit(lambda c, x, k=k: chain(c, x, k))
        _ = float(f(consts, next(vi)))
        ts = []
        for _r in range(reps):
            t0 = time.perf_counter()
            _ = float(f(consts, next(vi)))
            ts.append(time.perf_counter() - t0)
        meds.append(sorted(ts)[reps // 2])
    per = (meds[1] - meds[0]) / (k2 - k1)
    print(f"{name:52s} {per*1e3:8.2f} ms", flush=True)
    return per


def main():
    # All arrays are generated ON DEVICE (the tunnel link is ~6 MB/s;
    # the folded table alone is ~200 MB — host staging would dominate).
    ks = iter(jax.random.split(jax.random.PRNGKey(0), 16))
    tables = [jax.random.uniform(next(ks), (N, Hh, h * w, 4 * HD),
                                 jnp.float32) for (h, w) in SHAPES]
    idx = [jax.random.randint(next(ks), (N, A, Q, Hh, Pa), 0, h * w,
                              jnp.int32) for (h, w) in SHAPES]
    wts = jax.random.uniform(next(ks), (N, A, Q, Hh, Pa, 4), jnp.float32)
    x0 = jax.random.uniform(next(ks), (Q, Hh, HD), jnp.float32)

    def combine(rows, w):
        # rows (..., 4*HD) x w (..., 4) -> (..., HD)
        r = rows.reshape(*rows.shape[:-1], 4, HD)
        return jnp.einsum("...kc,...k->...c", r, w)

    def dep(x, idx_tree):
        """Add a runtime-zero, compile-opaque scalar to every index tensor
        so each gather depends on the chained carry — without this, XLA
        hoists consts-only tap computations out of the k-step scan and the
        K-differencing measures nothing (variant (e) read 0.18 ms)."""
        z = (jnp.sum(x) * 1e-30).astype(jnp.int32)
        return jax.tree.map(lambda i: i + z, idx_tree)

    # ---- (a) current: per cam, per level, per anchor, per head ----
    def fa(c, x):
        tbls, idxs, w = c
        idxs = dep(x, idxs)
        out = jnp.zeros((Q, Hh, HD), x.dtype)
        for l in range(L):
            def per_cam(tc, ic, wc):
                acc = jnp.zeros((Q, Hh, HD), x.dtype)
                for a in range(A):
                    def per_head(tbl_h, idx_h, w_h):
                        return combine(tbl_h[idx_h], w_h)  # (Q, Pa, HD)

                    taps = jax.vmap(per_head, in_axes=(0, 1, 1), out_axes=1)(
                        tc, ic[a], wc[a])  # (Q, Hh, Pa, HD)
                    acc = acc + taps.sum(axis=2)
                return acc

            out = out + jax.vmap(per_cam)(tbls[l], idxs[l], w).sum(axis=0)
        return jnp.mean(out * x)

    vals = {}

    def check(tag, fn, consts, tol=1e-5):
        if SMOKE:
            vals[tag] = float(jax.jit(fn)(consts, x0))
            ref = vals.get("a", vals[tag])
            assert abs(vals[tag] - ref) < tol * max(1.0, abs(ref)), (
                tag, vals[tag], ref)
            print(f"  smoke {tag}: {vals[tag]:.6f} OK", flush=True)

    def kdiff_if(tag, *args, **kw):
        if not ONLY or tag in ONLY:
            kdiff(*args, **kw)

    check("a", fa, (tables, idx, wts))
    kdiff_if("a", "(a) 576 gathers x 10k rows (current)", fa, x0,
          (tables, idx, wts))

    # ---- (b) anchors merged into taps: (Q, Hh, A*Pa) per (cam,level) ----
    idx_b = [i.transpose(0, 2, 3, 1, 4).reshape(N, Q, Hh, A * Pa)
             for i in idx]
    wts_b = wts.transpose(0, 2, 3, 1, 4, 5).reshape(N, Q, Hh, A * Pa, 4)

    def fb(c, x):
        tbls, idxs, w = c
        idxs = dep(x, idxs)
        out = jnp.zeros((Q, Hh, HD), x.dtype)
        for l in range(L):
            def per_cam(tc, ic, wc):
                def per_head(tbl_h, idx_h, w_h):
                    return combine(tbl_h[idx_h], w_h)  # (Q, A*Pa, HD)

                taps = jax.vmap(per_head, in_axes=(0, 1, 1), out_axes=1)(
                    tc, ic, wc)  # (Q, Hh, A*Pa, HD)
                return taps.sum(axis=2)

            out = out + jax.vmap(per_cam)(tbls[l], idxs[l], wts_b).sum(axis=0)
        return jnp.mean(out * x)

    check("b", fb, (tables, idx_b, wts_b))
    kdiff_if("b", "(b) 144 gathers x 40k rows (anchors merged)", fb, x0,
          (tables, idx_b, wts_b))

    # ---- (c) heads folded into table rows: 18 gathers x 320k rows ----
    tables_c = [t.reshape(N, Hh * h * w, 4 * HD)
                for t, (h, w) in zip(tables, SHAPES)]
    idx_c = [
        (jnp.arange(Hh, dtype=jnp.int32)[None, None, :, None] * (h * w)
         + ib).reshape(N, Q * Hh * A * Pa)
        for ib, (h, w) in zip(idx_b, SHAPES)
    ]

    def fc(c, x):
        tbls, idxs, w = c
        idxs = dep(x, idxs)
        out = jnp.zeros((Q, Hh, HD), x.dtype)
        for l in range(L):
            def per_cam(tc, ic, wc):
                rows = tc[ic].reshape(Q, Hh, A * Pa, 4 * HD)
                return combine(rows, wc).sum(axis=2)

            out = out + jax.vmap(per_cam)(tbls[l], idxs[l], wts_b).sum(axis=0)
        return jnp.mean(out * x)

    check("c", fc, (tables_c, idx_c, wts_b))
    kdiff_if("c", "(c) 18 gathers x 320k rows (heads folded)", fc, x0,
          (tables_c, idx_c, wts_b))

    # ---- (d) one table, one gather x 5.76M rows ----
    base = 0
    offs = []
    for (h, w) in SHAPES:
        offs.append(base)
        base += Hh * h * w
    one_table = jnp.concatenate(
        [t.reshape(N, -1, 4 * HD) for t in tables_c], axis=1
    ).reshape(N * base, 4 * HD)
    cam_stride = base
    idx_d = jnp.concatenate(
        [
            (ic + offs[l]).reshape(N, Q, Hh, A * Pa)
            + (jnp.arange(N, dtype=jnp.int32) * cam_stride)[:, None, None,
                                                            None]
            for l, ic in enumerate(idx_c)
        ],
        axis=3,
    )  # (N, Q, Hh, L*A*Pa)
    wts_d = jnp.concatenate([wts_b] * L, axis=3)  # reuse weights per level

    def fd(c, x):
        # Per-cam loop keeps the materialized rows tensor bounded
        # (Q*Hh*LAP*4HD floats ~ 2 GB at full scale; the all-cam version
        # is 11.8 GB and OOMs HBM).
        tbl, ic, wc = c
        ic = dep(x, ic)
        out = jnp.zeros((Q, Hh, HD), x.dtype)
        for n in range(N):
            rows = tbl[ic[n].reshape(-1)].reshape(Q, Hh, L * A * Pa, 4 * HD)
            out = out + combine(rows, wc[n]).sum(axis=2)
        return jnp.mean(out * x)

    check("d", fd, (one_table, idx_d, wts_d))
    kdiff_if("d", "(d) 1 gather x 5.76M rows (all folded)", fd, x0,
          (one_table, idx_d, wts_d))

    # ---- (e) (d) + per-cam compaction to K rows ----
    sel = jax.vmap(
        lambda k: jax.random.permutation(k, Q)[:K].astype(jnp.int32)
    )(jax.random.split(next(ks), N))  # (N, K) queries active in cam n

    def fe(c, x):
        tbl, ic, wc, sl = c
        ic = dep(x, ic)
        out = jnp.zeros((Q, Hh, HD), x.dtype)
        for n in range(N):
            icK = ic[n][sl[n]]                          # (K, Hh, LAP)
            wcK = wc[n][sl[n]]
            rows = tbl[icK.reshape(-1)].reshape(K, Hh, L * A * Pa, 4 * HD)
            outK = combine(rows, wcK).sum(axis=2)       # (K, Hh, HD)
            out = out.at[sl[n]].add(outK)
        return jnp.mean(out * x)

    kdiff_if("e", f"(e) compaction K={K}: {N*K*Hh*L*A*Pa/1e6:.2f}M rows", fe, x0,
          (one_table, idx_d, wts_d, sel))

    # ---- (f) (c) shape with bf16 table rows: same row count, half the
    # bytes. If (f) ~ (c), gather is row-issue-bound and byte width is
    # free; if ~2x faster, it is bandwidth-bound and bf16 rows are the
    # lever. ----
    tables_f = [t.astype(jnp.bfloat16) for t in tables_c]

    def ff(c, x):
        tbls, idxs, w = c
        idxs = dep(x, idxs)
        out = jnp.zeros((Q, Hh, HD), jnp.float32)
        for l in range(L):
            def per_cam(tc, ic, wc):
                rows = tc[ic].reshape(Q, Hh, A * Pa, 4 * HD).astype(
                    jnp.float32)
                return combine(rows, wc).sum(axis=2)

            out = out + jax.vmap(per_cam)(tbls[l], idxs[l], wts_b).sum(axis=0)
        return jnp.mean(out * x)

    check("f", ff, (tables_f, idx_c, wts_b), tol=2e-2)
    kdiff_if("f", "(f) = (c) with bf16 rows", ff, x0, (tables_f, idx_c, wts_b))

    # ---- (g) = (e) + bf16 rows: both levers stacked. ----
    def fg(c, x):
        tbl, ic, wc, sl = c
        ic = dep(x, ic)
        out = jnp.zeros((Q, Hh, HD), jnp.float32)
        for n in range(N):
            icK = ic[n][sl[n]]
            wcK = wc[n][sl[n]]
            rows = tbl[icK.reshape(-1)].reshape(
                K, Hh, L * A * Pa, 4 * HD).astype(jnp.float32)
            outK = combine(rows, wcK).sum(axis=2)
            out = out.at[sl[n]].add(outK)
        return jnp.mean(out * x)

    kdiff_if("g", f"(g) = (e) + bf16 rows", fg, x0,
          (one_table.astype(jnp.bfloat16), idx_d, wts_d, sel))


if __name__ == "__main__":
    main()
