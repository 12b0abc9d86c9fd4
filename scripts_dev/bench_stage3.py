"""Stage-3 inference throughput at reference scale, on the attached TPU.

The reference publishes inference FPS alongside its quality numbers
(README.md:29-43): StreamMapNet 21.9 FPS w/prior, BEVFormer-raster 14.3,
BEVDet-Occ 4.9 (8x GPU train rigs; FPS measured single-GPU). This bench
runs OUR reference-named configs (configs/stage3_configs.py — reference
topology at reference input shapes) forward-only, batch 1 (6 cameras),
fp32, with the streaming/temporal/stereo/prior paths ACTIVE (zero-filled
prev/prior tensors so the full compute graph runs).

Methodology: chained K-differencing ((T(k2)-T(k1))/(k2-k1), median of 3)
— each iteration depends on the previous output so XLA cannot elide or
overlap them; dispatch and tunnel RTT cancel in the difference. The
chain runs as a lax.scan over the iteration count (the model appears
ONCE in the compiled program; an unrolled 6x chain of the full-scale
ResNet-50+BEVFormer graph did not finish compiling in 50 minutes).

Run: python scripts_dev/bench_stage3.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax
import jax.numpy as jnp


def kdiff_fps(name, apply_once, example, consts, k1=2, k2=8, reps=3,
              samples_per_app=1):
    """apply_once(consts, x) -> scalar; chained k times via lax.scan.

    ``consts`` (model variables + fixed input tensors) are jit ARGUMENTS,
    not closures — closed-over full-scale params get baked into the
    remote-compile payload and blow the tunnel's HTTP body limit (413).
    """
    def chain(consts, x, k):
        def body(carry, _):
            o = apply_once(consts, carry)
            # 1e-30 * o: numerically negligible but NOT constant-foldable
            # (o * 0.0 was folded away, which decoupled the iterations and
            # let XLA collapse the scan to one application).
            return x + o * 1e-30, o
        _, outs = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(outs)

    # The tunnel pool replays cached results for an identical (program,
    # inputs) pair — a rep with inputs it has seen before returns in ~1 ms
    # without touching the chip. Every call (warmup included) therefore
    # gets a numerically-distinct input.
    # VALUE-fetch (float()), never block_until_ready: on this runtime only
    # a fetch forces remote execution (PERFORMANCE.md bench methodology).
    variants = [jax.block_until_ready(example + (i + 1) * 1e-6)
                for i in range((reps + 1) * 2)]
    vi = iter(variants)
    meds = []
    for k in (k1, k2):
        fn = jax.jit(lambda c, x, k=k: chain(c, x, k))
        _ = float(fn(consts, next(vi)))
        ts = []
        for _r in range(reps):
            t0 = time.perf_counter()
            _ = float(fn(consts, next(vi)))
            ts.append(time.perf_counter() - t0)
        meds.append(sorted(ts)[reps // 2])
    per = (meds[1] - meds[0]) / (k2 - k1)
    print(f"{name:44s} {per*1e3:8.1f} ms/app  {samples_per_app/per:6.1f} "
          f"samples/s  [T({k1})={meds[0]:.3f}s T({k2})={meds[1]:.3f}s]",
          flush=True)
    return samples_per_app / per


def _bf16(t):
    """Cast every f32 leaf to bf16 (params + feature tensors; geometry
    tensors are kept OUT of the casted set by the callers — bf16's 8
    mantissa bits would quantize pixel coordinates to ~0.5 px)."""
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)


def bench_occ(variants=("fp32", "bf16", "batch4")):
    """Returns {variant: samples/s} for the selected variants (bench.py
    imports this for the driver-captured stage-3 rungs)."""
    out_fps = {}
    from presight_tpu.configs.stage3_configs import occ_configs

    model = occ_configs["bevdet-occ-r50d-8x4-24e_wcamprior_randomdrop"]()
    B, N = 1, 6
    H, W = model.input_size
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(B, N, 3, H, W).astype(np.float32))
    intr = np.array([[1266.0, 0, 352.0], [0, 1266.0, 128.0], [0, 0, 1]],
                    np.float32)
    cam2imgs = jnp.asarray(np.tile(intr, (B, N, 1, 1)))
    s2e = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for i in range(N):  # spread cameras so frustums differ
        s2e[:, i, :3, 3] = [np.cos(i), np.sin(i), 1.5]
    sensor2ego = jnp.asarray(s2e)
    post_rots = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1)))
    post_trans = jnp.zeros((B, N, 3))
    bda = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))

    # Temporal + stereo actives: zero-filled previous-frame tensors with
    # the real shapes (stride-4 ResNet stage-0 stereo feature).
    gz = model.grid_config["z"]; gx = model.grid_config["x"]; gy = model.grid_config["y"]
    Z = int(round((gz[1] - gz[0]) / gz[2]))
    X = int(round((gx[1] - gx[0]) / gx[2]))
    Y = int(round((gy[1] - gy[0]) / gy[2]))
    prev_bev = jnp.zeros((B, model.view_out_channels, Z, Y, X))
    prev2curr = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    prev_stereo = jnp.zeros((B, N, H // 4, W // 4, 256))
    k2s = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1)))

    kwargs = dict(prev_bev=prev_bev, prev2curr=prev2curr,
                  prev_stereo_feat=prev_stereo, k2s_sensor=k2s)
    variables = model.init(jax.random.PRNGKey(0), imgs, sensor2ego, cam2imgs,
                           post_rots, post_trans, bda, **kwargs)

    consts = (variables, sensor2ego, cam2imgs, post_rots, post_trans, bda,
              kwargs)

    def apply_once(c, x):
        v, s2e_, c2i_, pr_, pt_, bda_, kw = c
        out = model.apply(v, x, s2e_, c2i_, pr_, pt_, bda_, **kw)
        leaf = out[0] if isinstance(out, tuple) else out
        return jnp.mean(leaf)

    if "fp32" in variants:
        out_fps["fp32"] = kdiff_fps(
            "bevdet-occ r50 256x704 temporal+stereo", apply_once, imgs,
            consts)

    # bf16 deployment mode: params + feature tensors in bf16 (2x MXU rate,
    # half the gather/HBM bytes); geometry (sensor2ego/cam2imgs/post_*/bda/
    # prev2curr/k2s) stays fp32 — it feeds coordinate math, not the MXU.
    # The chained input x stays fp32 (the 1e-6 variant noise would round
    # away in bf16 and the tunnel would replay a cached result); the cast
    # happens inside the step.
    kwargs_bf = dict(prev_bev=_bf16(prev_bev), prev2curr=prev2curr,
                     prev_stereo_feat=_bf16(prev_stereo), k2s_sensor=k2s)
    consts_bf = (_bf16(variables), sensor2ego, cam2imgs, post_rots,
                 post_trans, bda, kwargs_bf)

    def apply_bf16(c, x):
        v, s2e_, c2i_, pr_, pt_, bda_, kw = c
        out = model.apply(v, x.astype(jnp.bfloat16), s2e_, c2i_, pr_, pt_,
                          bda_, **kw)
        leaf = out[0] if isinstance(out, tuple) else out
        return jnp.mean(leaf.astype(jnp.float32))

    if "bf16" in variants:
        out_fps["bf16"] = kdiff_fps("bevdet-occ r50 256x704 bf16",
                                    apply_bf16, imgs, consts_bf)

    # Batch-4 throughput (the model natively carries a batch axis).
    B4 = 4

    def tile(a):
        return jnp.concatenate([a] * B4, axis=0)

    consts4 = (jax.tree.map(lambda a: a, variables),
               tile(sensor2ego), tile(cam2imgs), tile(post_rots),
               tile(post_trans), tile(bda),
               {k: tile(v) for k, v in kwargs.items()})
    imgs4 = tile(imgs)

    def apply_once4(c, x):
        v, s2e_, c2i_, pr_, pt_, bda_, kw = c
        out = model.apply(v, x, s2e_, c2i_, pr_, pt_, bda_, **kw)
        leaf = out[0] if isinstance(out, tuple) else out
        return jnp.mean(leaf)

    if "batch4" in variants:
        out_fps["batch4"] = kdiff_fps(
            f"bevdet-occ r50 256x704 batch{B4} throughput", apply_once4,
            imgs4, consts4, samples_per_app=B4)
    return out_fps


def _pinhole_ring(N, fx, cx, cy):
    intr = np.array([[fx, 0, cx], [0, fx, cy], [0, 0, 1]], np.float32)
    l2i = []
    for i in range(N):
        ang = 2 * np.pi * i / N
        fwd = np.array([np.cos(ang), np.sin(ang), 0], np.float32)
        right = np.array([-np.sin(ang), np.cos(ang), 0], np.float32)
        down = np.array([0, 0, -1], np.float32)
        rot = np.stack([right, down, fwd])  # cam: x right, y down, z fwd
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = intr @ rot
        l2i.append(P)
    return jnp.asarray(np.stack(l2i))


def bench_map(name, variants=("fp32", "batch4", "bf16", "bf16_batch4")):
    """Returns {variant: samples/s} (see bench_occ)."""
    out_fps = {}
    from presight_tpu.configs.stage3_configs import map_configs

    model = map_configs[name]()
    N = 6
    H, W = model.img_size
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(N, 3, H, W).astype(np.float32))
    lidar2img = _pinhole_ring(N, 800.0, W / 2, H / 2)
    V = 4096
    pf = jnp.asarray(rng.randn(V, 68).astype(np.float32))
    pc = jnp.asarray(np.stack([rng.randint(0, 100, V), rng.randint(0, 100, V),
                               rng.randint(0, 8, V)], -1).astype(np.int32))
    pv = jnp.ones((V,), np.float32)
    prior = dict(prior_feats=pf, prior_coords=pc, prior_valid=pv)

    is_smn = hasattr(model, "num_queries")
    if is_smn:
        Hb, Wb = model.bev_hw
        stream = dict(prev_bev=jnp.zeros((model.embed_dim, Hb, Wb)),
                      prev2curr=jnp.eye(3),
                      prev_queries=jnp.zeros((model.topk_propagate,
                                              model.embed_dim)))
    else:
        stream = {}
    variables = model.init(jax.random.PRNGKey(0), imgs, lidar2img,
                           **stream, **prior)

    consts = (variables, lidar2img, stream, prior)

    def apply_once(c, x):
        v, l2i, st, pr = c
        out, _ = model.apply(v, x, l2i, **st, **pr,
                             mutable=["batch_stats"])
        leaf = out["scores"] if isinstance(out, dict) else out
        return jnp.mean(leaf)

    label = "smn" if is_smn else "raster"
    if "fp32" in variants:
        out_fps["fp32"] = kdiff_fps(
            f"{label} r50 480x800 streaming+prior", apply_once, imgs,
            consts)

    # Batch-4 throughput: TPU latency at batch 1 underuses the chip; the
    # deployment-relevant number for offline/near-line perception is
    # samples/s at a modest batch (vmap over the full per-sample graph).
    B = 4
    imgs_b = jnp.asarray(rng.rand(B, N, 3, H, W).astype(np.float32))

    def apply_batch(c, xb):
        def one(x):
            return apply_once(c, x)
        return jnp.sum(jax.vmap(one)(xb))

    if "batch4" in variants:
        out_fps["batch4"] = kdiff_fps(
            f"{label} r50 480x800 batch{B} throughput", apply_batch,
            imgs_b, consts, samples_per_app=B)

    # bf16 deployment mode (see bench_occ): params + feature tensors
    # (prev_bev, prev_queries, prior_feats) bf16, geometry fp32.
    stream_bf = dict(stream)
    for key in ("prev_bev", "prev_queries"):
        if key in stream_bf:
            stream_bf[key] = _bf16(stream_bf[key])
    prior_bf = dict(prior, prior_feats=_bf16(prior["prior_feats"]))
    consts_bf = (_bf16(variables), lidar2img, stream_bf, prior_bf)

    def apply_bf16(c, x):
        v, l2i, st, pr = c
        out, _ = model.apply(v, x.astype(jnp.bfloat16), l2i, **st, **pr,
                             mutable=["batch_stats"])
        leaf = out["scores"] if isinstance(out, dict) else out
        return jnp.mean(leaf.astype(jnp.float32))

    if "bf16" in variants:
        out_fps["bf16"] = kdiff_fps(f"{label} r50 480x800 bf16", apply_bf16,
                                    imgs, consts_bf)

    def apply_batch_bf16(c, xb):
        return jnp.sum(jax.vmap(lambda x: apply_bf16(c, x))(xb))

    if "bf16_batch4" in variants:
        out_fps["bf16_batch4"] = kdiff_fps(
            f"{label} r50 480x800 bf16 batch{B}", apply_batch_bf16,
            imgs_b, consts_bf, samples_per_app=B)
    return out_fps


if __name__ == "__main__":
    for fn, arg in ((bench_map, "smn_wcamprior_480_100x50_24e_randomdrop"),
                    (bench_map, "nusc_raster_wcamprior_480_100x50_24e_randomdrop"),
                    (bench_occ, None)):
        try:
            fn(arg) if arg else fn()
        except Exception as e:
            print(f"FAILED {arg or fn.__name__}: {type(e).__name__} "
                  f"{str(e)[:300]}", flush=True)
