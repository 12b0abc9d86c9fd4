"""Component-level K-diff profile of the reference-scale StreamMapNet.

Slices the 204 ms/frame forward (bench_stage3) into ResNet-50 backbone,
BEVFormer encoder layer (TSA + SCA over 5000 queries), and decoder head,
to find where the 4.9-vs-21.9-FPS gap against the reference A100 lives.
Same harness rules as bench_stage3: variables as jit args, non-foldable
chaining, distinct inputs per rep, value-fetch timing.

First run found: backbone+layer = 202.5 ms, head = 1.4 ms (and a
0-layer encoder DCEs the whole backbone — the levels are unused).
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax
import jax.numpy as jnp
import flax.linen as nn


def kdiff(name, apply_once, example, consts, k1=2, k2=8, reps=3):
    def chain(consts, x, k):
        def body(carry, _):
            o = apply_once(consts, carry)
            return x + o * 1e-30, o
        _, outs = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(outs)

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
    print(f"{name:44s} {per*1e3:8.1f} ms  [T({k1})={meds[0]:.3f}s "
          f"T({k2})={meds[1]:.3f}s]", flush=True)
    return per


class BackboneOnly(nn.Module):
    """The exact trunk BEVEncoder builds for backbone='resnet' + dcn +
    FPN, returning a scalar so nothing is DCE'd."""
    embed_dim: int = 256
    num_levels: int = 3

    @nn.compact
    def __call__(self, x):
        from presight_tpu.occupancy.backbones import ResNet
        from presight_tpu.mapping.bev_encoder import DeformConv2d

        feats = ResNet(50, (1, 2, 3), 64, name="resnet")(x, False)
        feats = list(feats)
        feats[1] = DeformConv2d(feats[1].shape[-1], name="dcn_s3")(feats[1])
        feats[2] = DeformConv2d(feats[2].shape[-1], name="dcn_s4")(feats[2])
        lat = [nn.Conv(self.embed_dim, (1, 1), name=f"fpn_lat{i}")(f)
               for i, f in enumerate(feats)]
        for i in range(len(lat) - 1, 0, -1):
            up = jax.image.resize(
                lat[i], (lat[i].shape[0], lat[i - 1].shape[1],
                         lat[i - 1].shape[2], lat[i].shape[3]), "nearest")
            lat[i - 1] = lat[i - 1] + up
        levels = [nn.Conv(self.embed_dim, (3, 3), padding="SAME",
                          name=f"fpn_out{i}")(lat[i])
                  for i in range(self.num_levels)]
        return sum(jnp.mean(lv) for lv in levels)


def main():
    from presight_tpu.configs.stage3_configs import map_configs
    from presight_tpu.mapping.bev_encoder import (
        EncoderLayer, project_bev_to_cameras)

    model = map_configs["smn_wcamprior_480_100x50_24e_randomdrop"]()
    N = 6
    H, W = model.img_size
    rng = np.random.RandomState(0)
    imgs_nhwc = jnp.asarray(rng.rand(N, H, W, 3).astype(np.float32))

    bb = BackboneOnly(model.embed_dim, model.num_levels)
    vbb = bb.init(jax.random.PRNGKey(0), imgs_nhwc)
    kdiff("resnet50+dcn+fpn 6x480x800", lambda c, x: bb.apply(c, x),
          imgs_nhwc, vbb)

    # Encoder layer alone on fixed camera features at reference scale.
    Hb, Wb = model.bev_hw
    Q = Hb * Wb
    D = model.embed_dim
    lvl_shapes = [(N, H // s, W // s, D) for s in (8, 16, 32)]
    levels = [jnp.asarray(rng.rand(*s).astype(np.float32) * 0.1)
              for s in lvl_shapes[: model.num_levels]]
    sys.path.insert(0, "/root/repo/scripts_dev")
    from bench_stage3 import _pinhole_ring
    l2i = _pinhole_ring(N, 800.0, W / 2, H / 2)
    zs = tuple(np.linspace(-3.0, 3.0, model.num_z_anchors))
    ref_pix, valid = project_bev_to_cameras(
        model.bev_hw, model.roi_size, l2i, model.img_size,
        levels[0].shape[1:3], z_anchors=zs)
    cap = getattr(model, 'sca_capacity_frac', 1.0)
    layer = EncoderLayer(D, model.bev_hw, model.num_heads, 4,
                         model.num_levels, 8, cap)
    bev_q = jnp.asarray(rng.rand(Q, D).astype(np.float32))
    vl = layer.init(jax.random.PRNGKey(0), bev_q, ref_pix, levels, valid)

    def fl(c, x):
        lvls, vars_ = c
        return jnp.mean(layer.apply(vars_, x, ref_pix, lvls, valid))

    kdiff(f"encoder layer (TSA+SCA, Q={Q}, 3lv x {model.num_z_anchors}za)",
          fl, bev_q, (levels, vl))

    # SCA alone (the suspected dominant piece).
    from presight_tpu.mapping.bev_encoder import SpatialCrossAttention
    sca = SpatialCrossAttention(D, model.num_heads, 8, model.num_levels,
                                cap)
    vs = sca.init(jax.random.PRNGKey(0), bev_q, ref_pix, levels, valid)

    def fs(c, x):
        lvls, vars_ = c
        return jnp.mean(sca.apply(vars_, x, ref_pix, lvls, valid))

    kdiff("SCA alone", fs, bev_q, (levels, vs))

    from presight_tpu.mapping.bev_encoder import TemporalSelfAttention
    tsa = TemporalSelfAttention(D, model.bev_hw, model.num_heads, 4)
    vt = tsa.init(jax.random.PRNGKey(0), bev_q, None)

    def ft(c, x):
        return jnp.mean(tsa.apply(c, x, None))

    kdiff("TSA alone (no prev)", ft, bev_q, vt)


if __name__ == "__main__":
    main()
