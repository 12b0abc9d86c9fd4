"""BEVDet-occ batch-4 composition probe (round 5, VERDICT weak #4/item 7).

Round-4/5 dissection: the natively-batched graph regresses at batch 4
(3.4 samples/s vs 4.4 at batch 1) — the inflation is spread across the
(B, C, Z, 200, 200) 3-D conv stack / temporal warp / ~2.3 GB activation
footprint, with the cost volume exonerated (scales linearly). Hypothesis:
composing the batch SEQUENTIALLY inside one jit (lax.map over per-sample
slices, or over batch-2 chunks) keeps each application's activation
footprint in the batch-1 regime and restores monotone samples/s.

Measures, chained K-differencing (bench_stage3 conventions):
  1. native batch-4 (the current bench rung; baseline)
  2. lax.map over 4 per-sample applications
  3. lax.map over 2 batch-2 applications

Run: python scripts_dev/probe_occ_batchmap.py
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np

from bench_stage3 import kdiff_fps  # noqa: E402  (same dir)
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax
import jax.numpy as jnp
from presight_tpu.configs.stage3_configs import occ_configs


def main():
    model = occ_configs["bevdet-occ-r50d-8x4-24e_wcamprior_randomdrop"]()
    B, N = 1, 6
    H, W = model.input_size
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(B, N, 3, H, W).astype(np.float32))
    intr = np.array([[1266.0, 0, 352.0], [0, 1266.0, 128.0], [0, 0, 1]],
                    np.float32)
    cam2imgs = jnp.asarray(np.tile(intr, (B, N, 1, 1)))
    s2e = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for i in range(N):
        s2e[:, i, :3, 3] = [np.cos(i), np.sin(i), 1.5]
    sensor2ego = jnp.asarray(s2e)
    post_rots = jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                                    (B, N, 1, 1)))
    post_trans = jnp.zeros((B, N, 3))
    bda = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))

    gz = model.grid_config["z"]; gx = model.grid_config["x"]
    gy = model.grid_config["y"]
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

    B4 = 4

    def tile(a):
        return jnp.concatenate([a] * B4, axis=0)

    consts4 = (variables, tile(sensor2ego), tile(cam2imgs), tile(post_rots),
               tile(post_trans), tile(bda),
               {k: tile(v) for k, v in kwargs.items()})
    imgs4 = tile(imgs)

    def apply_native(c, x):
        v, s2e_, c2i_, pr_, pt_, bda_, kw = c
        out = model.apply(v, x, s2e_, c2i_, pr_, pt_, bda_, **kw)
        leaf = out[0] if isinstance(out, tuple) else out
        return jnp.mean(leaf)

    def make_mapped(chunk):
        n_chunks = B4 // chunk

        def apply_mapped(c, x):
            v, s2e_, c2i_, pr_, pt_, bda_, kw = c

            def split(a):
                return a.reshape((n_chunks, chunk) + a.shape[1:])

            xs = (split(x), split(s2e_), split(c2i_), split(pr_), split(pt_),
                  split(bda_), {k: split(a) for k, a in kw.items()})

            def one(args):
                xi, s2e_i, c2i_i, pr_i, pt_i, bda_i, kw_i = args
                out = model.apply(v, xi, s2e_i, c2i_i, pr_i, pt_i, bda_i,
                                  **kw_i)
                leaf = out[0] if isinstance(out, tuple) else out
                return jnp.mean(leaf)

            return jnp.sum(jax.lax.map(one, xs))

        return apply_mapped

    def apply_shipped(c, x):
        # The shipped deployment composition (occupancy/inference.py);
        # unlike the inline arms above it carries ALL model outputs
        # through the map — the honest deployed graph.
        from presight_tpu.occupancy import mapped_apply

        v, s2e_, c2i_, pr_, pt_, bda_, kw = c
        out = mapped_apply(model, v, (x, s2e_, c2i_, pr_, pt_, bda_), kw,
                           chunk_size=1)
        leaf = out[0] if isinstance(out, tuple) else out
        return jnp.mean(leaf)

    import os
    arms = set(filter(None, os.environ.get("OCC_ARMS", "").split(",")))

    def want(name):
        return not arms or name in arms

    if want("native"):
        kdiff_fps("occ b4 native (baseline)", apply_native, imgs4, consts4,
                  samples_per_app=B4)
    if want("map1"):
        kdiff_fps("occ b4 = lax.map 4 x b1", make_mapped(1), imgs4, consts4,
                  samples_per_app=B4)
    if want("map2"):
        kdiff_fps("occ b4 = lax.map 2 x b2", make_mapped(2), imgs4, consts4,
                  samples_per_app=B4)
    if want("shipped"):
        kdiff_fps("occ b4 shipped mapped_apply(chunk=1)", apply_shipped,
                  imgs4, consts4, samples_per_app=B4)


if __name__ == "__main__":
    main()
