"""Deploy-capacity sweep for the sparse table-gradient scan (round 5).

Same harness as probe_capacity_mb.py (chained 19-step loop at the headline
profile shapes, 65,536-ray steps, prop-grad steps at the 1/6 schedule
rate), comparing:
  * taped  — TableGradTape + bucketed accumulator (engages automatically:
             main tables at log2>=19 exceed _SORTED_GRAD_MIN_BYTES)
  * dense  — the round-4 path (sorted-transpose gather + dense scan adds),
             forced by tape_min_bytes = 1 TB
at log2 in {19, 20} x microbatch in {1024, 4096}. Run on the attached TPU:
  python scripts_dev/probe_tape_capacity.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp

from presight_tpu.data.cameras import CameraParams
from presight_tpu.engine import (OptimizerGroupConfig, StepScalars,
                                 init_train_state, make_optimizer, TrainStepPair)
from presight_tpu.models import NerfactoNuscMSConfig, init_model, param_groups
from presight_tpu.models.nerfacto_ms import make_prop_grid, ProposalUpdateSchedule

HUGE = 2 ** 40


def run(log2, mb, tape_min_bytes, steps_n=19):
    pose_rescale = 0.05
    config = NerfactoNuscMSConfig(
        hash_storage="shared", prop_shared_mlp=True, remat=False,
        log2_hashmap_size=log2, num_levels=4, features_per_level=10,
        prop_grid_res=64, num_proposal_samples_per_ray=(64, 32),
        num_nerf_samples_per_ray=48,
        proposal_net_args_list=(
            dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                 base_res=16, max_res=1024),
            dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                 base_res=16, max_res=4096),
        ),
        near_plane=0.1*pose_rescale, far_plane=1000.0*pose_rescale,
        piecewise_sampler_threshold=100.0*pose_rescale,
        pose_scale_factor=pose_rescale)
    R = 65536
    rng = np.random.RandomState(0)
    E = 16
    centroids = (rng.randn(E, 3)*2).astype(np.float32)
    aabbs = np.stack([np.stack([c-5., c+5.]) for c in centroids]).astype(np.float32)
    nc, nv = 1536, 12
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, nc, nv)
    c2w = np.tile(np.eye(3, 4, dtype=np.float32)[None], (nc, 1, 1))
    c2w[:, :3, 3] = rng.randn(nc, 3).astype(np.float32)
    cameras = CameraParams(c2w=jnp.asarray(c2w), fx=jnp.full((nc,), 800.),
                           fy=jnp.full((nc,), 800.), cx=jnp.full((nc,), 400.),
                           cy=jnp.full((nc,), 225.),
                           video_ids=jnp.asarray(rng.randint(0, nv, nc).astype(np.int32)))
    groups = {"proposal_networks": OptimizerGroupConfig(), "fields": OptimizerGroupConfig()}
    tx = make_optimizer(groups, param_groups(params))
    state = init_train_state(params, tx)
    steps = TrainStepPair(config, tx, split_update=True, microbatch_rays=mb,
                          tape_min_bytes=tape_min_bytes)
    sched = ProposalUpdateSchedule(config)
    grid = make_prop_grid(params, config)
    ii = {"i": 1000}
    scalars = StepScalars(anneal=jnp.asarray(1.0), sigma=jnp.asarray(5.0),
                          los_mult=jnp.asarray(0.1))

    def step(state, batch, r):
        i = ii["i"]; upd = sched.updated(i)
        out = steps(state, cameras, batch, r, scalars, stop_prop_grad=not upd,
                    prop_grid=grid)
        sched.step_cb(i, upd); ii["i"] = i + 1
        return out

    def batch_for(seed):
        r = np.random.RandomState(seed)
        return {"ray_index": jnp.asarray(np.stack(
                    [r.randint(0, nc, R), r.randint(0, 450, R),
                     r.randint(0, 800, R)], -1).astype(np.int32)),
                "rgb": jnp.asarray(r.rand(R, 3).astype(np.float32)),
                "sky": jnp.asarray((r.rand(R) > 0.9).astype(np.float32)),
                "depth": jnp.asarray((r.rand(R)*60).astype(np.float32)),
                "features": jnp.asarray(r.rand(R, 64).astype(np.float32))}

    key = jax.random.PRNGKey(0)
    batches = [batch_for(i) for i in range(6)]
    for _ in range(7):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batches[0], sub)
    _ = float(metrics["total_loss"])
    t0 = time.perf_counter()
    for i in range(steps_n):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batches[i % 6], sub)
        if (i+1) % 4 == 0:
            _ = float(metrics["total_loss"])
    _ = float(metrics["total_loss"])
    dt = (time.perf_counter()-t0)/steps_n
    return dt, R/dt, float(metrics["total_loss"])


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2", type=int, nargs="+", default=[19, 20])
    ap.add_argument("--mb", type=int, nargs="+", default=[1024, 4096])
    ap.add_argument("--modes", nargs="+", default=["taped", "dense"])
    a = ap.parse_args()
    import presight_tpu.ops.hash_encoding as he
    _orig_gather = he._gather_rows

    def _nograd_gather(tbl, idx):
        # Ablation: big tables contribute NO gradient at all — the delta vs
        # 'dense'/'taped' is the whole removable table-gradient cost.
        if tbl.shape[0] * tbl.shape[-1] * tbl.dtype.itemsize > 64 * 2**20:
            import jax.lax as lax
            return lax.stop_gradient(tbl)[idx]
        return _orig_gather(tbl, idx)

    import presight_tpu.engine.train_step as ts

    for log2 in a.log2:
        for mb in a.mb:
            for mode in a.modes:
                he._gather_rows = _nograd_gather if mode == "nograd" else _orig_gather
                ts._TAPE_DEBUG_SKIP_REDUCE = mode == "taped-noreduce"
                tmb = None if mode in ("taped", "taped-noreduce") else HUGE
                try:
                    dt, rps, loss = run(log2, mb, tmb)
                    print(f"log2={log2} mb={mb} {mode}: {dt*1e3:.1f} ms/step "
                          f"{rps:,.0f} rays/s (loss={loss:.3f})", flush=True)
                except Exception as e:
                    print(f"log2={log2} mb={mb} {mode} failed: "
                          f"{type(e).__name__} {str(e)[:300]}", flush=True)
