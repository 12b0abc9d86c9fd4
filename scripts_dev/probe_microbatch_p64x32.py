"""Microbatch sweep at the p64x32 proposal cut (round-4 candidate).

The 1024-ray optimum was tuned at the grid-s64 profile (final=64,
log2 15); the n48 cut shrinks the per-microbatch working set (~25%
fewer sample rows) while cap4x quadruples the main-table rows the
gathers hit — both move the VMEM-residency sweet spot, so re-sweep.
Run on the attached TPU: python scripts_dev/probe_microbatch_n48.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp

for micro in (768, 1024, 1536, 2048):
    from presight_tpu.data.cameras import CameraParams
    from presight_tpu.engine import (OptimizerGroupConfig, StepScalars,
                                     init_train_state, make_optimizer, TrainStepPair)
    from presight_tpu.models import NerfactoNuscMSConfig, init_model, param_groups
    from presight_tpu.models.nerfacto_ms import make_prop_grid, ProposalUpdateSchedule
    pose_rescale = 0.05
    # Matches bench.py build(storage="grid-n48-cap4x").
    config = NerfactoNuscMSConfig(
        hash_storage="shared", prop_shared_mlp=True, remat=False,
        log2_hashmap_size=17, num_levels=4, features_per_level=10,
        prop_grid_res=64, num_proposal_samples_per_ray=(64, 32),
        num_nerf_samples_per_ray=48,
        proposal_net_args_list=(
            dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                 base_res=16, max_res=1024),
            dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                 base_res=16, max_res=4096),
        ),
        near_plane=0.1*pose_rescale, far_plane=1000.0*pose_rescale,
        piecewise_sampler_threshold=100.0*pose_rescale, pose_scale_factor=pose_rescale)
    R = 65536
    rng = np.random.RandomState(0)
    E = 16
    centroids = (rng.randn(E,3)*2).astype(np.float32)
    aabbs = np.stack([np.stack([c-5.,c+5.]) for c in centroids]).astype(np.float32)
    nc, nv = 1536, 12
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, nc, nv)
    c2w = np.tile(np.eye(3,4,dtype=np.float32)[None],(nc,1,1))
    c2w[:, :3, 3] = rng.randn(nc,3).astype(np.float32)
    cameras = CameraParams(c2w=jnp.asarray(c2w), fx=jnp.full((nc,),800.), fy=jnp.full((nc,),800.),
                           cx=jnp.full((nc,),400.), cy=jnp.full((nc,),225.),
                           video_ids=jnp.asarray(rng.randint(0,nv,nc).astype(np.int32)))
    groups = {"proposal_networks": OptimizerGroupConfig(), "fields": OptimizerGroupConfig()}
    tx = make_optimizer(groups, param_groups(params))
    state = init_train_state(params, tx)
    steps = TrainStepPair(config, tx, split_update=True, microbatch_rays=micro)
    sched = ProposalUpdateSchedule(config)
    grid = make_prop_grid(params, config)
    ii = {"i": 1000}
    scalars = StepScalars(anneal=jnp.asarray(1.0), sigma=jnp.asarray(5.0), los_mult=jnp.asarray(0.1))
    def step(state, batch, r):
        i = ii["i"]; upd = sched.updated(i)
        out = steps(state, cameras, batch, r, scalars, stop_prop_grad=not upd, prop_grid=grid)
        sched.step_cb(i, upd); ii["i"] = i+1
        return out
    def batch_for(seed):
        r = np.random.RandomState(seed)
        return {"ray_index": jnp.asarray(np.stack([r.randint(0,nc,R), r.randint(0,450,R), r.randint(0,800,R)],-1).astype(np.int32)),
                "rgb": jnp.asarray(r.rand(R,3).astype(np.float32)),
                "sky": jnp.asarray((r.rand(R)>0.9).astype(np.float32)),
                "depth": jnp.asarray((r.rand(R)*60).astype(np.float32)),
                "features": jnp.asarray(r.rand(R,64).astype(np.float32))}
    key = jax.random.PRNGKey(0)
    batches = [batch_for(i) for i in range(6)]
    try:
        for _ in range(7):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batches[0], sub)
        _ = float(metrics["total_loss"])
        t0 = time.perf_counter()
        for i in range(12):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batches[i%6], sub)
            if (i+1)%4 == 0:
                _ = float(metrics["total_loss"])
        _ = float(metrics["total_loss"])
        dt = (time.perf_counter()-t0)/12
        print(f"microbatch {micro}: {dt*1e3:.1f} ms/step {R/dt:,.0f} rays/s", flush=True)
    except Exception as e:
        print(f"microbatch {micro} failed: {type(e).__name__} {str(e)[:200]}", flush=True)
