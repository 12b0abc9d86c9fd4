"""Deploy-capacity perf sweep (VERDICT r4 item 2a): the headline profile's
shared main tables at tile-scale capacity — log2 17 (shipped cap4x) vs 19
and 20 (the reference main field is 10x2^20x4 per expert,
nerfacto_nusc_ms.py:117-139) — so the capacity knob's rays/s price is
measured before real data ever arrives. The 1-in-6 prop-grad steps cross
the 8 MB scatter cliff at these sizes; the chained 12-step loop includes
them at the schedule rate.

grid-n48-cap4x fixed everything except the two PROPOSAL round counts
(64, 64). The config-delta table (PERFORMANCE.md) says round-1 (grid) is
~216 ms/65k-step and round-2 (fine prop) ~108 ms at the OLD profile; at
the fused n48 profile the shares shift, so measure directly. Chained
steps, microbatch 1024 (the n48 optimum). Run on the attached TPU:
  python scripts_dev/probe_prop_counts.py
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
from presight_tpu.utils.jax_setup import setup as _setup_jax
_setup_jax()
import jax, jax.numpy as jnp

for mb in (1024, 2048, 4096, 8192):
    p1, p2, log2 = 64, 32, 19
    from presight_tpu.data.cameras import CameraParams
    from presight_tpu.engine import (OptimizerGroupConfig, StepScalars,
                                     init_train_state, make_optimizer, TrainStepPair)
    from presight_tpu.models import NerfactoNuscMSConfig, init_model, param_groups
    from presight_tpu.models.nerfacto_ms import make_prop_grid, ProposalUpdateSchedule
    pose_rescale = 0.05
    config = NerfactoNuscMSConfig(
        hash_storage="shared", prop_shared_mlp=True, remat=False,
        log2_hashmap_size=log2, num_levels=4, features_per_level=10,
        prop_grid_res=64, num_proposal_samples_per_ray=(p1, p2),
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
    steps = TrainStepPair(config, tx, split_update=True, microbatch_rays=mb)
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
        print(f"caps log2=19 mb={mb}: {dt*1e3:.1f} ms/step {R/dt:,.0f} rays/s", flush=True)
    except Exception as e:
        print(f"caps log2=19 mb={mb} failed: {type(e).__name__} {str(e)[:200]}", flush=True)
