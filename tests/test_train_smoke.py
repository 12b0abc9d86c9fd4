"""End-to-end smoke training: tiny model, synthetic scene, loss must drop.

This is BASELINE config 1's CPU-runnable shape: RGB-only-ish (plus sky/
semantic heads exercised), one expert AABB, few iterations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from presight_tpu.data.cameras import CameraParams, generate_rays
from presight_tpu.engine import (
    OptimizerGroupConfig,
    StepScalars,
    TrainStepPair,
    init_train_state,
    make_optimizer,
)
from presight_tpu.models import (
    NerfactoNuscMSConfig,
    ProposalUpdateSchedule,
    anneal_at,
    forward,
    init_model,
    line_of_sight_mult_at,
    line_of_sight_sigma_at,
    param_groups,
)


def tiny_config(**overrides):
    defaults = dict(
        near_plane=0.05,
        far_plane=60.0,
        num_levels=4,
        base_res=4,
        max_res=128,
        log2_hashmap_size=12,
        features_per_level=2,
        hidden_dim=16,
        hidden_dim_color=16,
        num_proposal_samples_per_ray=(24, 12),
        num_nerf_samples_per_ray=12,
        proposal_net_args_list=(
            dict(features_per_level=1, log2_hashmap_size=10, num_levels=3,
                 base_res=4, max_res=32),
            dict(features_per_level=1, log2_hashmap_size=10, num_levels=3,
                 base_res=4, max_res=64),
        ),
        piecewise_sampler_threshold=5.0,
        proposal_warmup=20,
        proposal_weights_anneal_max_num_iters=20,
        appearance_embed_dim=4,
        video_embed_dim=4,
        sky_mlp_dims=16,
        semantic_dim=8,
        use_lidar_loss=False,
        pose_scale_factor=1.0,
    )
    defaults.update(overrides)
    return NerfactoNuscMSConfig(**defaults)


def synthetic_scene(num_cameras=4, height=16, width=24, seed=0):
    """Cameras on a ring looking at the origin; images are a simple
    direction-dependent color pattern so the model has something to fit."""
    rng = np.random.RandomState(seed)
    c2ws, fxs = [], []
    for i in range(num_cameras):
        ang = 2 * np.pi * i / num_cameras
        eye = np.array([6 * np.cos(ang), 6 * np.sin(ang), 1.5], np.float32)
        forward_v = -eye / np.linalg.norm(eye)
        up = np.array([0, 0, 1], np.float32)
        right = np.cross(forward_v, up)
        right /= np.linalg.norm(right)
        new_up = np.cross(right, forward_v)
        # nerfstudio: camera looks along -z; columns [right, up, -forward]
        rot = np.stack([right, new_up, -forward_v], axis=-1)
        c2w = np.concatenate([rot, eye[:, None]], axis=-1).astype(np.float32)
        c2ws.append(c2w)
    cameras = CameraParams(
        c2w=jnp.asarray(np.stack(c2ws)),
        fx=jnp.full((num_cameras,), 20.0, jnp.float32),
        fy=jnp.full((num_cameras,), 20.0, jnp.float32),
        cx=jnp.full((num_cameras,), width / 2, jnp.float32),
        cy=jnp.full((num_cameras,), height / 2, jnp.float32),
        video_ids=jnp.zeros((num_cameras,), jnp.int32),
    )
    return cameras


def target_fn(directions):
    """Ground-truth color as a smooth function of direction."""
    return 0.5 + 0.5 * np.stack(
        [np.sin(3 * directions[:, 0]), np.cos(2 * directions[:, 1]),
         np.sin(directions[:, 2])], axis=-1
    ).astype(np.float32) * 0.8


def make_batch(cameras, num_rays, rng, height=16, width=24):
    cam = rng.randint(0, cameras.num_cameras, num_rays)
    row = rng.randint(0, height, num_rays)
    col = rng.randint(0, width, num_rays)
    ray_index = np.stack([cam, row, col], -1).astype(np.int32)
    bundle = generate_rays(cameras, jnp.asarray(ray_index))
    d = np.asarray(bundle.directions)
    batch = {
        "ray_index": jnp.asarray(ray_index),
        "rgb": jnp.asarray(target_fn(d)),
        "sky": jnp.zeros((num_rays,), jnp.float32),
        "features": jnp.asarray(
            (0.5 + 0.4 * np.sin(d.sum(-1)))[:, None]
            * np.ones((1, 8), np.float32)
        ),
    }
    return batch


def test_forward_shapes_and_finiteness():
    config = tiny_config()
    aabbs = np.array([[[-10, -10, -10], [10, 10, 10]]], np.float32)
    centroids = np.zeros((1, 3), np.float32)
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, 4, 1)
    cameras = synthetic_scene()
    rng = np.random.RandomState(0)
    batch = make_batch(cameras, 32, rng)
    bundle = generate_rays(cameras, batch["ray_index"])
    out = forward(params, config, bundle, jax.random.PRNGKey(1),
                  jnp.asarray(1.0), train=True)
    assert out["rgb"].shape == (32, 3)
    assert out["accumulation"].shape == (32,)
    assert out["depth"].shape == (32,)
    assert out["semantics"].shape == (32, 8)
    for k in ("rgb", "accumulation", "depth", "expected_depth", "semantics"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert (np.asarray(out["rgb"]) >= 0).all()
    # Eval path (mean appearance embedding)
    out_eval = forward(params, config, bundle, jax.random.PRNGKey(1),
                       jnp.asarray(1.0), train=False)
    assert np.isfinite(np.asarray(out_eval["rgb"])).all()


def test_smoke_train_loss_decreases():
    config = tiny_config()
    aabbs = np.array([[[-10, -10, -10], [10, 10, 10]]], np.float32)
    centroids = np.zeros((1, 3), np.float32)
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, 4, 1)
    cameras = synthetic_scene()

    groups = {
        "proposal_networks": OptimizerGroupConfig(lr=1e-2, max_steps=100, warmup_steps=10,
                                                  milestones=(25, 50, 75)),
        "fields": OptimizerGroupConfig(lr=1e-2, max_steps=100, warmup_steps=10,
                                       milestones=(25, 50, 75)),
    }
    tx = make_optimizer(groups, param_groups(params))
    state = init_train_state(params, tx)
    steps = TrainStepPair(config, tx)
    sched = ProposalUpdateSchedule(config)

    rng = np.random.RandomState(0)
    losses = []
    key = jax.random.PRNGKey(42)
    for step in range(30):
        batch = make_batch(cameras, 64, rng)
        key, sub = jax.random.split(key)
        scalars = StepScalars(
            anneal=jnp.asarray(anneal_at(config, step), jnp.float32),
            sigma=jnp.asarray(line_of_sight_sigma_at(config, step), jnp.float32),
            los_mult=jnp.asarray(line_of_sight_mult_at(config, step), jnp.float32),
        )
        updated = sched.updated(step)
        state, metrics = steps(state, cameras, batch, sub, scalars,
                               stop_prop_grad=not updated)
        sched.step_cb(step, updated)
        losses.append(float(metrics["total_loss"]))

    assert np.isfinite(losses).all(), losses
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert late < early, (early, late, losses)


def test_smoke_train_with_sorted_grad_gather(monkeypatch):
    """Force the big-table sorted-transpose gather (hash_encoding.
    _gather_rows_sorted_grad, normally gated on a 64 MB gradient-table
    threshold) through the FULL jitted train step — shared storage,
    microbatched, remat on — so the custom_vjp's composition with scan/
    remat/donation is covered, not just its bare gradient parity."""
    from presight_tpu.ops import hash_encoding as he

    monkeypatch.setattr(he, "_SORTED_GRAD_MIN_BYTES", 0)
    config = tiny_config(hash_storage="shared", prop_shared_mlp=True)
    aabbs = np.array([[[-10, -10, -10], [10, 10, 10]]], np.float32)
    centroids = np.zeros((1, 3), np.float32)
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, 4, 1)
    cameras = synthetic_scene()

    groups = {
        "proposal_networks": OptimizerGroupConfig(lr=1e-2, max_steps=100,
                                                  warmup_steps=10),
        "fields": OptimizerGroupConfig(lr=1e-2, max_steps=100,
                                       warmup_steps=10),
    }
    tx = make_optimizer(groups, param_groups(params))
    state = init_train_state(params, tx)
    steps = TrainStepPair(config, tx, microbatch_rays=32)
    sched = ProposalUpdateSchedule(config)

    rng = np.random.RandomState(0)
    losses = []
    key = jax.random.PRNGKey(42)
    for step in range(12):
        batch = make_batch(cameras, 64, rng)
        key, sub = jax.random.split(key)
        scalars = StepScalars(
            anneal=jnp.asarray(anneal_at(config, step), jnp.float32),
            sigma=jnp.asarray(line_of_sight_sigma_at(config, step), jnp.float32),
            los_mult=jnp.asarray(line_of_sight_mult_at(config, step), jnp.float32),
        )
        updated = sched.updated(step)
        state, metrics = steps(state, cameras, batch, sub, scalars,
                               stop_prop_grad=not updated)
        sched.step_cb(step, updated)
        losses.append(float(metrics["total_loss"]))

    assert np.isfinite(losses).all(), losses
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_taped_table_grads_match_dense():
    """The sparse table-gradient scan (TableGradTape + bucketed
    accumulator, engaged at deploy table capacity) must produce the same
    training step as the dense per-microbatch path — same losses, same
    updated parameters up to float summation order. tape_min_bytes=0
    forces every hash-table leaf (main field, proposal fields, sky) onto
    the taped path at toy sizes."""
    from presight_tpu.engine.train_step import make_train_step

    config = tiny_config(hash_storage="shared", remat=False)
    aabbs = np.array([[[-10, -10, -10], [10, 10, 10]]], np.float32)
    centroids = np.zeros((1, 3), np.float32)
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, 4, 1)
    cameras = synthetic_scene()
    groups = {
        "proposal_networks": OptimizerGroupConfig(lr=1e-2, max_steps=100,
                                                  warmup_steps=10),
        "fields": OptimizerGroupConfig(lr=1e-2, max_steps=100,
                                       warmup_steps=10),
    }
    tx = make_optimizer(groups, param_groups(params))

    rng = np.random.RandomState(3)
    batch = make_batch(cameras, 64, rng)
    key = jax.random.PRNGKey(7)
    scalars = StepScalars(anneal=jnp.asarray(1.0), sigma=jnp.asarray(1.0),
                          los_mult=jnp.asarray(0.0))

    from presight_tpu.engine import train_step as ts_mod

    # (stop_prop_grad, ys-cap override): None = step_end strategy; 0 forces
    # the in-scan sorted-scatter fallback, covering both reductions.
    cases = [(False, None), (True, None), (False, 0)]
    for stop_prop, ys_cap in cases:
        dense = make_train_step(config, tx, stop_prop_grad=stop_prop,
                                donate=False, split_update=True,
                                microbatch_rays=16)
        prev_cap = ts_mod._TAPE_YS_MAX_BYTES
        if ys_cap is not None:
            ts_mod._TAPE_YS_MAX_BYTES = ys_cap
        try:
            taped = make_train_step(config, tx, stop_prop_grad=stop_prop,
                                    donate=False, split_update=True,
                                    microbatch_rays=16, tape_min_bytes=0)
            s_d, m_d = dense(init_train_state(params, tx), cameras, batch,
                             key, scalars)
            s_t, m_t = taped(init_train_state(params, tx), cameras, batch,
                             key, scalars)
        finally:
            ts_mod._TAPE_YS_MAX_BYTES = prev_cap
        for k in m_d:
            np.testing.assert_allclose(np.asarray(m_t[k]), np.asarray(m_d[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)
        leaves_d = jax.tree_util.tree_leaves_with_path(s_d.params)
        leaves_t = jax.tree_util.tree_leaves(s_t.params)
        for (path, ld), lt in zip(leaves_d, leaves_t):
            np.testing.assert_allclose(
                np.asarray(lt), np.asarray(ld), rtol=2e-5, atol=2e-6,
                err_msg=jax.tree_util.keystr(path))
