"""Multi-chip data-parallel test on the 8-device virtual CPU mesh: the full
train step jitted over a ("data",) mesh with the batch sharded on rays and
params replicated must match the single-device result."""

import numpy as np


def test_dryrun_multichip_8():
    import jax

    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_step_matches_unsharded():
    import jax
    import jax.numpy as jnp

    from presight_tpu.engine import (
        OptimizerGroupConfig,
        StepScalars,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from presight_tpu.models import init_model, param_groups
    from presight_tpu.parallel import make_mesh, replicate, shard_batch
    from tests.test_train_smoke import make_batch, synthetic_scene, tiny_config

    config = tiny_config()
    aabbs = np.array([[[-10, -10, -10], [10, 10, 10]]], np.float32)
    centroids = np.zeros((1, 3), np.float32)
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, 4, 1)
    cameras = synthetic_scene()
    rng = np.random.RandomState(0)
    batch = make_batch(cameras, 64, rng)

    groups = {"proposal_networks": OptimizerGroupConfig(), "fields": OptimizerGroupConfig()}
    tx = make_optimizer(groups, param_groups(params))
    step = make_train_step(config, tx, stop_prop_grad=False, donate=False)
    scalars = StepScalars(jnp.asarray(1.0), jnp.asarray(5.0), jnp.asarray(0.0))
    key = jax.random.PRNGKey(7)

    state1 = init_train_state(params, tx)
    state1, metrics1 = step(state1, cameras, batch, key, scalars)

    mesh = make_mesh(8)
    state2 = replicate(mesh, init_train_state(params, tx))
    cameras_r = replicate(mesh, cameras)
    batch_s = shard_batch(mesh, batch)
    state2, metrics2 = step(state2, cameras_r, batch_s, key, scalars)

    np.testing.assert_allclose(
        float(metrics1["total_loss"]), float(metrics2["total_loss"]), rtol=2e-4
    )
    # Parameters after one update agree (grad all-reduce == single-device grad).
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_zero_sharded_opt_state_matches():
    """ZeRO-1 moment sharding must not change the update."""
    import jax
    import jax.numpy as jnp

    from presight_tpu.engine import (
        OptimizerGroupConfig,
        StepScalars,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from presight_tpu.models import init_model, param_groups
    from presight_tpu.parallel import make_mesh, replicate, shard_batch, shard_train_state
    from tests.test_train_smoke import make_batch, synthetic_scene, tiny_config

    config = tiny_config()
    aabbs = np.array([[[-10, -10, -10], [10, 10, 10]]], np.float32)
    centroids = np.zeros((1, 3), np.float32)
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, 4, 1)
    cameras = synthetic_scene()
    batch = make_batch(cameras, 64, np.random.RandomState(0))

    groups = {"proposal_networks": OptimizerGroupConfig(), "fields": OptimizerGroupConfig()}
    tx = make_optimizer(groups, param_groups(params))
    step = make_train_step(config, tx, stop_prop_grad=False, donate=False,
                           split_update=True)
    scalars = StepScalars(jnp.asarray(1.0), jnp.asarray(5.0), jnp.asarray(0.0))
    key = jax.random.PRNGKey(7)

    state1 = init_train_state(params, tx)
    state1, _ = step(state1, cameras, batch, key, scalars)

    mesh = make_mesh(8)
    state2 = shard_train_state(mesh, init_train_state(params, tx))
    # min_size=0 so even tiny test tensors shard
    from presight_tpu.parallel import shard_opt_state

    state2 = state2._replace(opt_state=shard_opt_state(mesh, state2.opt_state,
                                                       min_size=0))
    cameras_r = replicate(mesh, cameras)
    batch_s = shard_batch(mesh, batch)
    state2, _ = step(state2, cameras_r, batch_s, key, scalars)

    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_taped_table_grads_under_mesh():
    """The sparse table-gradient scan must compile and match the
    single-device taped step when the batch is mesh-sharded: the bucketed
    scatter accumulators live inside the jitted grad program and XLA's
    sharding propagation must insert the cross-device reduction."""
    import jax
    import jax.numpy as jnp

    from presight_tpu.engine import (
        OptimizerGroupConfig,
        StepScalars,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from presight_tpu.models import init_model, param_groups
    from presight_tpu.parallel import make_mesh, replicate, shard_batch
    from tests.test_train_smoke import make_batch, synthetic_scene, tiny_config

    config = tiny_config(hash_storage="shared", remat=False)
    aabbs = np.array([[[-10, -10, -10], [10, 10, 10]]], np.float32)
    centroids = np.zeros((1, 3), np.float32)
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, 4, 1)
    cameras = synthetic_scene()
    rng = np.random.RandomState(0)
    batch = make_batch(cameras, 64, rng)

    groups = {"proposal_networks": OptimizerGroupConfig(),
              "fields": OptimizerGroupConfig()}
    tx = make_optimizer(groups, param_groups(params))
    step = make_train_step(config, tx, stop_prop_grad=False, donate=False,
                           split_update=True, microbatch_rays=16,
                           tape_min_bytes=0)
    scalars = StepScalars(jnp.asarray(1.0), jnp.asarray(5.0), jnp.asarray(0.0))
    key = jax.random.PRNGKey(7)

    state1 = init_train_state(params, tx)
    state1, metrics1 = step(state1, cameras, batch, key, scalars)

    mesh = make_mesh(8)
    state2 = replicate(mesh, init_train_state(params, tx))
    cameras_r = replicate(mesh, cameras)
    batch_s = shard_batch(mesh, batch)
    state2, metrics2 = step(state2, cameras_r, batch_s, key, scalars)

    np.testing.assert_allclose(
        float(metrics1["total_loss"]), float(metrics2["total_loss"]), rtol=2e-4
    )
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5)


def test_mesh_sharded_eval_and_extraction_match_single_device():
    """Eval image renders and extraction frames sharded over the 8-device
    mesh must equal the single-device results: ray chunks are
    embarrassingly parallel and params/cameras are replicated, so the only
    difference is WHERE each chunk shard executes."""
    import jax
    import jax.numpy as jnp

    from presight_tpu.engine.evaluator import ImageRenderer
    from presight_tpu.models import init_model
    from presight_tpu.parallel import make_mesh, replicate
    from presight_tpu.prior.extraction import extract_frame_points
    from tests.test_train_smoke import synthetic_scene, tiny_config

    config = tiny_config(hash_storage="shared")
    aabbs = np.array([[[-10, -10, -10], [10, 10, 10]]], np.float32)
    centroids = np.zeros((1, 3), np.float32)
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, 4, 1)
    cameras = synthetic_scene()
    H, W = 16, 24

    r1 = ImageRenderer(config, chunk=512)
    out1 = r1.render(params, cameras, 1, H, W)

    mesh = make_mesh(8)
    params_r = replicate(mesh, params)
    cameras_r = replicate(mesh, cameras)
    r8 = ImageRenderer(config, chunk=512, mesh=mesh)
    out8 = r8.render(params_r, cameras_r, 1, H, W)
    assert set(out1) == set(out8)
    for k in out1:
        np.testing.assert_array_equal(out8[k], out1[k], err_msg=k)

    rng = jax.random.PRNGKey(3)
    seg_valid = np.ones((H, W), bool)
    seg_valid[:, ::5] = False
    res1 = extract_frame_points(params, config, cameras, 2, H, W, seg_valid,
                                pose_scale_factor=0.2, rng=rng,
                                min_depth=0.0, max_depth=1e9)
    res8 = extract_frame_points(params_r, config, cameras_r, 2, H, W,
                                seg_valid, pose_scale_factor=0.2, rng=rng,
                                min_depth=0.0, max_depth=1e9, mesh=mesh)
    assert res1 is not None and res8 is not None
    for a, b, name in zip(res1, res8, ("points", "densities", "features")):
        np.testing.assert_array_equal(b, a, err_msg=name)
