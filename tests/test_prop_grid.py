"""Cached-density-grid first proposal round (fields/prop_field.py
prop_grid_*): trilerp correctness, refresh fidelity against the source
field, and the training/extraction paths with the grid enabled."""

import numpy as np
import pytest


def _tiny_grid_config(prop_grid_res=8):
    from presight_tpu.models import NerfactoNuscMSConfig

    return NerfactoNuscMSConfig(
        hash_storage="shared", prop_shared_mlp=True, remat=False,
        log2_hashmap_size=8, num_levels=2, features_per_level=4,
        num_proposal_samples_per_ray=(12, 6), num_nerf_samples_per_ray=6,
        proposal_net_args_list=(
            dict(features_per_level=2, log2_hashmap_size=8, num_levels=2,
                 base_res=16, max_res=256),
            dict(features_per_level=2, log2_hashmap_size=8, num_levels=2,
                 base_res=16, max_res=512),
        ),
        prop_grid_res=prop_grid_res,
        near_plane=0.005, far_plane=50.0, piecewise_sampler_threshold=5.0,
    )


def _setup(config, num_experts=2, seed=0):
    import jax

    from presight_tpu.models import init_model

    rng = np.random.RandomState(seed)
    centroids = (rng.randn(num_experts, 3) * 2).astype(np.float32)
    aabbs = np.stack([np.stack([c - 5, c + 5]) for c in centroids]).astype(np.float32)
    params = init_model(jax.random.PRNGKey(seed), config, aabbs, centroids, 8, 2)
    return params, centroids, aabbs


def test_grid_trilerp_matches_field_on_corners():
    """At exact cell-corner coordinates the cached grid reproduces the
    source proposal field's density (selector interior)."""
    import jax.numpy as jnp

    from presight_tpu.fields.prop_field import prop_density, prop_grid_density
    from presight_tpu.models.nerfacto_ms import make_prop_grid

    config = _tiny_grid_config(prop_grid_res=8)
    params, centroids, aabbs = _setup(config)
    grid = make_prop_grid(params, config)
    assert grid.shape == (2 * 8 ** 3, 8)

    # Pick interior unit-cube corner coords for expert 0 and invert the
    # contraction analytically: unit u in (0.25, 0.75) <=> normalized in
    # (-1, 1) (identity region of contract_linf), world = aabb_min +
    # (norm + 1)/2 * extent.
    g = 8
    ijs = np.array([[3, 3, 3], [4, 4, 4], [3, 4, 5], [5, 5, 3], [4, 3, 4]],
                   np.int64)
    unit = ijs.astype(np.float64) / g  # in (0, 1)
    norm = unit * 4.0 - 2.0  # [-2,2] cube
    # stay in the uncontracted region
    sel = np.all(np.abs(norm) < 1.0, axis=-1)
    ijs, unit, norm = ijs[sel], unit[sel], norm[sel]
    assert len(ijs) >= 2
    lo, hi = aabbs[0, 0], aabbs[0, 1]
    world = lo + (norm + 1.0) / 2.0 * (hi - lo)
    # keep the points nearest to centroid 0 (routing)
    d0 = np.sum((world - centroids[0]) ** 2, -1)
    d1 = np.sum((world - centroids[1]) ** 2, -1)
    keep = d0 < d1
    world = world[keep]
    assert len(world) >= 1

    got = np.asarray(prop_grid_density(
        grid, jnp.asarray(centroids), jnp.asarray(aabbs),
        jnp.asarray(world, jnp.float32), 8,
    ))
    want = np.asarray(prop_density(
        params["props"][0], config.prop(1), jnp.asarray(world, jnp.float32)
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_grid_interpolates_between_corners():
    """Off-corner points give a positive blend bounded by the 8 corners."""
    import jax.numpy as jnp

    from presight_tpu.fields.prop_field import prop_grid_density
    from presight_tpu.models.nerfacto_ms import make_prop_grid

    config = _tiny_grid_config(prop_grid_res=8)
    params, centroids, aabbs = _setup(config)
    grid = np.asarray(make_prop_grid(params, config))

    # Cell (3,3,3) of expert 0, sample its center.
    g = 8
    unit = (np.array([3, 3, 3]) + 0.5) / g
    norm = unit * 4.0 - 2.0
    lo, hi = aabbs[0, 0], aabbs[0, 1]
    world = lo + (norm + 1.0) / 2.0 * (hi - lo)
    got = float(prop_grid_density(
        jnp.asarray(grid), jnp.asarray(centroids), jnp.asarray(aabbs),
        jnp.asarray(world[None], jnp.float32), g,
    )[0])
    cell_row = grid[(3 * g + 3) * g + 3]
    assert cell_row.min() - 1e-6 <= got <= cell_row.max() + 1e-6
    # center of cell = mean of the 8 corners under trilerp
    np.testing.assert_allclose(got, float(cell_row.mean()), rtol=1e-5)


def test_train_step_with_grid_runs_and_drops_round0_loss():
    import jax
    import jax.numpy as jnp

    from presight_tpu.data.cameras import CameraParams
    from presight_tpu.engine import (
        OptimizerGroupConfig, StepScalars, TrainStepPair, init_train_state,
        make_optimizer,
    )
    from presight_tpu.models import param_groups
    from presight_tpu.models.nerfacto_ms import (
        forward, make_prop_grid, prop_grid_refresh_due,
    )
    from presight_tpu.data.cameras import generate_rays

    config = _tiny_grid_config()
    params, centroids, aabbs = _setup(config)
    grid = make_prop_grid(params, config)

    assert len(params["props"]) == 1  # round 0 has no hash field

    rng = np.random.RandomState(0)
    num_cameras = 8
    c2w = np.tile(np.eye(3, 4, dtype=np.float32)[None], (num_cameras, 1, 1))
    cameras = CameraParams(
        c2w=jnp.asarray(c2w),
        fx=jnp.full((num_cameras,), 100.0), fy=jnp.full((num_cameras,), 100.0),
        cx=jnp.full((num_cameras,), 50.0), cy=jnp.full((num_cameras,), 50.0),
        video_ids=jnp.zeros((num_cameras,), jnp.int32),
    )
    R = 32
    batch = {
        "ray_index": jnp.asarray(np.stack([
            rng.randint(0, num_cameras, R), rng.randint(0, 100, R),
            rng.randint(0, 100, R)], -1).astype(np.int32)),
        "rgb": jnp.asarray(rng.rand(R, 3).astype(np.float32)),
        "sky": jnp.asarray((rng.rand(R) > 0.9).astype(np.float32)),
        "depth": jnp.asarray((rng.rand(R) * 40).astype(np.float32)),
        "features": jnp.asarray(rng.rand(R, 64).astype(np.float32)),
    }

    # forward: the loss lists hold only (fine prop, final) rounds.
    bundle = generate_rays(cameras, batch["ray_index"])
    out = forward(params, config, bundle, jax.random.PRNGKey(0),
                  jnp.asarray(1.0), train=True, stop_prop_grad=True,
                  prop_grid=grid)
    assert len(out["weights_list"]) == 2
    # Round 0 (the 12-sample grid round) is dropped; what remains is the
    # fine prop round (6 samples) and the final NeRF round (6 samples).
    assert out["weights_list"][0].shape == (R, 6)
    assert out["weights_list"][1].shape == (R, 6)

    groups = {"proposal_networks": OptimizerGroupConfig(),
              "fields": OptimizerGroupConfig()}
    tx = make_optimizer(groups, param_groups(params))
    state = init_train_state(params, tx)
    steps = TrainStepPair(config, tx, split_update=True, microbatch_rays=16)
    scalars = StepScalars(anneal=jnp.asarray(1.0), sigma=jnp.asarray(5.0),
                          los_mult=jnp.asarray(0.1))
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(4):
        key, sub = jax.random.split(key)
        if prop_grid_refresh_due(config, i):
            grid = make_prop_grid(state.params, config)
        state, metrics = steps(state, cameras, batch, sub, scalars,
                               stop_prop_grad=(i % 2 == 1), prop_grid=grid)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses)

    # Gradient flow: the fine prop field's table must receive gradients on
    # update steps (it is trained via the interlevel loss).
    import optax  # noqa: F401

    def loss_fn(p):
        b = generate_rays(cameras, batch["ray_index"])
        o = forward(p, config, b, jax.random.PRNGKey(2), jnp.asarray(1.0),
                    train=True, stop_prop_grad=False, prop_grid=grid)
        from presight_tpu.models.nerfacto_ms import compute_losses
        return sum(compute_losses(o, batch, config, jnp.asarray(5.0),
                                  jnp.asarray(0.1)).values())

    grads = jax.grad(loss_fn)(state.params)
    gnorm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree_util.tree_leaves(grads["props"])
    )
    assert gnorm > 0.0


def test_refresh_schedule():
    from presight_tpu.models.nerfacto_ms import prop_grid_refresh_due

    config = _tiny_grid_config()
    assert config.prop_grid_warmup_every == 16
    assert prop_grid_refresh_due(config, 0)
    assert prop_grid_refresh_due(config, 16)
    assert not prop_grid_refresh_due(config, 17)
    assert prop_grid_refresh_due(config, config.prop_grid_warmup_steps + 128 * 5)
    off = _tiny_grid_config(prop_grid_res=0)
    assert not prop_grid_refresh_due(off, 0)


def test_make_prop_grid_requires_fine_prop_field():
    """use_prop_grid with num_proposal_iterations == 1 has no fine prop
    field to derive the cached grid from — make_prop_grid must raise a
    clear ValueError, not IndexError."""
    import dataclasses

    import jax

    from presight_tpu.models import init_model
    from presight_tpu.models.nerfacto_ms import make_prop_grid

    config = dataclasses.replace(
        _tiny_grid_config(),
        num_proposal_iterations=1,
        num_proposal_samples_per_ray=(12,),
        proposal_net_args_list=(_tiny_grid_config().proposal_net_args_list[0],),
    )
    aabbs = np.array([[[-10, -10, -10], [10, 10, 10]]], np.float32)
    centroids = np.zeros((1, 3), np.float32)
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, 4, 1)
    assert params["props"] == []
    with pytest.raises(ValueError, match="fine proposal field"):
        make_prop_grid(params, config)


def test_grid_boundary_shell_uses_field_limit_not_out_of_domain_rows():
    """The grid's upper boundary face must carry the field's one-sided
    limit (lattice evaluated at 1 - 2^-12), NOT the value at exactly 1.0:
    under 'cell'/'shared' storage a coordinate of exactly 1.0 reads
    floor-corner slots of the out-of-domain cell at index res_level (hash
    content no training sample ever wrote), and prop_grid_density trilerps
    that across the whole outermost cell shell."""
    import jax.numpy as jnp

    from presight_tpu.fields.prop_field import refresh_prop_grid
    from presight_tpu.ops.hash_encoding import _CORNER_BITS, hash_encode
    from presight_tpu.ops.math import trunc_exp
    from presight_tpu.ops.mlp import apply_mlp

    config = _tiny_grid_config(prop_grid_res=4)
    params, centroids, aabbs = _setup(config)
    pp = params["props"][0]
    pcfg = config.prop(1)
    g = 4
    rows = np.asarray(refresh_prop_grid(pp, pcfg, g, 2)).reshape(
        2, g, g, g, 8)

    def field_at(pts):
        pts = jnp.asarray(pts, jnp.float32)
        eids = jnp.zeros((pts.shape[0],), jnp.int32)
        feats = hash_encode(pp["hash_table"], pts, pcfg.hash, expert_ids=eids)
        mlp = pp["mlp"] if pcfg.shared_mlp else [
            (w[0], b[0]) for w, b in pp["mlp"]]
        return np.asarray(trunc_exp(apply_mlp(mlp, feats)[..., 0]))

    # Corner (g, j, k) = ceil-x corner of cell (g-1, j, k): _CORNER_BITS
    # slot 5 is (1, 0, 0).
    assert list(_CORNER_BITS[5]) == [1, 0, 0]
    jks = [(0, 0), (1, 2), (3, 3)]
    stored = np.array([rows[0, g - 1, j, k, 5] for j, k in jks])
    clamped = field_at([[1.0 - 2.0 ** -12, j / g, k / g] for j, k in jks])
    exact = field_at([[1.0, j / g, k / g] for j, k in jks])
    np.testing.assert_allclose(stored, clamped, rtol=1e-5)
    # The out-of-domain row genuinely differs here, so the pin is meaningful.
    assert np.max(np.abs(clamped - exact)) > 0
