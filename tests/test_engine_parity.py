"""Engine parity tests: LR schedule vs torch ChainedScheduler, proposal
update schedule bookkeeping, ray generation vs the reference camera math."""

import numpy as np
import pytest

from presight_tpu.engine.optimizers import OptimizerGroupConfig, warmup_multistep_schedule


def test_warmup_multistep_matches_torch():
    """vs torch ChainedScheduler([LinearLR(0.01, T), MultiStepLR(g=0.33)])
    (my_schedulers.py:50-70)."""
    torch = pytest.importorskip("torch")

    lr_init = 1e-2
    cfg = OptimizerGroupConfig(lr=lr_init, max_steps=1000, warmup_steps=100,
                               milestones=(250, 500, 750), gamma=0.33)
    sched = warmup_multistep_schedule(cfg)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr_init)
    tsched = torch.optim.lr_scheduler.ChainedScheduler([
        torch.optim.lr_scheduler.LinearLR(opt, start_factor=0.01, total_iters=100),
        torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[250, 500, 750], gamma=0.33),
    ])
    torch_lrs = []
    for _ in range(1000):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        tsched.step()

    ours = np.array([float(sched(s)) for s in range(1000)])
    np.testing.assert_allclose(ours, np.array(torch_lrs), rtol=1e-5)


def test_proposal_update_schedule():
    """ray_samplers.py:560-612: always updated for step<10; then updated
    whenever steps_since_update exceeds the interpolated schedule."""
    from presight_tpu.models import NerfactoNuscMSConfig, ProposalUpdateSchedule

    cfg = NerfactoNuscMSConfig(proposal_warmup=100, proposal_update_every=5)
    sched = ProposalUpdateSchedule(cfg)
    updates = []
    for step in range(300):
        u = sched.updated(step)
        updates.append(u)
        sched.step_cb(step, u)
    # warmup: every early step updates
    assert all(updates[:10])
    # late phase: roughly every proposal_update_every+1 steps
    late = updates[200:]
    gaps = np.diff(np.nonzero(late)[0])
    assert gaps.max() <= 6 and gaps.min() >= 5


def test_generate_rays_reference_formula():
    """cameras.py:612-616 + :741-746: camera dir = [(x-cx)/fx, -(y-cy)/fy, -1]
    rotated by c2w and normalized; pixel centers at +0.5."""
    import jax.numpy as jnp

    from presight_tpu.data.cameras import CameraParams, generate_rays

    rng = np.random.RandomState(0)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.randn(3).astype(np.float32)
    c2w = np.concatenate([q.astype(np.float32), t[:, None]], axis=-1)[None]
    fx, fy, cx, cy = 100.0, 110.0, 40.0, 30.0
    cameras = CameraParams(
        c2w=jnp.asarray(c2w),
        fx=jnp.asarray([fx]), fy=jnp.asarray([fy]),
        cx=jnp.asarray([cx]), cy=jnp.asarray([cy]),
        video_ids=jnp.asarray([0], jnp.int32),
    )
    row, col = 12, 34
    bundle = generate_rays(cameras, jnp.asarray([[0, row, col]], jnp.int32))

    x, y = col + 0.5, row + 0.5
    dir_cam = np.array([(x - cx) / fx, -(y - cy) / fy, -1.0])
    dir_world = q @ dir_cam
    dir_world /= np.linalg.norm(dir_world)
    np.testing.assert_allclose(np.asarray(bundle.directions)[0], dir_world, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bundle.origins)[0], t, rtol=1e-5)


def test_camera_deltas_identity_and_rotation():
    import jax.numpy as jnp

    from presight_tpu.data.cameras import CameraParams, apply_camera_deltas

    c2w = jnp.asarray(np.tile(np.eye(3, 4, dtype=np.float32)[None], (2, 1, 1)))
    cams = CameraParams(c2w=c2w, fx=jnp.ones(2), fy=jnp.ones(2),
                        cx=jnp.zeros(2), cy=jnp.zeros(2))
    # zero delta -> identity
    out = apply_camera_deltas(cams, jnp.zeros((2, 6)))
    np.testing.assert_allclose(np.asarray(out.c2w), np.asarray(c2w), atol=1e-6)
    # pure translation
    d = jnp.asarray([[1.0, 2.0, 3.0, 0, 0, 0], [0, 0, 0, 0, 0, 0]])
    out = apply_camera_deltas(cams, d)
    np.testing.assert_allclose(np.asarray(out.c2w[0, :, 3]), [1, 2, 3], atol=1e-6)
    # 90-degree rotation about z
    d = jnp.asarray([[0, 0, 0, 0, 0, np.pi / 2]] * 2, jnp.float32)
    out = apply_camera_deltas(cams, d)
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(np.asarray(out.c2w[0, :3, :3]), expect, atol=1e-6)


def test_camera_optimizer_so3xr3_receives_gradients():
    """S14: the optional SO3xR3 pose refinement path — camera deltas get
    nonzero gradients through ray generation and move on an update
    (camera_optimizers.py SO3xR3 semantics; off by default in PreSight)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from presight_tpu.data.cameras import (
        CameraParams, apply_camera_deltas, exp_map_so3xr3, generate_rays,
    )

    rng = np.random.RandomState(0)
    C = 4
    c2w = np.tile(np.eye(3, 4, dtype=np.float32)[None], (C, 1, 1))
    c2w[:, :3, 3] = rng.randn(C, 3)
    cams = CameraParams(
        c2w=jnp.asarray(c2w),
        fx=jnp.full((C,), 50.0), fy=jnp.full((C,), 50.0),
        cx=jnp.full((C,), 32.0), cy=jnp.full((C,), 16.0),
    )
    ray_index = jnp.asarray(np.stack([
        rng.randint(0, C, 64), rng.randint(0, 32, 64), rng.randint(0, 64, 64),
    ], -1).astype(np.int32))
    target = jnp.asarray(rng.rand(64, 3).astype(np.float32))

    def loss(deltas):
        rb = generate_rays(apply_camera_deltas(cams, deltas), ray_index)
        return jnp.sum((rb.directions - target) ** 2) + jnp.sum(rb.origins ** 2)

    deltas = jnp.zeros((C, 6))
    g = jax.grad(loss)(deltas)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0  # both rho and omega get gradients
    assert float(jnp.abs(g[:, 3:]).max()) > 0  # rotation part too

    # identity deltas are exactly the identity transform
    adj = exp_map_so3xr3(jnp.zeros((C, 6)))
    np.testing.assert_allclose(np.asarray(adj[:, :3, :3]),
                               np.tile(np.eye(3, dtype=np.float32), (C, 1, 1)),
                               atol=1e-7)
    # a pure-translation delta shifts origins by exactly rho
    d = jnp.zeros((C, 6)).at[:, :3].set(1.5)
    shifted = apply_camera_deltas(cams, d)
    np.testing.assert_allclose(np.asarray(shifted.c2w[:, :3, 3]),
                               c2w[:, :3, 3] + 1.5, rtol=1e-6)
