"""Parity against EXECUTED reference outputs.

The golden .npz files under tests/goldens/ were produced by running the
reference implementation's pure-torch code paths (tests/make_goldens.py):
hash-encoding fallback, spaced/PDF samplers, PreSight losses, and the
warmup-multistep LR schedule. These tests make the parity claims
independent of hand-transcribed formulas (VERDICT round-1 item 7).
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

GOLD = Path(__file__).parent / "goldens"


def test_hash_encoding_matches_executed_reference():
    g = np.load(GOLD / "hash_encoding.npz")
    L, min_res, max_res, log2, F = (int(v) for v in g["config"])
    from presight_tpu.ops.hash_encoding import HashEncodingConfig, hash_encode

    cfg = HashEncodingConfig(
        num_levels=L, min_res=min_res, max_res=max_res,
        log2_hashmap_size=log2, features_per_level=F, storage="corner",
    )
    table = jnp.asarray(g["table"])
    out = hash_encode(table, jnp.asarray(g["positions"]), cfg)
    np.testing.assert_allclose(np.asarray(out), g["output"], rtol=1e-5, atol=1e-6)


def test_spaced_and_pdf_samplers_match_executed_reference():
    g = np.load(GOLD / "samplers.npz")
    import jax

    from presight_tpu.ops.rays import RayBundle
    from presight_tpu.ops.samplers import SpacingSpec, pdf_sample, spaced_sample

    R = g["origins"].shape[0]
    bundle = RayBundle(
        origins=jnp.asarray(g["origins"]),
        directions=jnp.asarray(g["directions"]),
        nears=jnp.asarray(g["nears"]),
        fars=jnp.asarray(g["fars"]),
    )
    spec = SpacingSpec("piecewise_threshold", threshold=1.0)
    samples = spaced_sample(jax.random.PRNGKey(0), bundle, 24, spec,
                            stratified=False)
    np.testing.assert_allclose(np.asarray(samples.starts), g["init_starts"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(samples.ends), g["init_ends"],
                               rtol=1e-4, atol=1e-6)

    resampled = pdf_sample(
        jax.random.PRNGKey(0), bundle, samples, jnp.asarray(g["weights"]),
        12, spec, stratified=False,
    )
    np.testing.assert_allclose(np.asarray(resampled.starts), g["pdf_starts"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(resampled.ends), g["pdf_ends"],
                               rtol=1e-4, atol=1e-5)


def test_losses_match_executed_reference():
    g = np.load(GOLD / "losses.npz")
    from presight_tpu.ops import losses as L
    from presight_tpu.ops.stepfun import blur_stepfun

    los = L.line_of_sight_loss(
        jnp.asarray(g["weights"]), jnp.asarray(g["termination_depth"]),
        jnp.asarray(g["steps"]), jnp.asarray(g["sigma"]), None,
        float(g["upper"]),
    )
    np.testing.assert_allclose(float(los), float(g["line_of_sight"]), rtol=1e-5)

    exp = L.expected_depth_loss(
        jnp.asarray(g["termination_depth"]), jnp.asarray(g["pred_depth"]),
        float(g["upper"]),
    )
    np.testing.assert_allclose(float(exp), float(g["expected_depth_loss"]),
                               rtol=1e-5)

    sky = L.sky_loss(jnp.asarray(g["accumulation"]), jnp.asarray(g["sky_mask"]))
    np.testing.assert_allclose(float(sky), float(g["sky_loss"]), rtol=1e-5)

    sem = L.semantic_loss(jnp.asarray(g["sem_pred"]), jnp.asarray(g["sem_gt"]),
                          clip=True)
    np.testing.assert_allclose(float(sem), float(g["semantic_loss"]), rtol=1e-5)

    bx, by = blur_stepfun(jnp.asarray(g["blur_x"]), jnp.asarray(g["blur_y"]),
                          float(g["blur_r"]))
    np.testing.assert_allclose(np.asarray(bx), g["blur_out_x"], rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(by), g["blur_out_y"], rtol=1e-4,
                               atol=1e-5)


def test_lr_schedule_matches_executed_reference():
    g = np.load(GOLD / "lr_schedule.npz")
    from presight_tpu.engine.optimizers import (
        OptimizerGroupConfig, warmup_multistep_schedule,
    )

    sched = warmup_multistep_schedule(OptimizerGroupConfig(
        lr=float(g["lr"]), warmup_steps=int(g["warmup_steps"]),
        milestones=tuple(int(m) for m in g["milestones"]),
        gamma=float(g["gamma"]), max_steps=int(g["max_steps"]),
    ))
    ours = np.asarray([float(sched(i)) for i in range(int(g["max_steps"]))])
    np.testing.assert_allclose(ours, g["lrs"], rtol=1e-6)


def test_camera_rays_match_reference():
    """generate_rays vs the EXECUTED reference Cameras.generate_rays
    (cameras.py:320-958) across perspective / fisheye / equirectangular
    cameras, with OpenCV distortion on one camera of each projective type."""
    import jax.numpy as jnp
    from presight_tpu.data.cameras import CameraParams, generate_rays

    g = np.load(GOLD / "camera_rays.npz")
    C = g["c2w"].shape[0]
    cams = CameraParams(
        c2w=jnp.asarray(g["c2w"]),
        fx=jnp.full((C,), float(g["fx"])),
        fy=jnp.full((C,), float(g["fy"])),
        cx=jnp.full((C,), float(g["cx"])),
        cy=jnp.full((C,), float(g["cy"])),
        camera_type=jnp.asarray(g["ctype"]),
        distortion_params=jnp.asarray(g["dist"]),
    )
    ray_index = jnp.asarray(
        np.stack([g["cam"], g["rows"], g["cols"]], -1).astype(np.int32)
    )
    rb = generate_rays(cams, ray_index)
    np.testing.assert_allclose(np.asarray(rb.origins), g["origins"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.directions), g["directions"],
                               rtol=1e-4, atol=2e-5)


def test_undistort_newton_roundtrip():
    """Property: applying the OpenCV forward distortion model to the
    Newton-undistorted coords recovers the input (camera_utils.py:374-382
    forward model), across random moderate coefficient sets."""
    import jax.numpy as jnp
    from presight_tpu.data.cameras import _undistort_newton

    rng = np.random.RandomState(0)
    for trial in range(5):
        dist = (rng.rand(6) - 0.5) * np.array([0.2, 0.04, 0.01, 0.004, 0.01, 0.01])
        coords = (rng.rand(200, 2).astype(np.float32) - 0.5) * 0.8
        und = np.asarray(_undistort_newton(
            jnp.asarray(coords), jnp.asarray(np.tile(dist, (200, 1)), dtype=jnp.float32)))
        x, y = und[:, 0], und[:, 1]
        k1, k2, k3, k4, p1, p2 = dist
        r = x * x + y * y
        d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
        xd = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x)
        yd = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y)
        np.testing.assert_allclose(np.stack([xd, yd], -1), coords,
                                   atol=2e-5, rtol=1e-4)
