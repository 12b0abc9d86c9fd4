"""Step-function and supervision-loss parity vs direct torch transcriptions
of the reference formulas (losses.py + PreSight/losses.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from presight_tpu.ops import (
    RayBundle,
    SpacingSpec,
    blur_stepfun,
    distortion_loss,
    get_weights,
    interlevel_loss,
    lossfun_outer,
    sorted_interp_quad,
    spaced_sample,
    z_anti_aliasing_interlevel_loss,
)
from presight_tpu.ops import losses as L

torch = pytest.importorskip("torch")


def _torch_blur_stepfun(x, y, r):
    xr, xr_idx = torch.sort(torch.cat([x - r, x + r], dim=-1))
    y1 = (
        torch.cat([y, torch.zeros_like(y[..., :1])], dim=-1)
        - torch.cat([torch.zeros_like(y[..., :1]), y], dim=-1)
    ) / (2 * r)
    y2 = torch.cat([y1, -y1], dim=-1).take_along_dim(xr_idx[..., :-1], dim=-1)
    yr = torch.cumsum(
        (xr[..., 1:] - xr[..., :-1]) * torch.cumsum(y2, dim=-1), dim=-1
    ).clamp_min(0)
    yr = torch.cat([torch.zeros_like(yr[..., :1]), yr], dim=-1)
    return xr, yr


def _torch_sorted_interp_quad(x, xp, fpdf, fcdf):
    mask = x[..., None, :] >= xp[..., :, None]

    def find_interval(x_, return_idx=False):
        x0, x0_idx = torch.max(torch.where(mask, x_[..., None], x_[..., :1, None]), -2)
        x1, x1_idx = torch.min(torch.where(~mask, x_[..., None], x_[..., -1:, None]), -2)
        if return_idx:
            return x0, x1, x0_idx, x1_idx
        return x0, x1

    fcdf0, fcdf1, fcdf0_idx, fcdf1_idx = find_interval(fcdf, return_idx=True)
    fpdf0 = fpdf.take_along_dim(fcdf0_idx, dim=-1)
    fpdf1 = fpdf.take_along_dim(fcdf1_idx, dim=-1)
    xp0, xp1 = find_interval(xp)
    offset = torch.clip(torch.nan_to_num((x - xp0) / (xp1 - xp0), 0), 0, 1)
    return fcdf0 + (x - xp0) * (fpdf0 + fpdf1 * offset + fpdf0 * (1 - offset)) / 2


def _sorted_bins(rng, R, N):
    x = np.sort(rng.rand(R, N + 1).astype(np.float32), axis=-1)
    # strictly increasing
    x += np.arange(N + 1, dtype=np.float32) * 1e-3
    return x


def test_blur_stepfun_parity():
    rng = np.random.RandomState(0)
    x = _sorted_bins(rng, 3, 16)
    y = rng.rand(3, 16).astype(np.float32)
    xr_t, yr_t = _torch_blur_stepfun(torch.tensor(x), torch.tensor(y), 0.03)
    xr_j, yr_j = blur_stepfun(jnp.asarray(x), jnp.asarray(y), 0.03)
    np.testing.assert_allclose(np.asarray(xr_j), xr_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yr_j), yr_t.numpy(), rtol=1e-4, atol=1e-5)


def test_sorted_interp_quad_parity():
    """Queries are kept inside the knot span, as in the real loss (the
    blurred knots xp always cover the [0,1] spacing bins being queried).
    Outside the span the torch emulation has an argmin-over-fill quirk
    (fpdf1 <- fpdf[0]) that the searchsorted formulation — and the original
    zip-NeRF jax code — does not reproduce; that case is unreachable from
    z_anti_aliasing_interlevel_loss."""
    rng = np.random.RandomState(1)
    xp = _sorted_bins(rng, 3, 12)
    fpdf = rng.rand(3, 13).astype(np.float32)
    area = 0.5 * (fpdf[..., 1:] + fpdf[..., :-1]) * np.diff(xp, axis=-1)
    fcdf = np.concatenate([np.zeros((3, 1), np.float32), np.cumsum(area, -1)], -1)
    lo = xp[:, :1] + 1e-4
    hi = xp[:, -1:] - 1e-4
    x = lo + (_sorted_bins(rng, 3, 8) / _sorted_bins(rng, 3, 8).max()) * (hi - lo) * 0.98
    x = np.sort(x.astype(np.float32), axis=-1)

    ref = _torch_sorted_interp_quad(
        torch.tensor(x), torch.tensor(xp), torch.tensor(fpdf), torch.tensor(fcdf)
    ).numpy()
    ours = np.asarray(sorted_interp_quad(jnp.asarray(x), jnp.asarray(xp),
                                         jnp.asarray(fpdf), jnp.asarray(fcdf)))
    # f32 boundary rounding (offset at knot edges) differs slightly from the
    # torch mask emulation.
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=1e-3)


def test_lossfun_outer_parity():
    """vs losses.py:48-97 transcription."""
    rng = np.random.RandomState(2)
    t = _sorted_bins(rng, 4, 8)
    w = rng.rand(4, 8).astype(np.float32)
    t_env = _sorted_bins(rng, 4, 16)
    w_env = rng.rand(4, 16).astype(np.float32)

    tt, tw = torch.tensor(t), torch.tensor(w)
    te, we = torch.tensor(t_env), torch.tensor(w_env)
    cy1 = torch.cat([torch.zeros_like(we[..., :1]), torch.cumsum(we, dim=-1)], dim=-1)
    idx_lo = torch.searchsorted(te[..., :-1].contiguous(), tt[..., :-1].contiguous(),
                                side="right") - 1
    idx_lo = torch.clamp(idx_lo, min=0, max=we.shape[-1] - 1)
    idx_hi = torch.searchsorted(te[..., 1:].contiguous(), tt[..., 1:].contiguous(),
                                side="right")
    idx_hi = torch.clamp(idx_hi, min=0, max=we.shape[-1] - 1)
    cy1_lo = torch.take_along_dim(cy1[..., :-1], idx_lo, dim=-1)
    cy1_hi = torch.take_along_dim(cy1[..., 1:], idx_hi, dim=-1)
    w_outer = cy1_hi - cy1_lo
    ref = (torch.clip(tw - w_outer, min=0) ** 2 / (tw + 1e-7)).numpy()

    ours = np.asarray(lossfun_outer(jnp.asarray(t), jnp.asarray(w),
                                    jnp.asarray(t_env), jnp.asarray(w_env)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def _make_rounds(seed=3):
    """Build realistic weights/ray_samples rounds via the actual samplers."""
    rng = np.random.RandomState(seed)
    d = rng.randn(6, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    bundle = RayBundle(
        origins=jnp.asarray(rng.randn(6, 3).astype(np.float32)),
        directions=jnp.asarray(d),
        nears=jnp.full((6,), 0.05, jnp.float32),
        fars=jnp.full((6,), 50.0, jnp.float32),
    )
    spec = SpacingSpec("piecewise_threshold", threshold=5.0)
    rs1 = spaced_sample(jax.random.PRNGKey(0), bundle, 32, spec)
    w1 = get_weights(rs1.deltas(), jnp.asarray(rng.rand(6, 32).astype(np.float32)))
    rs2 = spaced_sample(jax.random.PRNGKey(1), bundle, 16, spec)
    w2 = get_weights(rs2.deltas(), jnp.asarray(rng.rand(6, 16).astype(np.float32)))
    return [w1, w2], [rs1, rs2]


def test_distortion_loss_finite_and_positive():
    wl, rsl = _make_rounds()
    val = float(distortion_loss(wl, rsl))
    assert np.isfinite(val) and val >= 0


def test_interlevel_losses_finite():
    wl, rsl = _make_rounds()
    assert np.isfinite(float(interlevel_loss(wl, rsl)))
    val = float(z_anti_aliasing_interlevel_loss(wl, rsl, pulse_width=(0.03,)))
    assert np.isfinite(val) and val >= 0


def test_line_of_sight_loss_parity():
    """vs PreSight/losses.py:28-65 transcription."""
    rng = np.random.RandomState(4)
    R, S = 16, 24
    weights = rng.rand(R, S).astype(np.float32) * 0.1
    steps = np.sort(rng.rand(R, S).astype(np.float32) * 60, axis=-1)
    term = (rng.rand(R).astype(np.float32) * 80)
    sigma = 5.0
    sky = (rng.rand(R) > 0.7).astype(np.float32)

    ours = float(L.line_of_sight_loss(
        jnp.asarray(weights), jnp.asarray(term), jnp.asarray(steps),
        jnp.asarray(sigma), jnp.asarray(sky), upper_bound=75.0))

    tw = torch.tensor(weights)[..., None]
    ts = torch.tensor(steps)[..., None]
    tt = torch.tensor(term)[:, None]
    tsky = torch.tensor(sky)[:, None]
    depth_mask = (tt > 1.0) & (tt < 75.0) & (tsky == 0.0)
    td = tt[:, None]
    dist = torch.distributions.normal.Normal(0.0, sigma / 3.0)
    near_mask = torch.logical_and(ts <= td + sigma, ts >= td - sigma)
    near = (tw - torch.exp(dist.log_prob(ts - td))) ** 2
    near = (near_mask * near).sum(-2)
    empty_mask = ts < td - sigma
    empty = (empty_mask * tw ** 2).sum(-2)
    ref = float(torch.mean((near + empty)[depth_mask]))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_depth_and_sky_and_semantic_losses():
    rng = np.random.RandomState(5)
    term = rng.rand(32).astype(np.float32) * 100
    pred = rng.rand(32).astype(np.float32) * 100
    mask = (term > 1.0) & (term < 75.0)
    ref = np.mean(
        (np.clip(term[mask] / 75.0, 0, 1) - np.clip(pred[mask] / 75.0, 0, 1)) ** 2
    )
    np.testing.assert_allclose(
        float(L.expected_depth_loss(jnp.asarray(term), jnp.asarray(pred), 75.0)),
        ref, rtol=1e-4)

    acc = rng.rand(32).astype(np.float32)
    sky = (rng.rand(32) > 0.5).astype(np.float32)
    target = 1.0 - sky
    acc_c = np.clip(acc, 1e-7, 1 - 1e-7)
    ref = np.mean(-(target * np.log(acc_c) + (1 - target) * np.log(1 - acc_c)))
    np.testing.assert_allclose(float(L.sky_loss(jnp.asarray(acc), jnp.asarray(sky))),
                               ref, rtol=1e-4)

    p = rng.rand(32, 64).astype(np.float32)
    t = rng.rand(32, 64).astype(np.float32) * 1.5
    ref = np.mean((p - np.clip(t, 0, 1)) ** 2)
    np.testing.assert_allclose(float(L.semantic_loss(jnp.asarray(p), jnp.asarray(t))),
                               ref, rtol=1e-5)
