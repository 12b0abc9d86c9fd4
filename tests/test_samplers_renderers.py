"""Sampler + renderer + volume-weights tests vs torch-derived goldens
(spec: ray_samplers.py, renderers.py, rays.py:128-150)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from presight_tpu.ops import (
    RayBundle,
    SpacingSpec,
    get_weights,
    pdf_sample,
    proposal_sample,
    render_accumulation,
    render_depth_expected,
    render_depth_median,
    render_rgb,
    spaced_sample,
    spacing_to_euclidean,
)


def _bundle(num_rays=10, near=0.005, far=50.0, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(num_rays, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.asarray(rng.randn(num_rays, 3).astype(np.float32)),
        directions=jnp.asarray(d),
        nears=jnp.full((num_rays,), near, jnp.float32),
        fars=jnp.full((num_rays,), far, jnp.float32),
        camera_indices=jnp.zeros((num_rays,), jnp.int32),
        video_ids=jnp.zeros((num_rays,), jnp.int32),
    )


def test_get_weights_matches_torch_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    deltas = rng.rand(5, 16).astype(np.float32) * 0.1
    dens = rng.rand(5, 16).astype(np.float32) * 10

    ours = np.asarray(get_weights(jnp.asarray(deltas), jnp.asarray(dens)))

    dd = torch.tensor(deltas)[..., None] * torch.tensor(dens)[..., None]
    alphas = 1 - torch.exp(-dd)
    trans = torch.cumsum(dd[..., :-1, :], dim=-2)
    trans = torch.cat([torch.zeros((dd.shape[0], 1, 1)), trans], dim=-2)
    trans = torch.exp(-trans)
    ref = torch.nan_to_num(alphas * trans)[..., 0].numpy()
    # f32 cumsum accumulation order differs between XLA and torch.
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-6)


def test_weights_sum_below_one():
    rng = np.random.RandomState(1)
    w = get_weights(jnp.asarray(rng.rand(8, 32).astype(np.float32)),
                    jnp.asarray(rng.rand(8, 32).astype(np.float32) * 100))
    acc = np.asarray(render_accumulation(w))
    assert (acc <= 1.0 + 1e-5).all() and (acc >= 0.0).all()


def test_spacing_spec_roundtrip():
    spec = SpacingSpec("piecewise_threshold", threshold=5.0)
    t = jnp.asarray(np.linspace(0.01, 200.0, 100, dtype=np.float32))
    np.testing.assert_allclose(spec.fn_inv(spec.fn(t)), t, rtol=1e-4)
    # fn maps [0, inf) to [0, 1), monotone
    s = np.asarray(spec.fn(t))
    assert (np.diff(s) > 0).all() and s.min() >= 0 and s.max() < 1.0


def test_spaced_sampler_shapes_and_monotonicity():
    bundle = _bundle()
    spec = SpacingSpec("piecewise_threshold", threshold=5.0)
    rs = spaced_sample(jax.random.PRNGKey(0), bundle, 32, spec)
    assert rs.starts.shape == (10, 32)
    assert (np.asarray(rs.ends - rs.starts) > 0).all()
    assert (np.asarray(rs.starts[:, 1:] - rs.ends[:, :-1]) >= -1e-6).all()
    # Bins stay within [near, far]
    assert np.asarray(rs.starts).min() >= 0.005 - 1e-5
    assert np.asarray(rs.ends).max() <= 50.0 + 1e-3
    # spacing bins within [0, 1]
    assert np.asarray(rs.spacing_starts).min() >= 0.0
    assert np.asarray(rs.spacing_ends).max() <= 1.0 + 1e-6


def test_spaced_sampler_unstratified_deterministic():
    bundle = _bundle()
    spec = SpacingSpec("uniform")
    rs = spaced_sample(jax.random.PRNGKey(0), bundle, 8, spec, stratified=False)
    expected = np.linspace(0.005, 50.0, 9, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(rs.starts[0]), expected[:-1], rtol=1e-4)


def test_pdf_sampler_concentrates_samples():
    """Mass concentrated in one bin -> resampled bins concentrate there."""
    bundle = _bundle(num_rays=4, near=1.0, far=10.0)
    spec = SpacingSpec("uniform")
    rs = spaced_sample(jax.random.PRNGKey(0), bundle, 16, spec, stratified=False)
    w = np.zeros((4, 16), np.float32)
    w[:, 8] = 1.0  # all mass in bin 8
    out = pdf_sample(jax.random.PRNGKey(1), bundle, rs, jnp.asarray(w), 15, spec,
                     stratified=False)
    mids = np.asarray(out.steps())
    bin_lo = np.asarray(rs.starts)[0, 8]
    bin_hi = np.asarray(rs.ends)[0, 8]
    frac_inside = ((mids >= bin_lo - 0.6) & (mids <= bin_hi + 0.6)).mean()
    assert frac_inside > 0.8, (frac_inside, bin_lo, bin_hi, mids[0])


def test_proposal_sampler_end_to_end():
    bundle = _bundle(num_rays=6)
    spec = SpacingSpec("piecewise_threshold", threshold=5.0)

    def density_fn(p):
        return jnp.ones(p.shape[:-1], p.dtype) * 0.1

    rs, wl, rsl = proposal_sample(
        jax.random.PRNGKey(0), bundle, [density_fn, density_fn],
        num_proposal_samples=(32, 16), num_nerf_samples=8,
        spec=spec, anneal=jnp.asarray(1.0),
    )
    assert rs.starts.shape == (6, 8)
    assert len(wl) == 2 and len(rsl) == 2
    assert wl[0].shape == (6, 32) and wl[1].shape == (6, 16)
    assert np.isfinite(np.asarray(rs.starts)).all()


def test_renderers():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.rand(4, 8).astype(np.float32) * 0.1)
    rgb = jnp.asarray(rng.rand(4, 8, 3).astype(np.float32))
    out = np.asarray(render_rgb(rgb, w))
    np.testing.assert_allclose(out, np.sum(np.asarray(w)[..., None] * np.asarray(rgb), -2),
                               rtol=1e-6)

    bundle = _bundle(num_rays=4, near=1.0, far=10.0)
    rs = spaced_sample(jax.random.PRNGKey(0), bundle, 8, SpacingSpec("uniform"),
                       stratified=False)
    steps = np.asarray(rs.steps())
    # expected depth formula
    exp = np.asarray(render_depth_expected(w, rs))
    ref = (np.asarray(w) * steps).sum(-1) / (np.asarray(w).sum(-1) + 1e-10)
    ref = np.clip(ref, steps.min(), steps.max())
    np.testing.assert_allclose(exp, ref, rtol=1e-5)
    # median: all weight at sample 5 -> depth == steps[:, 5]
    w2 = np.zeros((4, 8), np.float32)
    w2[:, 5] = 1.0
    med = np.asarray(render_depth_median(jnp.asarray(w2), rs))
    np.testing.assert_allclose(med, steps[:, 5], rtol=1e-6)
