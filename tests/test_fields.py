"""Router + stacked field tests: grouped dispatch must match dense
per-expert evaluation, and the full model forward must be finite and
differentiable."""

import jax
import jax.numpy as jnp
import numpy as np

from presight_tpu.fields import (
    INGPFieldConfig,
    PropFieldConfig,
    assign_experts,
    build_routing,
    density_and_embedding_sorted,
    init_ingp_field,
    init_prop_field,
    prop_density,
    rgb_sorted,
    route_positions,
)
from presight_tpu.ops.mlp import (
    apply_mlp,
    apply_mlp_dense_experts,
    apply_mlp_grouped,
    init_mlp,
)


def test_assign_experts_nearest_centroid():
    centroids = jnp.asarray([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
    pos = jnp.asarray([[1.0, 0.0, 0.0], [9.0, 0.0, 0.0], [4.9, 0.0, 0.0], [5.1, 0.0, 0.0]])
    ids = np.asarray(assign_experts(pos, centroids))
    np.testing.assert_array_equal(ids, [0, 1, 0, 1])


def test_routing_roundtrip():
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 4, size=100).astype(np.int32))
    r = build_routing(ids, 4)
    x = jnp.asarray(rng.randn(100, 3).astype(np.float32))
    x_sorted = x[r.order]
    np.testing.assert_array_equal(np.asarray(x_sorted[r.inverse]), np.asarray(x))
    assert int(r.group_sizes.sum()) == 100
    # sorted ids are non-decreasing
    assert (np.diff(np.asarray(r.expert_ids_sorted)) >= 0).all()


def test_grouped_mlp_matches_dense():
    rng = np.random.RandomState(1)
    E, N = 4, 64
    params = init_mlp(jax.random.PRNGKey(0), in_dim=8, num_layers=3, layer_width=32,
                      out_dim=5, num_experts=E)
    x = jnp.asarray(rng.randn(N, 8).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, E, N).astype(np.int32))
    r = build_routing(ids, E)

    dense = apply_mlp_dense_experts(params, x, ids, E)
    grouped = apply_mlp_grouped(params, x[r.order], r.group_sizes)
    grouped_unsorted = grouped[r.inverse]
    np.testing.assert_allclose(np.asarray(grouped_unsorted), np.asarray(dense),
                               rtol=2e-4, atol=1e-5)


def test_grouped_mlp_matches_single_expert():
    params = init_mlp(jax.random.PRNGKey(0), in_dim=8, num_layers=2, layer_width=16,
                      out_dim=4, num_experts=1)
    single = [(w[0], b[0]) for w, b in params]
    x = jnp.asarray(np.random.RandomState(2).randn(32, 8).astype(np.float32))
    r = build_routing(jnp.zeros(32, jnp.int32), 1)
    grouped = apply_mlp_grouped(params, x, r.group_sizes)
    plain = apply_mlp(single, x)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(plain), rtol=2e-4, atol=1e-5)


def _small_field_cfg():
    return INGPFieldConfig(num_levels=4, base_res=4, max_res=64, log2_hashmap_size=10,
                           features_per_level=2, hidden_dim=16, hidden_dim_color=16,
                           appearance_embedding_dim=4, semantic_dim=8,
                           hidden_dim_semantic_head=16)


def _aabbs_centroids(E=2):
    centroids = np.stack([np.array([20.0 * i, 0, 0], np.float32) for i in range(E)])
    aabbs = np.stack([
        np.stack([c - 10.0, c + 10.0]) for c in centroids
    ]).astype(np.float32)
    return jnp.asarray(aabbs), jnp.asarray(centroids)


def test_ingp_field_forward_finite_and_expert_isolated():
    cfg = _small_field_cfg()
    aabbs, centroids = _aabbs_centroids(2)
    params = init_ingp_field(jax.random.PRNGKey(0), cfg, 2, aabbs, centroids)

    rng = np.random.RandomState(0)
    pos = np.concatenate([
        rng.randn(16, 3).astype(np.float32) * 3,          # near expert 0
        rng.randn(16, 3).astype(np.float32) * 3 + [20, 0, 0],  # near expert 1
    ])
    routing = route_positions(jnp.asarray(pos), centroids)
    density, geo, sem = density_and_embedding_sorted(
        params, cfg, jnp.asarray(pos)[routing.order], routing)
    assert np.isfinite(np.asarray(density)).all()
    assert density.shape == (32,)
    assert geo.shape == (32, cfg.geo_feat_dim)
    assert sem.shape == (32, cfg.semantic_dim)

    d = rng.randn(32, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    app = rng.randn(32, 4).astype(np.float32)
    rgb = rgb_sorted(params, cfg, jnp.asarray(d)[routing.order], geo,
                     jnp.asarray(app)[routing.order], routing)
    rgb = np.asarray(rgb)
    assert (rgb >= 0).all() and (rgb <= 1).all()

    # Perturbing expert 1's hash slab must not change expert-0 samples.
    T = cfg.hash.table_size * cfg.num_levels
    table2 = params["hash_table"].at[T:].add(1.0)
    params2 = dict(params, hash_table=table2)
    d2, _, _ = density_and_embedding_sorted(
        params2, cfg, jnp.asarray(pos)[routing.order], routing)
    ids_sorted = np.asarray(routing.expert_ids_sorted)
    np.testing.assert_allclose(np.asarray(d2)[ids_sorted == 0],
                               np.asarray(density)[ids_sorted == 0], rtol=1e-6)
    assert not np.allclose(np.asarray(d2)[ids_sorted == 1],
                           np.asarray(density)[ids_sorted == 1])


def test_prop_field_density():
    cfg = PropFieldConfig(num_levels=4, base_res=4, max_res=32, log2_hashmap_size=10,
                          features_per_level=1, hidden_dim=16)
    aabbs, centroids = _aabbs_centroids(2)
    params = init_prop_field(jax.random.PRNGKey(0), cfg, 2, aabbs, centroids)
    pos = jnp.asarray(np.random.RandomState(0).randn(4, 8, 3).astype(np.float32) * 5)
    dens = prop_density(params, cfg, pos)
    assert dens.shape == (4, 8)
    assert np.isfinite(np.asarray(dens)).all()
    assert (np.asarray(dens) >= 0).all()

    # Differentiable w.r.t. the hash table.
    g = jax.grad(lambda t: jnp.sum(prop_density(dict(params, hash_table=t), cfg, pos)))(
        params["hash_table"])
    assert np.isfinite(np.asarray(g)).all()


def test_padded_routing_matches_sorted_path():
    """PaddedRouting (sort fused with block padding) must reproduce the
    sorted-dispatch path exactly: same rows land in the same grouped-matmul
    blocks, so density/geo/sem/rgb are bitwise-identical after unpadding."""
    from presight_tpu.fields import (
        density_and_embedding_padded, pad_rows, rgb_padded,
        route_positions_padded, semantics_padded, unpad_rows,
    )
    from presight_tpu.fields.ingp_field import semantics_sorted
    from presight_tpu.ops.permute import sort_rows, unsort_rows

    cfg = _small_field_cfg()
    aabbs, centroids = _aabbs_centroids(2)
    params = init_ingp_field(jax.random.PRNGKey(0), cfg, 2, aabbs, centroids)

    rng = np.random.RandomState(1)
    pos = jnp.asarray(np.concatenate([
        rng.randn(24, 3).astype(np.float32) * 3,
        rng.randn(8, 3).astype(np.float32) * 3 + [20, 0, 0],
    ]))
    d = rng.randn(32, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    app = jnp.asarray(rng.randn(32, 4).astype(np.float32))

    # Sorted path
    routing = route_positions(pos, centroids)
    den_s, geo_s, sem_s = density_and_embedding_sorted(
        params, cfg, pos[routing.order], routing)
    rgb_s = rgb_sorted(params, cfg, d[routing.order], geo_s,
                       app[routing.order], routing)
    semh_s = semantics_sorted(params, cfg, sem_s, routing)

    # Padded path (block=8 to exercise multi-block experts)
    pr = route_positions_padded(pos, centroids, block=8)
    den_p, geo_p, sem_p = density_and_embedding_padded(
        params, cfg, pad_rows(pos, pr), pr)
    rgb_p = rgb_padded(params, cfg, d[pr.to_slot], geo_p, app[pr.to_slot], pr)
    semh_p = semantics_padded(params, cfg, sem_p, pr)

    unsort = lambda x: np.asarray(unsort_rows(x, routing.order, routing.inverse))
    unpad = lambda x: np.asarray(unpad_rows(x, pr))
    # 1-ulp tolerance: the two paths tile the grouped einsum with different
    # block sizes here (512 vs 8), which reorders MXU accumulation.
    close = lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-7, atol=1e-7)
    close(unpad(den_p), unsort(den_s))
    close(unpad(rgb_p), unsort(rgb_s))
    close(unpad(semh_p), unsort(semh_s))

    # Gradients flow through pad/unpad as dual gathers: check against the
    # sorted path on a scalar readout.
    def f_pad(p):
        pr2 = route_positions_padded(pos, p["centroids"], 8)
        dn, _, _ = density_and_embedding_padded(p, cfg, pad_rows(pos, pr2), pr2)
        return jnp.sum(unpad_rows(dn, pr2) ** 2)

    def f_sort(p):
        r2 = route_positions(pos, p["centroids"])
        dn, _, _ = density_and_embedding_sorted(
            p, cfg, sort_rows(pos, r2.order, r2.inverse), r2)
        return jnp.sum(unsort_rows(dn, r2.order, r2.inverse) ** 2)

    g_pad = jax.grad(f_pad)(params)["hash_table"]
    g_sort = jax.grad(f_sort)(params)["hash_table"]
    np.testing.assert_allclose(np.asarray(g_pad), np.asarray(g_sort),
                               rtol=1e-6, atol=1e-8)


def test_padded_routing_roundtrip_properties():
    """PaddedRouting invariants under adversarial expert distributions:
    empty experts, all-one-expert, uneven splits. pad->unpad must be the
    identity, valid slots must partition the rows, and each block must be
    expert-pure."""
    from presight_tpu.fields import build_padded_routing, pad_rows, unpad_rows

    rng = np.random.RandomState(0)
    cases = [
        np.zeros(40, np.int32),                    # all one expert
        np.full(40, 3, np.int32),                  # all the LAST expert
        rng.randint(0, 4, 64).astype(np.int32),    # mixed
        np.repeat(np.arange(4, dtype=np.int32), 16),  # sorted already
        np.array([2] * 63 + [0], np.int32),        # heavily skewed
    ]
    for ids in cases:
        E, block = 4, 8
        pr = build_padded_routing(jnp.asarray(ids), E, block)
        x = jnp.asarray(rng.randn(len(ids), 5).astype(np.float32))
        xp = pad_rows(x, pr)
        # roundtrip identity
        np.testing.assert_array_equal(np.asarray(unpad_rows(xp, pr)), np.asarray(x))
        # valid slots count == N and are a permutation of the rows
        valid = np.asarray(pr.slot_valid)
        assert valid.sum() == len(ids)
        np.testing.assert_array_equal(
            np.sort(np.asarray(pr.to_slot)[valid]), np.arange(len(ids)))
        # every valid slot's expert matches its row's expert
        eos = np.asarray(pr.expert_of_slot)
        np.testing.assert_array_equal(
            eos[valid], ids[np.asarray(pr.to_slot)[valid]])
        # blocks are expert-pure by construction (expert_of_slot constant
        # within each block)
        assert (eos.reshape(-1, block) == eos.reshape(-1, block)[:, :1]).all()
