"""Cell-storage hash encoding tests: correctness vs a naive reference, and
equivalence of the blending math with the corner path."""

import jax
import jax.numpy as jnp
import numpy as np

from presight_tpu.ops.hash_encoding import (
    HashEncodingConfig,
    _CORNER_BITS,
    _hash_corners,
    hash_encode,
    init_hash_table,
)


def naive_cell_encode(table, positions, cfg):
    """Direct per-sample transcription of the cell layout."""
    L, T, F = cfg.num_levels, cfg.table_size, cfg.features_per_level
    scalings = cfg.scalings()
    out = np.zeros((len(positions), L, F), np.float64)
    tab = np.asarray(table)
    for n in range(len(positions)):
        for l in range(L):
            scaled = positions[n].astype(np.float64) * scalings[l]
            fl = np.floor(scaled).astype(np.int64)
            o = scaled - fl
            h = int(np.asarray(_hash_corners(jnp.asarray(fl[None].astype(np.int32)), T))[0])
            row = tab[h + l * T].reshape(8, F)
            acc = np.zeros(F)
            for c, bits in enumerate(np.asarray(_CORNER_BITS)):
                w = np.prod([o[a] if bits[a] else 1 - o[a] for a in range(3)])
                acc += row[c] * w
            out[n, l] = acc
    return out.reshape(len(positions), L * F)


def test_cell_encode_matches_naive():
    cfg = HashEncodingConfig(num_levels=3, min_res=4, max_res=32, log2_hashmap_size=9,
                             features_per_level=2, storage="cell")
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    assert table.shape == (3 * 512, 16)
    pos = np.random.RandomState(0).rand(12, 3).astype(np.float32)
    ours = np.asarray(hash_encode(table, jnp.asarray(pos), cfg))
    ref = naive_cell_encode(table, pos, cfg)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-7)


def test_cell_encode_experts_and_grads():
    cfg = HashEncodingConfig(num_levels=2, min_res=4, max_res=8, log2_hashmap_size=7,
                             features_per_level=2, storage="cell")
    t0 = init_hash_table(jax.random.PRNGKey(0), cfg)
    t1 = init_hash_table(jax.random.PRNGKey(1), cfg)
    stacked = jnp.concatenate([t0, t1], axis=0)
    pos = jnp.asarray(np.random.RandomState(2).rand(8, 3).astype(np.float32))
    out0 = hash_encode(stacked, pos, cfg, expert_ids=jnp.zeros(8, jnp.int32))
    np.testing.assert_allclose(out0, hash_encode(t0, pos, cfg), rtol=1e-6)

    g = jax.grad(lambda t: jnp.sum(hash_encode(t, pos, cfg)))(t0)
    assert np.isfinite(np.asarray(g)).all()
    # Trilerp weights sum to 1 per (sample, level), each feature channel
    # accumulates 1 -> total = samples * levels * F.
    np.testing.assert_allclose(float(jnp.sum(g)), 8 * 2 * 2, rtol=1e-4)


def test_cell_storage_trains():
    """Smoke train with hash_storage='cell' end to end."""
    from tests.test_train_smoke import make_batch, synthetic_scene, tiny_config
    import dataclasses

    from presight_tpu.engine import (
        OptimizerGroupConfig,
        StepScalars,
        TrainStepPair,
        init_train_state,
        make_optimizer,
    )
    from presight_tpu.models import init_model, param_groups

    config = dataclasses.replace(tiny_config(), hash_storage="cell")
    aabbs = np.array([[[-10, -10, -10], [10, 10, 10]]], np.float32)
    centroids = np.zeros((1, 3), np.float32)
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids, 4, 1)
    cameras = synthetic_scene()
    groups = {"proposal_networks": OptimizerGroupConfig(lr=1e-2, warmup_steps=10),
              "fields": OptimizerGroupConfig(lr=1e-2, warmup_steps=10)}
    tx = make_optimizer(groups, param_groups(params))
    state = init_train_state(params, tx)
    steps = TrainStepPair(config, tx)
    rng = np.random.RandomState(0)
    losses = []
    key = jax.random.PRNGKey(42)
    scalars = StepScalars(jnp.asarray(1.0), jnp.asarray(5.0), jnp.asarray(0.0))
    for step in range(20):
        batch = make_batch(cameras, 64, rng)
        key, sub = jax.random.split(key)
        state, metrics = steps(state, cameras, batch, sub, scalars, stop_prop_grad=False)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
