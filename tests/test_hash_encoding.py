"""Hash-encoding parity vs an independent numpy transcription of the torch
fallback formulas (encodings.py:324-384), plus gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np

from presight_tpu.ops import HashEncodingConfig, hash_encode, init_hash_table

PRIMES = np.array([1, 2654435761, 805459861], dtype=np.int64)


def numpy_hash_encode(table, positions, cfg: HashEncodingConfig):
    """Direct int64 transcription of the reference torch fallback."""
    L, T, F = cfg.num_levels, cfg.table_size, cfg.features_per_level
    scalings = cfg.scalings().astype(np.float64)
    out = np.zeros((positions.shape[0], L, F), np.float64)
    for n in range(positions.shape[0]):
        for l in range(L):
            scaled = positions[n].astype(np.float64) * scalings[l]
            f = np.floor(scaled).astype(np.int64)
            c = np.ceil(scaled).astype(np.int64)
            o = scaled - f
            acc = np.zeros(F, np.float64)
            for bits in range(8):
                sel = [(bits >> a) & 1 for a in range(3)]
                corner = np.where(np.array(sel) == 1, c, f)
                h = (corner * PRIMES)
                idx = (h[0] ^ h[1] ^ h[2]) % T + l * T
                w = np.prod([o[a] if sel[a] else 1 - o[a] for a in range(3)])
                acc += table[idx] * w
            out[n, l] = acc
    return out.reshape(positions.shape[0], L * F)


def test_hash_encode_matches_reference_formula():
    cfg = HashEncodingConfig(num_levels=4, min_res=4, max_res=64, log2_hashmap_size=10,
                             features_per_level=2)
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, cfg)
    rng = np.random.RandomState(0)
    pos = rng.rand(16, 3).astype(np.float32)

    ours = np.asarray(hash_encode(table, jnp.asarray(pos), cfg))
    ref = numpy_hash_encode(np.asarray(table), pos, cfg)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-7)


def test_hash_encode_expert_offset():
    """Expert e must read only from its own slab of the stacked table."""
    cfg = HashEncodingConfig(num_levels=2, min_res=4, max_res=8, log2_hashmap_size=8,
                             features_per_level=2)
    key = jax.random.PRNGKey(1)
    t0 = init_hash_table(key, cfg)
    t1 = init_hash_table(jax.random.PRNGKey(2), cfg)
    stacked = jnp.concatenate([t0, t1], axis=0)
    pos = jnp.asarray(np.random.RandomState(3).rand(8, 3).astype(np.float32))

    out0 = hash_encode(stacked, pos, cfg, expert_ids=jnp.zeros(8, jnp.int32))
    out1 = hash_encode(stacked, pos, cfg, expert_ids=jnp.ones(8, jnp.int32))
    np.testing.assert_allclose(out0, hash_encode(t0, pos, cfg), rtol=1e-6)
    np.testing.assert_allclose(out1, hash_encode(t1, pos, cfg), rtol=1e-6)


def test_hash_encode_gradients_flow_to_table():
    cfg = HashEncodingConfig(num_levels=2, min_res=4, max_res=8, log2_hashmap_size=8,
                             features_per_level=2)
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    pos = jnp.asarray(np.random.RandomState(0).rand(4, 3).astype(np.float32))

    g = jax.grad(lambda t: jnp.sum(hash_encode(t, pos, cfg)))(table)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0.0
    # Sum of gradient entries = (samples x levels x features), since trilerp
    # weights sum to 1 per (sample, level) and each feature channel gets 1.
    np.testing.assert_allclose(
        float(jnp.sum(g)), 4 * cfg.num_levels * cfg.features_per_level, rtol=1e-4
    )


def test_hash_encode_positions_gradient():
    cfg = HashEncodingConfig(num_levels=2, min_res=4, max_res=8, log2_hashmap_size=8,
                             features_per_level=2)
    table = init_hash_table(jax.random.PRNGKey(0), cfg)
    pos = jnp.asarray(np.random.RandomState(0).rand(4, 3).astype(np.float32) * 0.8 + 0.1)
    g = jax.grad(lambda p: jnp.sum(hash_encode(table, p, cfg)))(pos)
    assert np.isfinite(np.asarray(g)).all()


def test_sorted_grad_gather_matches_plain(monkeypatch):
    """The big-table backward (argsort + indices_are_sorted scatter,
    _gather_rows_sorted_grad) must produce the same table gradient as XLA's
    default gather transpose — it may differ only by float summation order
    across duplicate indices. Forced on by zeroing the byte threshold; run
    across all three storage layouts, with expert routing and duplicate
    positions so collisions exercise the accumulate path."""
    from presight_tpu.ops import hash_encoding as he

    rng = np.random.RandomState(7)
    pos_np = rng.rand(64, 3).astype(np.float32)
    pos_np[32:] = pos_np[:32]  # duplicates -> colliding scatter indices
    pos = jnp.asarray(pos_np)
    eids = jnp.asarray(rng.randint(0, 2, 64).astype(np.int32))
    coeff = jnp.asarray(rng.rand(64, 8).astype(np.float32))

    for storage in ("shared", "cell", "corner"):
        cfg = HashEncodingConfig(
            num_levels=2, min_res=4, max_res=16, log2_hashmap_size=8,
            features_per_level=4, storage=storage)
        table = init_hash_table(jax.random.PRNGKey(0), cfg, num_experts=2)

        def loss(t):
            out = hash_encode(t, pos, cfg, expert_ids=eids)
            return jnp.sum(out * coeff)

        monkeypatch.setattr(he, "_SORTED_GRAD_MIN_BYTES", 1 << 60)
        g_plain = jax.grad(loss)(table)
        monkeypatch.setattr(he, "_SORTED_GRAD_MIN_BYTES", 0)
        g_sorted = jax.grad(loss)(table)

        for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_sorted)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
                err_msg=f"storage={storage}")
