"""Unit tests for presight_tpu.ops.math against closed-form / torch-derived
golden values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from presight_tpu.ops import (
    contract_linf,
    contract_positions,
    masked_mean,
    normalize_aabb,
    sh_encoding,
    trunc_exp,
)


def test_trunc_exp_forward():
    x = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(trunc_exp(x), np.exp([-2.0, 0.0, 3.0]), rtol=1e-5)


def test_trunc_exp_backward_clamped():
    g = jax.grad(lambda x: trunc_exp(x))(jnp.array(20.0))
    # Clamped at exp(15), not exp(20).
    np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-5)
    g2 = jax.grad(lambda x: trunc_exp(x))(jnp.array(2.0))
    np.testing.assert_allclose(g2, np.exp(2.0), rtol=1e-5)


def test_contract_linf_inside_identity():
    x = jnp.array([[0.3, -0.5, 0.9]])
    np.testing.assert_allclose(contract_linf(x), x, rtol=1e-6)


def test_contract_linf_outside():
    x = jnp.array([[4.0, 0.0, 0.0]])
    out = contract_linf(x)
    # mag=4 -> (2 - 1/4) * x/4 = 1.75 * [1,0,0]
    np.testing.assert_allclose(out, [[1.75, 0.0, 0.0]], rtol=1e-6)
    # Always within [-2, 2]
    x = jax.random.normal(jax.random.PRNGKey(0), (100, 3)) * 50
    assert jnp.all(jnp.abs(contract_linf(x)) <= 2.0)


def test_normalize_aabb():
    aabb = jnp.array([[0.0, 0.0, 0.0], [2.0, 4.0, 8.0]])
    pos = jnp.array([[1.0, 2.0, 4.0]])
    np.testing.assert_allclose(normalize_aabb(pos, aabb), [[0.0, 0.0, 0.0]], atol=1e-6)
    np.testing.assert_allclose(
        normalize_aabb(jnp.array([[2.0, 4.0, 8.0]]), aabb), [[1.0, 1.0, 1.0]], atol=1e-6
    )


def test_contract_positions_selector():
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    # Center of AABB -> normalized 0 -> contracted 0 -> unit 0.5, selected.
    pos = jnp.zeros((1, 3))
    unit, sel = contract_positions(pos, aabb)
    np.testing.assert_allclose(unit, 0.5, atol=1e-6)
    assert bool(sel[0])
    # Extremely far point contracts to the boundary -> selector False, zeroed.
    far = jnp.full((1, 3), 1e12)
    unit, sel = contract_positions(far, aabb)
    assert not bool(sel[0])
    np.testing.assert_allclose(unit, 0.0, atol=1e-6)


def test_sh_encoding_against_torch_reference():
    """Golden check vs the closed-form polynomial (math.py:27-100)."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    d = rng.randn(32, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    ours = np.asarray(sh_encoding(jnp.asarray(d), levels=4))

    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    xx, yy, zz = x * x, y * y, z * z
    ref = np.zeros((32, 16), np.float32)
    ref[:, 0] = 0.28209479177387814
    ref[:, 1] = 0.4886025119029199 * y
    ref[:, 2] = 0.4886025119029199 * z
    ref[:, 3] = 0.4886025119029199 * x
    ref[:, 4] = 1.0925484305920792 * x * y
    ref[:, 5] = 1.0925484305920792 * y * z
    ref[:, 6] = 0.9461746957575601 * zz - 0.31539156525251999
    ref[:, 7] = 1.0925484305920792 * x * z
    ref[:, 8] = 0.5462742152960396 * (xx - yy)
    ref[:, 9] = 0.5900435899266435 * y * (3 * xx - yy)
    ref[:, 10] = 2.890611442640554 * x * y * z
    ref[:, 11] = 0.4570457994644658 * y * (5 * zz - 1)
    ref[:, 12] = 0.3731763325901154 * z * (5 * zz - 3)
    ref[:, 13] = 0.4570457994644658 * x * (5 * zz - 1)
    ref[:, 14] = 1.445305721320277 * z * (xx - yy)
    ref[:, 15] = 0.5900435899266435 * x * (xx - 3 * yy)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_masked_mean_matches_boolean_indexing():
    rng = np.random.RandomState(1)
    x = rng.randn(64).astype(np.float32)
    m = rng.rand(64) > 0.5
    expected = x[m].mean()
    np.testing.assert_allclose(masked_mean(jnp.asarray(x), jnp.asarray(m)), expected, rtol=1e-5)


def test_searchsorted_sort_fallback_matches_cube(monkeypatch):
    """The double-argsort rank fallback (taken only above the cube-size
    limit, i.e. multi-GB inputs in production) must agree with the
    compare-reduce fast path and numpy, including ties on both sides."""
    import presight_tpu.ops.math as M

    rng = np.random.RandomState(0)
    # Deliberate ties: quantized values in both arrays.
    a = np.sort(rng.randint(0, 12, (7, 20)).astype(np.float32), axis=-1)
    v = np.sort(rng.randint(0, 12, (7, 9)).astype(np.float32), axis=-1)

    for side in ("right", "left"):
        fast = np.asarray(M.searchsorted(jnp.asarray(a), jnp.asarray(v), side))
        monkeypatch.setattr(M, "_SEARCHSORTED_CUBE_LIMIT", 0)
        slow = np.asarray(M.searchsorted(jnp.asarray(a), jnp.asarray(v), side))
        monkeypatch.setattr(M, "_SEARCHSORTED_CUBE_LIMIT", 1 << 31)
        ref = np.stack([np.searchsorted(a[i], v[i], side=side)
                        for i in range(a.shape[0])])
        np.testing.assert_array_equal(fast, ref, err_msg=f"cube path, {side}")
        np.testing.assert_array_equal(slow, ref, err_msg=f"sort path, {side}")
