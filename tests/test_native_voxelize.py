"""Native voxelizer parity tests: the C++ kernels must match the numpy
reference implementations exactly."""

import numpy as np
import pytest

from presight_tpu import native
from presight_tpu.prior.voxelize import voxel_downsample


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_voxel_accumulator_matches_numpy():
    rng = np.random.RandomState(0)
    points = rng.randn(5000, 3) * 10
    colors = rng.rand(5000, 3).astype(np.float32)
    feats = rng.rand(5000, 16).astype(np.float32)
    min_bound = points.min(axis=0) - 1.0

    acc = native.VoxelAccumulator(0.4, min_bound, feature_dim=16)
    # Stream in two batches to exercise the accumulation path.
    acc.add(points[:3000], colors[:3000], feats[:3000])
    acc.add(points[3000:], colors[3000:], feats[3000:])
    out = acc.finalize()

    ref = voxel_downsample(points, 0.4, colors=colors,
                           features=feats.astype(np.float16), min_bound=min_bound)
    assert len(out["points"]) == len(ref["points"])
    np.testing.assert_array_equal(out["keys"], ref["keys"])
    np.testing.assert_allclose(out["points"], ref["points"], rtol=1e-9)
    np.testing.assert_allclose(out["colors"], ref["colors"], rtol=1e-5)
    np.testing.assert_array_equal(out["hits"], ref["hits"])
    np.testing.assert_allclose(out["features"].astype(np.float32),
                               ref["features"].astype(np.float32), atol=2e-3)


def test_points_to_voxel_first_come_semantics():
    """Reference semantics (prior_points.py:232-298): first-come voxel ids,
    per-voxel point caps, out-of-range skipped."""
    points = np.array([
        [0.1, 0.1, 0.1, 9.0],   # voxel A
        [0.2, 0.2, 0.2, 8.0],   # voxel A
        [1.1, 0.1, 0.1, 7.0],   # voxel B
        [0.3, 0.3, 0.3, 6.0],   # voxel A (over cap when max_points=2)
        [99.0, 0.0, 0.0, 5.0],  # out of range
    ], np.float32)
    voxels, coors, counts = native.points_to_voxel(
        points, voxel_size=[1.0, 1.0, 1.0],
        coors_range=[0, 0, 0, 4, 4, 4], max_points=2, max_voxels=10,
    )
    assert len(coors) == 2
    np.testing.assert_array_equal(coors[0], [0, 0, 0])  # zyx of voxel A
    np.testing.assert_array_equal(coors[1], [0, 0, 1])  # zyx of voxel B
    np.testing.assert_array_equal(counts, [2, 1])
    np.testing.assert_allclose(voxels[0, 0], points[0])
    np.testing.assert_allclose(voxels[0, 1], points[1])
    np.testing.assert_allclose(voxels[1, 0], points[2])
    # cap respected: third A-point dropped
    np.testing.assert_allclose(voxels[0], [[0.1, 0.1, 0.1, 9.0], [0.2, 0.2, 0.2, 8.0]])


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_points_to_voxel_native_matches_numpy():
    rng = np.random.RandomState(1)
    points = (rng.rand(2000, 5).astype(np.float32) * 8)  # xyz in [0,8) + 2 feature cols
    args = dict(voxel_size=[0.5, 0.5, 0.5], coors_range=[0, 0, 0, 8, 8, 8],
                max_points=4, max_voxels=500)
    v1, c1, n1 = native.points_to_voxel(points, **args)
    v2, c2, n2 = native._points_to_voxel_numpy(
        points, np.asarray(args["voxel_size"], np.float32),
        np.asarray(args["coors_range"], np.float32), 4, 500)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_allclose(v1, v2)
