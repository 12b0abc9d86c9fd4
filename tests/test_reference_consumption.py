"""Executed-reference pickle-contract test (judge round-2 task 7): load an
extracted prior pickle through the REFERENCE's own NuscPrior code
(occupancy/mmdet3d/datasets/prior_utils/city_prior.py), imported from
/root/reference with its unused heavy deps stubbed, and assert our
CityPriors consumer produces identical results.

This makes the core deliverable's contract test independent of our own
transcription: if the pickle schema or coordinate convention drifted, the
reference loader itself would disagree.
"""

import importlib.util
import pickle
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/occupancy/mmdet3d/datasets/prior_utils/city_prior.py")


class _Quaternion:
    """Minimal pyquaternion.Quaternion stand-in: (w, x, y, z) ->
    rotation_matrix via the standard unit-quaternion formula (the only
    attribute NuscPrior touches)."""

    def __init__(self, q):
        self.q = np.asarray(q, np.float64)

    @property
    def rotation_matrix(self):
        w, x, y, z = self.q
        n = np.dot(self.q, self.q)
        s = 0.0 if n == 0 else 2.0 / n
        wx, wy, wz = s * w * x, s * w * y, s * w * z
        xx, xy, xz = s * x * x, s * x * y, s * x * z
        yy, yz, zz = s * y * y, s * y * z, s * z * z
        return np.array([
            [1 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1 - (xx + yy)],
        ])


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)


def load_reference_city_prior():
    """Import the reference's city_prior.py with its unused heavy deps
    stubbed (plain function so other tests — e.g. the end-to-end
    reference-checkpoint workflow — can reuse the executed loader)."""
    # Module-level imports NuscPrior never calls: shapely geometry helpers,
    # the nuScenes map API, IPython. pyquaternion.Quaternion IS called —
    # stubbed with the standard formula above.
    _stub("shapely", ops=None, strtree=None)
    _stub("shapely.geometry", LineString=object, box=object, Polygon=object)
    _stub("nuscenes")
    _stub("nuscenes.map_expansion")
    _stub("nuscenes.map_expansion.map_api", NuScenesMap=object,
          NuScenesMapExplorer=object)
    _stub("nuscenes.eval")
    _stub("nuscenes.eval.common")
    _stub("nuscenes.eval.common.utils", quaternion_yaw=lambda q: 0.0)
    _stub("pyquaternion", Quaternion=_Quaternion)
    _stub("IPython", embed=lambda: None)

    spec = importlib.util.spec_from_file_location("ref_city_prior", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def reference_city_prior():
    if not REF.exists():
        pytest.skip("reference checkout unavailable")
    return load_reference_city_prior()


def _write_prior_pickle(root: Path, city: str = "demo", n: int = 400,
                        seed: int = 0):
    rng = np.random.RandomState(seed)
    d = {
        "points": (rng.randn(n, 3) * np.array([20, 20, 2])).astype(np.float32),
        "features": rng.rand(n, 64).astype(np.float16),
        "colors": rng.rand(n, 3).astype(np.float32),
        "hits": rng.randint(1, 30, n).astype(np.int64),
        "origin": np.array([310.0, 1100.0, 0.0], np.float32),
    }
    out = root / "camera_priors" / city
    out.mkdir(parents=True)
    with open(out / f"{city}-c0.pkl", "wb") as f:
        pickle.dump(d, f)
    return d


def test_reference_loader_consumes_our_pickle(reference_city_prior, tmp_path):
    """The reference NuscPrior loads our pickle and its load-time transform
    (origin add, x/y negation, hit mean-normalization) matches CityPriors."""
    from presight_tpu.prior.consume import CityPriors

    raw = _write_prior_pickle(tmp_path)
    pc_range = [-15.0, -30.0, -5.0, 15.0, 30.0, 3.0]

    ref = reference_city_prior.NuscPrior(
        str(tmp_path), {"demo": 1}, pc_range, prior_type="camera_priors")
    ours = CityPriors(str(tmp_path), {"demo": 1}, pc_range)

    np.testing.assert_array_equal(ref.priors["demo"].xyz,
                                  ours.priors["demo"].xyz)
    np.testing.assert_array_equal(ref.priors["demo"].features,
                                  ours.priors["demo"].features)
    np.testing.assert_array_equal(ref.priors["demo"].hits,
                                  ours.priors["demo"].hits)
    # Spot-check the transform against the raw pickle: negated x/y of
    # (points + origin), mean-normalized hits.
    expect_xyz = raw["points"].astype(np.float32) + raw["origin"]
    expect_xyz[:, :2] = -expect_xyz[:, :2]
    np.testing.assert_array_equal(ref.priors["demo"].xyz, expect_xyz)


def test_reference_crop_matches_ours(reference_city_prior, tmp_path):
    """get_prior_points (rotated-bbox crop + exact ego filter) executed from
    the reference matches CityPriors for identity and yawed poses."""
    from presight_tpu.prior.consume import CityPriors

    _write_prior_pickle(tmp_path, seed=3)
    pc_range = [-15.0, -30.0, -5.0, 15.0, 30.0, 3.0]
    ref = reference_city_prior.NuscPrior(
        str(tmp_path), {"demo": 1}, pc_range, prior_type="camera_priors")
    ours = CityPriors(str(tmp_path), {"demo": 1}, pc_range)

    yaw = 0.7
    poses = [
        (np.array([-305.0, -1095.0, 0.0]), np.array([1.0, 0.0, 0.0, 0.0])),
        (np.array([-300.0, -1105.0, 0.0]),
         np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])),
    ]
    for trans, quat in poses:
        r = ref.get_prior_points("demo", trans, quat)
        o = ours.get_prior_points("demo", trans, quat)
        assert len(r) == len(o) > 0, (len(r), len(o))
        np.testing.assert_allclose(r.xyz, o.xyz, rtol=1e-12, atol=1e-12)
        np.testing.assert_array_equal(r.features, o.features)
        np.testing.assert_array_equal(r.hits, o.hits)

    # Unknown location: both return empty with the right feature width.
    r = ref.get_prior_points("nowhere", poses[0][0], poses[0][1])
    o = ours.get_prior_points("nowhere", poses[0][0], poses[0][1])
    assert len(r) == len(o) == 0
    assert r.features.shape[-1] == o.features.shape[-1] == 64
