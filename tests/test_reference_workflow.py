"""End-to-end reference-checkpoint workflow (VERDICT r3 next-round #7):
the headline user story "evaluate and extract priors from reference-trained
runs", executed as one chain —

  reference-format torch checkpoint (the EXECUTED full-model golden's
  state_dict, tests/make_goldens.py::full_model_golden)
    -> dropped as step-*.ckpt into a run dir next to one of OUR config.yml
    -> eval_setup restores it through engine/checkpoints.load_checkpoint's
       torch-file branch (engine/import_reference.py)
    -> ns-extract-priors CLI renders + voxelizes the priors
    -> the pickle is consumed by the REFERENCE's own executed NuscPrior
       (occupancy/.../city_prior.py via test_reference_consumption's loader).

Reference contract: eval_utils.py:68-110 (eval_setup reload),
extract_priors.py (stage-2 exit), city_prior.py:46-79 (stage-3 entry).
"""

import dataclasses
import pickle
from pathlib import Path

import numpy as np
import pytest

GOLD = Path(__file__).parent / "goldens" / "full_model.npz"
REF_CITY = Path(
    "/root/reference/occupancy/mmdet3d/datasets/prior_utils/city_prior.py")


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from presight_tpu.data.synthetic import generate_scene

    return generate_scene(tmp_path_factory.mktemp("scene"))


def _golden_model_config():
    """The golden generator's model dims (mirrors test_full_model_parity;
    only the reference-exact corner storage accepts imports)."""
    from presight_tpu.models import NerfactoNuscMSConfig

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
        eval_num_rays_per_chunk=1 << 11,
    )


def test_reference_checkpoint_to_reference_consumer(scene_dir, tmp_path):
    if not GOLD.exists():
        pytest.skip("full_model.npz not generated (run tests/make_goldens.py)")
    if not REF_CITY.exists():
        pytest.skip("reference checkout unavailable")
    import torch

    from presight_tpu.configs.config_io import save_config
    from presight_tpu.configs.method_configs import method_configs
    from presight_tpu.engine.trainer import eval_setup
    from presight_tpu.scripts.extract_priors import main as extract_main

    # 1. A reference-format checkpoint from the executed golden's weights
    #    (trainer.py:432-460 layout: torch pickle, pipeline key, _model.
    #    prefix on module names).
    data = np.load(GOLD)
    state = {f"_model.{k[len('state::'):]}": torch.tensor(data[k])
             for k in data.files if k.startswith("state::")}
    run_dir = tmp_path / "refrun" / "presight" / "run"
    (run_dir / "nerfstudio_models").mkdir(parents=True)
    torch.save({"step": 500, "pipeline": state},
               run_dir / "nerfstudio_models" / "step-000000500.ckpt")

    # 2. One of OUR configs next to it (the user story: point our tooling's
    #    config at the data, drop the reference checkpoint in).
    base = method_configs["synthetic-demo"]
    cfg = dataclasses.replace(
        base,
        experiment_name="refrun", method_name="presight", timestamp="run",
        output_dir=tmp_path, steps_per_eval_batch=0,
        pipeline=dataclasses.replace(
            base.pipeline,
            model=_golden_model_config(),
            dataparser=dataclasses.replace(
                base.pipeline.dataparser,
                data_dir=scene_dir, centroids_dir=scene_dir / "centroids",
            ),
        ),
    )
    save_config(cfg, run_dir / "config.yml")

    # 3. eval_setup restores the torch file through the importer: a golden
    #    leaf must land bitwise in the live params.
    _, trainer = eval_setup(run_dir / "config.yml")
    assert trainer.start_step == 500
    got = np.asarray(trainer.state.params["appearance_embedding"])
    want = data["state::appearance_embedding.embedding.weight"]
    np.testing.assert_array_equal(got, want)

    # 4. The extraction CLI end to end on the same run dir (loose density
    #    threshold: the golden's weights are init-scale, not trained).
    out_dir = tmp_path / "extracted"
    rc = extract_main([
        str(run_dir), "--output-dir", str(out_dir),
        "--downscale", "4", "--interval", "4",
        "--density-threshold", "1e-4", "--hit-thr-ratio", "0.0",
        "--depth-type", "expected_depth", "--max-depth", "30.0",
    ])
    assert rc == 0
    pkl = out_dir / "extracted_priors.pkl"
    with open(pkl, "rb") as f:
        prior = pickle.load(f)
    assert prior["points"].shape[0] > 0
    assert prior["features"].dtype == np.float16
    assert prior["features"].shape[1] == 64

    # 5. The REFERENCE's own NuscPrior consumes the pickle and agrees with
    #    our CityPriors on the loaded transform.
    from test_reference_consumption import load_reference_city_prior

    from presight_tpu.prior.consume import CityPriors

    city_root = tmp_path / "priors_root"
    dst = city_root / "camera_priors" / "demo"
    dst.mkdir(parents=True)
    (dst / "demo-c0.pkl").write_bytes(pkl.read_bytes())

    ref_mod = load_reference_city_prior()
    pc_range = [-50.0, -50.0, -10.0, 50.0, 50.0, 10.0]
    ref = ref_mod.NuscPrior(str(city_root), {"demo": 1}, pc_range,
                            prior_type="camera_priors")
    ours = CityPriors(str(city_root), {"demo": 1}, pc_range)
    np.testing.assert_array_equal(ref.priors["demo"].xyz,
                                  ours.priors["demo"].xyz)
    np.testing.assert_array_equal(ref.priors["demo"].features,
                                  ours.priors["demo"].features)
