"""Trainer resume/checkpoint lifecycle regressions.

Covers: the final save must never mislabel (and keep-only-latest must never
delete) a newer checkpoint when re-running with max_num_iterations below the
trained step; cadence knobs set to 0 disable their feature instead of
crashing; eval_setup must not rewrite the run's config.yml; resume must not
replay the already-consumed chunk stream.
"""

import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest

from presight_tpu.configs.method_configs import method_configs
from presight_tpu.engine.checkpoints import latest_checkpoint
from presight_tpu.engine.trainer import Trainer, eval_setup


@pytest.fixture(scope="module")
def synthetic_data():
    from presight_tpu.data.synthetic import generate_scene

    root = Path("data/synthetic")
    if not (root / "centroids").exists():
        generate_scene(root)
    return root


def _cfg(tmp_path, **overrides):
    cfg = method_configs["synthetic-demo"]
    fields = dict(
        max_num_iterations=6,
        steps_per_save=100,
        steps_per_eval_batch=0,
        steps_per_eval_image=1000,
        output_dir=tmp_path,
        timestamp="test",
        num_devices=1,
    )
    fields.update(overrides)
    return dataclasses.replace(cfg, **fields)


def test_rerun_below_trained_step_keeps_newest_checkpoint(
        synthetic_data, tmp_path):
    cfg = _cfg(tmp_path)
    t1 = Trainer(cfg)
    t1.setup()
    t1.train()
    ckpt = latest_checkpoint(t1.run_dir)
    assert ckpt is not None and "000000006" in ckpt.name

    # Re-running the same run dir with a LOWER max_num_iterations runs zero
    # steps; it must neither write a checkpoint mislabeled with the lower
    # step nor delete the genuine step-6 checkpoint.
    t2 = Trainer(dataclasses.replace(cfg, max_num_iterations=3))
    t2.setup()
    assert t2.start_step == 6
    t2.train()
    ckpt2 = latest_checkpoint(t2.run_dir)
    assert ckpt2 is not None and "000000006" in ckpt2.name, (
        f"newest checkpoint lost/mislabeled: {ckpt2}")


def test_resume_continues_chunk_stream_and_rng(synthetic_data, tmp_path):
    cfg = _cfg(tmp_path)
    t1 = Trainer(cfg)
    t1.setup()
    t1.train()

    t2 = Trainer(dataclasses.replace(cfg, max_num_iterations=9))
    t2.setup()
    assert t2.start_step == 6
    # The chunk stream restarts at a step-offset position, not at the
    # seed it already consumed in steps 0..5.
    assert t2.datamanager._chunk_step == cfg.seed + 6
    # And the batch RNG is folded with the start step (differs from a
    # fresh run's).
    t0 = Trainer(dataclasses.replace(cfg, output_dir=tmp_path / "fresh"))
    t0.setup()
    assert not np.array_equal(np.asarray(t2._rng), np.asarray(t0._rng))
    t2.train()
    ckpt = latest_checkpoint(t2.run_dir)
    assert ckpt is not None and "000000009" in ckpt.name
    t0.datamanager.close()


def test_zero_cadences_disable_instead_of_crash(synthetic_data, tmp_path):
    cfg = _cfg(tmp_path, steps_per_save=0, steps_per_eval_image=0,
               steps_per_eval_batch=0, max_num_iterations=3)
    t = Trainer(cfg)
    t.setup()
    t.train()  # must not ZeroDivisionError
    # The final checkpoint still lands (fresh run, no periodic saves).
    assert latest_checkpoint(t.run_dir) is not None


def test_eval_setup_leaves_config_untouched(synthetic_data, tmp_path):
    cfg = _cfg(tmp_path)
    t1 = Trainer(cfg)
    t1.setup()
    t1.train()
    config_path = t1.run_dir / "config.yml"
    before = config_path.read_bytes()

    loaded_cfg, trainer = eval_setup(config_path)
    assert config_path.read_bytes() == before, (
        "eval_setup must not rewrite the training run's config.yml")
    assert trainer.run_dir == t1.run_dir
    assert int(np.asarray(trainer.state.step)) == 6
    trainer.datamanager.close()
