"""Trainer-level data parallelism: `Trainer.train` itself runs on the
8-device virtual CPU mesh (not a bespoke step function), matching the
reference's DDP-wrapped product path (my_pipeline.py:121-124,
scripts/train.py:105-226)."""

import dataclasses
import json
from pathlib import Path

import jax
import numpy as np
import pytest

from presight_tpu.configs.method_configs import method_configs
from presight_tpu.engine.trainer import Trainer


@pytest.fixture(scope="module")
def synthetic_data():
    from presight_tpu.data.synthetic import generate_scene

    root = Path("data/synthetic")
    if not (root / "centroids").exists():
        generate_scene(root)
    return root


def _tiny_trainer_config(tmp_path, num_devices, **overrides):
    cfg = method_configs["synthetic-demo"]
    return dataclasses.replace(
        cfg,
        max_num_iterations=6,
        steps_per_save=100,
        steps_per_eval_batch=3,
        steps_per_eval_image=1000,
        output_dir=tmp_path,
        timestamp="test",
        num_devices=num_devices,
        **overrides,
    )


def test_trainer_train_on_8_device_mesh(synthetic_data, tmp_path):
    assert jax.device_count() >= 8, "conftest must provide the virtual CPU mesh"
    cfg = _tiny_trainer_config(tmp_path, num_devices=8)
    # 2048 rays / 8 devices = 256 per chip.
    trainer = Trainer(cfg)
    trainer.setup()
    assert trainer.mesh is not None and trainer.num_devices == 8
    # ZeRO-1: at least the state tree is placed on the mesh.
    shardings = {
        str(x.sharding)
        for x in jax.tree_util.tree_leaves(trainer.state.params)
        if hasattr(x, "sharding")
    }
    assert any("data" in s or "NamedSharding" in s for s in shardings)
    trainer.train()

    events = (trainer.run_dir / "events.jsonl").read_text().splitlines()
    names = {json.loads(line)["name"] for line in events}
    totals = [
        json.loads(line)["value"]
        for line in events
        if json.loads(line)["name"] == "total_loss"
    ]
    assert totals and all(np.isfinite(v) for v in totals)
    assert "Train Rays / Sec / Chip" in names
    # Eval-batch cadence fired (steps_per_eval_batch=3).
    assert any(n.startswith("eval_total_loss") for n in names)


def test_trainer_batch_not_divisible_raises(synthetic_data, tmp_path):
    cfg = _tiny_trainer_config(tmp_path, num_devices=3)
    trainer = Trainer(cfg)
    with pytest.raises(ValueError, match="not divisible"):
        trainer.setup()
