"""Every registered method config instantiates without data.

Mirrors the reference's config-instantiation pyramid layer
(occupancy/tests/test_runtime/test_config.py builds every mmdet3d config
without data; nerfstudio test_train.py:32-60 smoke-runs every registered
method): all 73 method_configs shape-initialize the full model pytree
(jax.eval_shape — no FLOPs, no table allocation), label every leaf for the
optimizer, and survive a config.yml round-trip.
"""

import dataclasses

import jax
import numpy as np
import pytest

from presight_tpu.configs.config_io import from_dict, to_dict
from presight_tpu.configs.method_configs import method_configs
from presight_tpu.engine import make_optimizer
from presight_tpu.models import init_model, param_groups


@pytest.mark.parametrize("name", sorted(method_configs))
def test_config_instantiates(name):
    cfg = method_configs[name]
    mcfg = cfg.pipeline.model

    E = 2
    rng = np.random.RandomState(0)
    centroids = rng.randn(E, 3).astype(np.float32)
    aabbs = np.stack([np.stack([c - 5.0, c + 5.0]) for c in centroids])

    shapes = jax.eval_shape(
        lambda: init_model(jax.random.PRNGKey(0), mcfg, aabbs, centroids,
                           num_train_cameras=7, num_train_videos=3)
    )
    leaves = jax.tree_util.tree_leaves(shapes)
    assert leaves, name

    labels = param_groups(shapes)
    label_leaves = jax.tree_util.tree_leaves(labels)
    assert len(label_leaves) == len(leaves)
    assert set(label_leaves) <= {"proposal_networks", "fields", "frozen"}
    # The optimizer builds against these groups (concrete init not needed
    # for the structural check).
    make_optimizer(cfg.optimizers, labels)

    # config.yml round-trip preserves the full dataclass tree.
    restored = from_dict(to_dict(cfg))
    assert restored == cfg


def test_tpu_variants_cover_every_tile():
    names = set(method_configs)
    tiles = {n for n in names if n != "synthetic-demo" and not n.endswith("-tpu")}
    assert tiles, "no tile configs registered"
    missing = {n for n in tiles if f"{n}-tpu" not in names}
    assert not missing, f"tiles without a -tpu variant: {sorted(missing)}"
    for n in tiles:
        base, tpu = method_configs[n], method_configs[f"{n}-tpu"]
        # Same trainer surface; only profile fields may differ.
        assert tpu.max_num_iterations == base.max_num_iterations
        assert tpu.pipeline.model.use_semantics == base.pipeline.model.use_semantics
        assert dataclasses.asdict(tpu.optimizers["fields"]) == dataclasses.asdict(
            base.optimizers["fields"])
