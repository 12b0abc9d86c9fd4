"""Optimizers and LR schedules as optax transforms.

Reference spec: nerfstudio-0.3.3/nerfstudio/engine/optimizers.py:73-170
(param-group -> optimizer/scheduler mapping) and my_schedulers.py:34-71
(WarmupMultiStepScheduler = torch ChainedScheduler[LinearLR warmup
(start_factor 0.01), MultiStepLR(gamma 0.33)]). PreSight's configs use
Adam(lr=1e-2, eps=1e-15, weight_decay=1e-5) for both groups
(method_configs.py:114-127).

torch-Adam parity notes: torch's ``weight_decay`` adds wd*param to the
*gradient* before the Adam moments (L2, not AdamW), so the decay transform
precedes scale_by_adam; bf16/AMP loss scaling is unnecessary on TPU (the
hash tables stay fp32), so there is no GradScaler equivalent.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerGroupConfig:
    lr: float = 1e-2
    eps: float = 1e-15
    weight_decay: float = 1e-5
    max_steps: int = 100_000
    warmup_steps: int = 10_000
    milestones: Tuple[int, ...] = (25_000, 50_000, 75_000)
    gamma: float = 0.33
    warmup_start_factor: float = 0.01


def warmup_multistep_schedule(cfg: OptimizerGroupConfig) -> optax.Schedule:
    """lr(step) = lr * linear_warmup(step) * gamma^(#milestones <= step).

    torch LinearLR: factor = start + (1 - start) * min(step, T) / T.
    """

    def schedule(step):
        import jax.numpy as jnp

        step_f = jnp.asarray(step, jnp.float32)
        t = jnp.asarray(max(cfg.warmup_steps, 1), jnp.float32)
        warm = cfg.warmup_start_factor + (1.0 - cfg.warmup_start_factor) * jnp.minimum(
            step_f, t
        ) / t
        decay_pow = sum((step_f >= m).astype(jnp.float32) for m in cfg.milestones)
        return cfg.lr * warm * cfg.gamma ** decay_pow

    return schedule


def make_group_optimizer(cfg: OptimizerGroupConfig) -> optax.GradientTransformation:
    """Adam with torch-style L2 weight decay + warmup-multistep LR."""
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=cfg.eps),
        optax.scale_by_learning_rate(warmup_multistep_schedule(cfg)),
    )


def make_optimizer(
    group_configs: Dict[str, OptimizerGroupConfig],
    group_labels,
) -> optax.GradientTransformation:
    """optax.multi_transform over a labels pytree mirroring the params.

    ``group_labels`` (from models.param_groups) assigns each leaf to a group
    name ('fields', 'proposal_networks', ...) or 'frozen' for non-trainable
    buffers, mirroring Model.get_param_groups (nerfacto_nusc_ms.py:404-414).
    """
    transforms = {name: make_group_optimizer(cfg) for name, cfg in group_configs.items()}
    transforms["frozen"] = optax.set_to_zero()
    return optax.multi_transform(transforms, group_labels)
