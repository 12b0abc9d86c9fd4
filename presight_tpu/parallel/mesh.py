"""Device mesh + sharding specs.

The reference's only gradient parallelism is flat data-parallel DDP over
NCCL (scripts/train.py:105-226, my_pipeline.py:121-124, SURVEY.md §2.4/§5.8).
TPU-native equivalent: a 1-D ``("data",)`` mesh; the ray batch is sharded on
the data axis, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI automatically when the jitted train step consumes
sharded batches with replicated params — there is no NCCL-equivalent code to
write.

The multi-scene expert axis (the reference's spatial model parallelism,
ingp_field_ms.py) stays *within* each chip as stacked parameters: per-sample
expert routing is a gather, so replicating experts and sharding rays is
strictly better than sharding experts (which would turn every hash lookup
into an all-to-all). Cross-tile training (different city tiles) is
embarrassingly parallel and runs as separate jobs, as in the reference
(docs/building_priors.md:7-44).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """Place a host batch with the ray axis split across the mesh."""
    spec = data_sharded(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / cameras) across the mesh."""
    spec = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), tree)


def opt_state_shardings(mesh: Mesh, opt_state_shapes, min_size: int = 1 << 20):
    """The ZeRO-1 placement rule of shard_opt_state as a sharding pytree
    over ABSTRACT leaves (jax.eval_shape output), so the optimizer state can
    be initialized (jit out_shardings) or checkpoint-restored directly into
    the sharded layout — materializing the full Adam state on one device
    first would OOM at exactly the scale ZeRO-1 exists for (15 GB fp32
    moments on 16 GB v5e chips for the 16-expert flagship)."""
    n = mesh.devices.size
    axis = mesh.axis_names[0]

    def spec(x):
        if (
            hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1
            and x.shape[0] % n == 0 and x.size >= min_size
        ):
            return NamedSharding(mesh, P(axis))
        return replicated(mesh)

    return jax.tree_util.tree_map(spec, opt_state_shapes)


def shard_opt_state(mesh: Mesh, opt_state, min_size: int = 1 << 20):
    """ZeRO-1-style optimizer-state sharding: large Adam moment tensors are
    split on their leading axis across the data mesh axis; small leaves stay
    replicated.

    With parameters replicated and moments sharded, XLA computes each
    chip's moment shard from the (all-reduced) gradients and all-gathers the
    parameter update — per-chip optimizer memory drops by the mesh size,
    which is what lets the 16-expert x 2^20-table flagship (15 GB of fp32
    Adam state) fit on 16 GB v5e chips. The reference has no equivalent
    (single-GPU state on a 40 GB A100).
    """
    specs = opt_state_shardings(mesh, opt_state, min_size)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), opt_state, specs
    )


def shard_train_state(mesh: Mesh, state):
    """Replicate params/step, ZeRO-shard the optimizer state."""
    return state._replace(
        params=replicate(mesh, state.params),
        opt_state=shard_opt_state(mesh, state.opt_state),
        step=jax.device_put(state.step, replicated(mesh)),
    )
