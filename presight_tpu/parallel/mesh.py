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
