"""Scene-parallel deployment composition for the streaming mapping stack.

StreamMapNet / RasterMapper are single-sample models whose streaming state
(ConvGRU BEV memory, propagated queries) chains WITHIN a scene — frames of
one drive are inherently sequential. Across scenes, streams are
independent, so the TPU-native throughput lever is scene parallelism:
vmap the per-frame application over a stacked scene axis and shard that
axis over a :class:`jax.sharding.Mesh`. Every chip advances one stream per
step in the (fast) single-sample regime, and aggregate FPS is monotone in
chips — the analog of the reference's per-GPU test sharding
(online-mapping ``tools/dist_test.sh`` splits samples across ranks).

Single-chip per-frame latency is regression-tracked in the bench ladder
(PERFORMANCE.md stage-3 rungs); this module is the scale-out composition.
"""
from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import jax

__all__ = ["sharded_streams_apply"]


def sharded_streams_apply(model, variables, args: Sequence[Any] = (),
                          kwargs: Optional[Mapping[str, Any]] = None, *,
                          mesh: jax.sharding.Mesh, axis: str = "data"):
    """Advance ``S`` independent scene streams one frame, scenes sharded
    over ``mesh``.

    Every leaf of ``args`` / non-None ``kwargs`` must carry a leading scene
    axis ``S`` (stack per-scene inputs and streaming state on axis 0),
    divisible by the mesh axis size. Model ``variables`` are replicated.
    Returns the model outputs with the same leading scene axis; feed each
    scene's streaming outputs (``bev``, ``queries``) back as the next
    frame's stacked ``prev_*`` inputs.
    """
    args = tuple(args)
    kwargs = {k: v for k, v in dict(kwargs or {}).items() if v is not None}
    n_dev = mesh.shape[axis]
    scenes = int(args[0].shape[0]) if args else int(
        next(iter(kwargs.values())).shape[0])
    if scenes % n_dev:
        raise ValueError(
            f"scene count {scenes} not divisible by mesh axis "
            f"'{axis}' ({n_dev})")
    spec_b = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(axis))
    spec_r = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    variables = jax.device_put(variables, spec_r)
    args = tuple(jax.device_put(a, spec_b) for a in args)
    kwargs = {k: jax.device_put(v, spec_b) for k, v in kwargs.items()}

    def one_scene(v, a, kw):
        # Inference still declares batch_stats mutable (the toy backbones
        # carry BN collections); the per-frame updates are discarded.
        out, _ = model.apply(v, *a, **kw, mutable=["batch_stats"])
        return out

    fn = jax.jit(jax.vmap(one_scene, in_axes=(None, 0, 0)))
    return fn(variables, args, kwargs)
