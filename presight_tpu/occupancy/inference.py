"""Deployment compositions for batched BEVDet-Occ inference.

The natively batched graph is the regression-tracked bench rung, but its
samples/s REGRESSES past batch 1 on a single v5e (PERFORMANCE.md round 5:
3.5 samples/s at batch 4 vs 4.4 FPS at batch 1 — the inflation is spread
across the (B, C, Z, 200, 200) 3-D conv stack's activation footprint, with
the stereo cost volume exonerated). Two compositions recover throughput:

* :func:`mapped_apply` — compose the batch as a ``lax.map`` over
  ``chunk_size``-sample applications inside ONE jit. Each application runs
  in the batch-1 activation regime; measured +13% samples/s at batch 4
  (scripts_dev/probe_occ_batchmap.py). Single-chip lever.
* :func:`sharded_apply` — shard the batch axis over a ``jax.sharding.Mesh``.
  Inference is embarrassingly parallel across samples, so every chip runs
  the batch-1 regime and aggregate samples/s is monotone in chips. This is
  the TPU-native analog of the reference's batch-per-GPU test loop
  (occupancy: ``tools/dist_test.sh`` -> one sample per GPU process).

Both return exactly what ``model.apply`` returns; every output of
:class:`~presight_tpu.occupancy.bevdet_occ.BEVDetOcc` is batch-major on
axis 0 (``occ`` is ``(B, ...)``, ``depth``/``stereo`` are ``(B*N, ...)`` /
``(B, N, ...)``), so per-chunk outputs concatenate on axis 0.
"""
from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["mapped_apply", "sharded_apply"]


def _split_kwargs(kwargs: Optional[Mapping[str, Any]]):
    """Drop ``None`` entries (the model's optional inputs default to None)."""
    return {k: v for k, v in dict(kwargs or {}).items() if v is not None}


def mapped_apply(model, variables, args: Sequence[Any] = (),
                 kwargs: Optional[Mapping[str, Any]] = None, *,
                 chunk_size: int = 1):
    """Apply ``model`` to a batch as a ``lax.map`` over per-chunk slices.

    All positional ``args`` and non-None ``kwargs`` must share a leading
    batch axis ``B`` divisible by ``chunk_size``. The whole composition is
    one jittable function: XLA traces the chunk application once and runs
    it ``B // chunk_size`` times sequentially, keeping the live activation
    footprint in the ``chunk_size`` regime.
    """
    args = tuple(args)
    kwargs = _split_kwargs(kwargs)
    batch = int(args[0].shape[0]) if args else int(
        next(iter(kwargs.values())).shape[0])
    if batch % chunk_size:
        raise ValueError(
            f"batch {batch} not divisible by chunk_size {chunk_size}")
    n_chunks = batch // chunk_size

    def to_chunks(x):
        return jnp.reshape(x, (n_chunks, chunk_size) + tuple(x.shape[1:]))

    chunked = jax.tree_util.tree_map(to_chunks, (args, kwargs))

    def one_chunk(chunk):
        a, kw = chunk
        return model.apply(variables, *a, **kw)

    outs = jax.lax.map(one_chunk, chunked)
    # (n_chunks, chunk_major, ...) -> (B_major, ...) for every output leaf;
    # all model outputs are batch-major so the flatten restores native order.
    return jax.tree_util.tree_map(
        lambda o: jnp.reshape(o, (-1,) + tuple(o.shape[2:])), outs)


def sharded_apply(model, variables, args: Sequence[Any] = (),
                  kwargs: Optional[Mapping[str, Any]] = None, *,
                  mesh: jax.sharding.Mesh, axis: str = "data"):
    """Data-parallel inference: batch axis sharded over ``mesh``, params
    replicated. No collectives are needed — XLA partitions the whole graph
    per-sample, so each chip runs the (fast) batch-1 activation regime.
    """
    args = tuple(args)
    kwargs = _split_kwargs(kwargs)
    n_dev = mesh.shape[axis]
    batch = int(args[0].shape[0]) if args else int(
        next(iter(kwargs.values())).shape[0])
    if batch % n_dev:
        raise ValueError(
            f"batch {batch} not divisible by mesh axis '{axis}' ({n_dev})")
    spec_b = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(axis))
    spec_r = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    variables = jax.device_put(variables, spec_r)
    args = tuple(jax.device_put(a, spec_b) for a in args)
    kwargs = {k: jax.device_put(v, spec_b) for k, v in kwargs.items()}

    @jax.jit
    def fn(v, a, kw):
        return model.apply(v, *a, **kw)

    return fn(variables, args, kwargs)
