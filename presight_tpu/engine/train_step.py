"""The jitted training step.

Reference spec: nerfstudio-0.3.3/nerfstudio/engine/trainer.py:462-511
(train_iteration: forward -> loss -> backward -> optimizer/scheduler step)
plus pipelines/PreSight/my_pipeline.py:126-170 (batch -> rays -> model ->
losses). On TPU the whole iteration is one XLA program: ray generation,
proposal sampling, field evaluation, rendering, losses, backward, and the
optax update all fuse under a single jit. AMP + GradScaler
(trainer.py:475-505) have no TPU equivalent needed — compute is fp32/bf16
with fp32 state, and no inf-scan is required.

Two step variants are compiled, selected by the host-side proposal update
schedule (stop_prop_grad True/False), mirroring ray_samplers.py:586-599.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..data.cameras import CameraParams, generate_rays
from ..models.nerfacto_ms import NerfactoNuscMSConfig, compute_losses, forward
from ..ops.hash_encoding import (
    _SORTED_GRAD_MIN_BYTES,
    TableGradTape,
    active_table_grad_tape,
)

# Table-gradient accumulation strategy (probe_tape_capacity /
# probe_global_sorted_scatter measurements on v5e, round 5, at the exact
# model shapes — 3.1M rows x 80 floats per level per 65,536-ray step into
# a (2^19, 80) table):
#   'step_end' — the scan EMITS each microbatch's (indices, rows) pairs as
#               stacked outputs; ONE global argsort + payload reorder +
#               indices_are_sorted scatter per level runs after the scan.
#               Measured 25.1 ms per level (8.0 ns/row, sort+reorder
#               included): with all 3.1M rows sorted the writes cover the
#               table ~6-hits-per-slot dense, so the scatter streams
#               instead of issuing isolated 320-B read-modify-writes.
#               Costs one (k, n, W) f32 staging buffer per level (~1 GB at
#               deploy shapes) — see _TAPE_YS_MAX_BYTES.
#   'sorted'  — ONE in-place sorted scatter per (level, microbatch) into a
#               full-size carried accumulator. 63.9 ms per level for the
#               same rows (20.3 ns/row): each microbatch's 196k sorted
#               rows only touch ~37% of slots, so writes stay isolated.
#               Kept as the fallback when step_end's staging would not fit.
#   (a third variant — masked scatters into fast-regime sub-buckets — was
#   measured strictly worse, 37.4k vs 60.5k rays/s at log2 19 mb 1024:
#   every bucket scatter issues EVERY row, multiplying the dominant
#   per-row cost by the bucket count. Removed.)
_TAPE_SCATTER = "step_end"

# 'step_end' staging cap: fall back to the in-scan 'sorted' strategy when
# the stacked (k, n, W) cotangent-row buffers would exceed this (the
# staging is ~4 GB at the deploy profile — fine next to 16 GB HBM — but a
# larger model/batch combination must degrade gracefully, not OOM).
_TAPE_YS_MAX_BYTES = 6 * 2**30

# Measurement-only switch (scripts_dev probes): skip the step-end
# reduction (big-table grads come back as zeros) to isolate the scan
# body's tape overhead from the reduction's cost. Never set in training.
_TAPE_DEBUG_SKIP_REDUCE = False


def _split_big_tables(params: Dict, min_bytes: int):
    """Split hash-table leaves larger than ``min_bytes`` out of the params
    pytree (replaced by 0-row placeholders so the tree structure — and the
    optimizer's view of it — never changes). Returns (small, {key: leaf})
    with keys from jax.tree_util.keystr, the contract _merge_big_tables
    inverts."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    big: Dict[str, jnp.ndarray] = {}
    small_leaves = []
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        if (
            "hash_table" in key
            and hasattr(leaf, "dtype")
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.ndim == 2
            and leaf.size * leaf.dtype.itemsize > min_bytes
        ):
            big[key] = leaf
            small_leaves.append(jnp.zeros((0,), leaf.dtype))
        else:
            small_leaves.append(leaf)
    return treedef.unflatten(small_leaves), big


def _merge_big_tables(small_params: Dict, big: Dict[str, jnp.ndarray]) -> Dict:
    flat, treedef = jax.tree_util.tree_flatten_with_path(small_params)
    return treedef.unflatten(
        [big.get(jax.tree_util.keystr(p), leaf) for p, leaf in flat]
    )


def _scatter_rows_sorted(acc: jnp.ndarray, idx: jnp.ndarray,
                         rows: jnp.ndarray) -> jnp.ndarray:
    """In-place sorted scatter-add of cotangent ``rows`` at flat table
    indices ``idx`` into the carried accumulator (the 'sorted' fallback
    strategy — see _TAPE_SCATTER)."""
    order = jnp.argsort(idx)
    return acc.at[idx[order]].add(rows[order], indices_are_sorted=True)


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray  # () int32


class StepScalars(NamedTuple):
    """Host-computed schedule values fed to the device each step."""

    anneal: jnp.ndarray  # () f32
    sigma: jnp.ndarray  # () f32 line-of-sight sigma
    los_mult: jnp.ndarray  # () f32 line-of-sight multiplier


def _psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def make_train_step(
    config: NerfactoNuscMSConfig,
    tx: optax.GradientTransformation,
    stop_prop_grad: bool,
    donate: bool = True,
    split_update: bool = False,
    microbatch_rays: int = 4096,
    tape_min_bytes: Optional[int] = None,
):
    """Build one jitted train-step variant.

    Signature: (state, cameras, batch, rng, scalars) -> (state, metrics).
    ``batch`` must contain 'ray_index' (R,3) int32 and the supervision
    targets ('rgb', optionally 'sky', 'depth', 'features').

    ``split_update`` compiles the backward pass and the optimizer update as
    two separate XLA programs. The fused program at flagship scale
    (16 experts, 2^20 tables) exceeds the TPU compile pipeline's capacity;
    splitting halves the largest compilation unit at the cost of
    materializing gradients in HBM between the two launches (which the fused
    program does anyway at the grad/update boundary).
    """
    if split_update:
        return _make_split_train_step(config, tx, stop_prop_grad, donate,
                                      microbatch_rays, tape_min_bytes)

    def step_fn(
        state: TrainState,
        cameras: CameraParams,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        scalars: StepScalars,
        prop_grid=None,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def loss_fn(params):
            cams = cameras
            if "camera_opt" in params:
                # Optional pose refinement (camera_optimizers.py SO3xR3);
                # PreSight configs run mode='off' so this key is absent.
                from ..data.cameras import apply_camera_deltas

                cams = apply_camera_deltas(cameras, params["camera_opt"])
            bundle = generate_rays(cams, batch["ray_index"])
            outputs = forward(
                params, config, bundle, rng, scalars.anneal,
                train=True, stop_prop_grad=stop_prop_grad,
                prop_grid=prop_grid,
            )
            losses = compute_losses(outputs, batch, config, scalars.sigma, scalars.los_mult)
            total = sum(losses.values())
            mse = jnp.mean((outputs["rgb"] - batch["rgb"]) ** 2) if "rgb" in batch else 0.0
            return total, (losses, mse)

        (total, (losses, mse)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["psnr"] = _psnr(mse)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def _make_split_train_step(
    config: NerfactoNuscMSConfig,
    tx: optax.GradientTransformation,
    stop_prop_grad: bool,
    donate: bool,
    microbatch_rays: int = 4096,
    tape_min_bytes: Optional[int] = None,
):
    """Grad and update as separate programs, with the ray batch processed in
    fixed-size microbatches under lax.scan.

    Microbatching matters twice on this toolchain: (a) the compile pipeline
    cannot handle the fully-unrolled program beyond ~4k rays (each ray-count
    variant adds dozens of sort stages), and scan reuses one compiled body;
    (b) activation memory becomes microbatch-bounded. Loss semantics match
    the reference's DDP training, which also averages per-shard (masked)
    means (my_pipeline.py:121-124).

    ``tape_min_bytes``: hash-table leaves larger than this take the sparse
    table-gradient path (TableGradTape + bucketed scan accumulator) instead
    of dense per-microbatch gradients. Defaults to the measured v5e
    slow-scatter threshold; tests override it downward to exercise the
    taped path at toy sizes.
    """
    if tape_min_bytes is None:
        tape_min_bytes = _SORTED_GRAD_MIN_BYTES

    def one_chunk_loss(params, cameras, chunk, rng, scalars, prop_grid=None):
        cams = cameras
        if "camera_opt" in params:
            from ..data.cameras import apply_camera_deltas

            cams = apply_camera_deltas(cameras, params["camera_opt"])
        bundle = generate_rays(cams, chunk["ray_index"])
        outputs = forward(
            params, config, bundle, rng, scalars.anneal,
            train=True, stop_prop_grad=stop_prop_grad,
            prop_grid=prop_grid,
        )
        losses = compute_losses(outputs, chunk, config, scalars.sigma, scalars.los_mult)
        total = sum(losses.values())
        mse = jnp.mean((outputs["rgb"] - chunk["rgb"]) ** 2) if "rgb" in chunk else 0.0
        return total, (losses, mse)

    def grad_fn(
        params: Dict,
        cameras: CameraParams,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        scalars: StepScalars,
        prop_grid=None,
    ):
        num_rays = batch["ray_index"].shape[0]
        micro = min(microbatch_rays, num_rays)
        if num_rays % micro != 0:
            # Falling back to one fused full-batch chunk would recreate the
            # compile-capacity/activation blowup microbatching exists to
            # prevent (module docstring) — fail loudly instead.
            raise ValueError(
                f"ray batch ({num_rays}) must be divisible by "
                f"microbatch_rays ({micro}); pick a batch size that is a "
                "multiple of the microbatch (the shipped configs use powers "
                "of two)")
        k = num_rays // micro

        vg = jax.value_and_grad(one_chunk_loss, has_aux=True)

        # The tape's (indices, rows) side channel cannot cross a remat
        # boundary (jax.checkpoint re-traces the field interior in the
        # backward pass; captured index tracers would escape it), so taped
        # gradients only engage for remat-off profiles — which is exactly
        # the -tpu family where scan microbatching already bounds
        # activations. Remat-on profiles keep the dense path, whose big
        # tables are still covered by the sorted-transpose gather backward
        # (ops/hash_encoding._gather_rows_sorted_grad).
        if config.remat:
            small_params, big_tables = params, {}
        else:
            small_params, big_tables = _split_big_tables(params, tape_min_bytes)

        if k == 1:
            (total, (losses, mse)), grads = vg(params, cameras, batch, rng, scalars,
                                               prop_grid)
        elif not big_tables:
            chunked = {
                key: v.reshape(k, micro, *v.shape[1:]) for key, v in batch.items()
            }
            rngs = jax.random.split(rng, k)

            def body(carry, xs):
                grads_acc, total_acc, losses_acc, mse_acc = carry
                chunk, chunk_rng = xs
                (total_c, (losses_c, mse_c)), grads_c = vg(
                    params, cameras, chunk, chunk_rng, scalars, prop_grid
                )
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads_c)
                losses_acc = jax.tree_util.tree_map(jnp.add, losses_acc, losses_c)
                return (grads_acc, total_acc + total_c, losses_acc, mse_acc + mse_c), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
            # Trace once to get the loss-dict structure for the accumulator.
            loss_struct = jax.eval_shape(
                lambda: one_chunk_loss(
                    params, cameras,
                    {key: v[0] for key, v in chunked.items()},
                    rngs[0], scalars, prop_grid,
                )[1][0]
            )
            zero_losses = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), loss_struct
            )
            (grads, total, losses, mse), _ = jax.lax.scan(
                body,
                (zero_grads, jnp.asarray(0.0), zero_losses, jnp.asarray(0.0)),
                (chunked, rngs),
            )
            inv = 1.0 / k
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            total = total * inv
            losses = jax.tree_util.tree_map(lambda x: x * inv, losses)
            mse = mse * inv
        else:
            # Sparse cross-microbatch table gradients (the deploy-capacity
            # path; shipped profiles whose tables stay under tape_min_bytes
            # take the branch above and compile to the identical program).
            # Each microbatch's big-table gather runs through a
            # TableGradTape so its cotangent comes out as explicit
            # (indices, rows) pairs; the scan emits them as stacked
            # outputs and ONE global argsort + sorted scatter per leaf
            # reduces them at step end (or, when that staging would not
            # fit, an in-scan sorted scatter into a carried accumulator).
            # See _TAPE_SCATTER for the measured trade-offs.
            chunked = {
                key: v.reshape(k, micro, *v.shape[1:]) for key, v in batch.items()
            }
            rngs = jax.random.split(rng, k)

            # Discovery trace: per-key gathered-row shapes + loss struct.
            # merged0/one_chunk_loss close over THIS trace's leaf objects so
            # the tape's identity matching sees the same tables the real
            # body will register.
            d_tape = TableGradTape(None)
            for key, leaf in big_tables.items():
                d_tape.register(key, leaf)
            merged0 = _merge_big_tables(small_params, big_tables)
            chunk0 = {key: v[0] for key, v in chunked.items()}
            with active_table_grad_tape(d_tape):
                loss_struct = jax.eval_shape(
                    lambda c, r: one_chunk_loss(
                        merged0, cameras, c, r, scalars, prop_grid
                    )[1][0],
                    chunk0, rngs[0],
                )
            missing = sorted(set(big_tables) - set(d_tape.shapes))
            if missing:
                raise ValueError(
                    "big hash-table leaves never gathered in the forward "
                    f"pass (their gradients would be lost): {missing}"
                )
            dummies0 = {
                key: [jnp.zeros((n, w), big_tables[key].dtype)
                      for (n, w) in d_tape.shapes[key]]
                for key in big_tables
            }

            def taped_loss(diff_args, chunk, chunk_rng):
                small_p, dummies = diff_args
                tape = TableGradTape(dummies)
                for key, leaf in big_tables.items():
                    tape.register(key, leaf)
                full = _merge_big_tables(small_p, big_tables)
                with active_table_grad_tape(tape):
                    total_c, (losses_c, mse_c) = one_chunk_loss(
                        full, cameras, chunk, chunk_rng, scalars, prop_grid
                    )
                return total_c, (losses_c, mse_c, tape.captured)

            vg_taped = jax.value_and_grad(taped_loss, has_aux=True)

            ys_bytes = sum(
                k * n * w * big_tables[key].dtype.itemsize
                for key in big_tables
                for (n, w) in d_tape.shapes[key]
            ) + sum(
                k * n * 4  # int32 index staging
                for key in big_tables
                for (n, _) in d_tape.shapes[key]
            )
            step_end = (_TAPE_SCATTER == "step_end"
                        and ys_bytes <= _TAPE_YS_MAX_BYTES)

            def _reduce_captures(acc, idx_list, rows_list):
                for idx_c, rows_c in zip(idx_list, rows_list):
                    acc = _scatter_rows_sorted(acc, idx_c, rows_c)
                return acc

            def body(carry, xs):
                grads_acc, tbl_acc, total_acc, losses_acc, mse_acc = carry
                chunk, chunk_rng = xs
                (total_c, (losses_c, mse_c, cap)), (g_small, g_dummies) = \
                    vg_taped((small_params, dummies0), chunk, chunk_rng)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g_small)
                ys = None
                if step_end:
                    ys = (cap, g_dummies)
                else:
                    tbl_acc = {
                        key: _reduce_captures(tbl_acc[key], cap[key],
                                              g_dummies[key])
                        for key in tbl_acc
                    }
                losses_acc = jax.tree_util.tree_map(jnp.add, losses_acc, losses_c)
                return (grads_acc, tbl_acc, total_acc + total_c, losses_acc,
                        mse_acc + mse_c), ys

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, small_params)
            zero_tbl = {} if step_end else {
                key: jnp.zeros_like(leaf)
                for key, leaf in big_tables.items()
            }
            zero_losses = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), loss_struct
            )
            (g_small_acc, tbl_acc, total, losses, mse), ys_out = jax.lax.scan(
                body,
                (zero_grads, zero_tbl, jnp.asarray(0.0), zero_losses,
                 jnp.asarray(0.0)),
                (chunked, rngs),
            )
            inv = 1.0 / k
            if step_end:
                # One global reduction per table leaf: every microbatch's
                # rows for every gather site of that leaf, argsorted
                # together, land in one dense-coverage sorted scatter.
                ys_idx, ys_rows = ys_out
                big_grads = {}
                for key, leaf in big_tables.items():
                    if _TAPE_DEBUG_SKIP_REDUCE:
                        big_grads[key] = jnp.zeros_like(leaf)
                        continue
                    w = leaf.shape[-1]
                    idx_all = jnp.concatenate(
                        [a.reshape(-1) for a in ys_idx[key]])
                    rows_all = jnp.concatenate(
                        [r.reshape(-1, w) for r in ys_rows[key]])
                    order = jnp.argsort(idx_all)
                    big_grads[key] = (
                        jnp.zeros_like(leaf)
                        .at[idx_all[order]]
                        .add(rows_all[order], indices_are_sorted=True)
                    ) * inv
            else:
                big_grads = {key: acc * inv for key, acc in tbl_acc.items()}
            grads = _merge_big_tables(
                jax.tree_util.tree_map(lambda g: g * inv, g_small_acc),
                big_grads,
            )
            total = total * inv
            losses = jax.tree_util.tree_map(lambda x: x * inv, losses)
            mse = mse * inv

        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["psnr"] = _psnr(mse)
        return grads, metrics

    def update_fn(state: TrainState, grads: Dict):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1)

    grad_jit = jax.jit(grad_fn)
    update_jit = jax.jit(update_fn, donate_argnums=(0, 1) if donate else ())

    def step_fn(state, cameras, batch, rng, scalars, prop_grid=None):
        grads, metrics = grad_jit(state.params, cameras, batch, rng, scalars,
                                  prop_grid)
        new_state = update_jit(state, grads)
        return new_state, metrics

    return step_fn


class TrainStepPair:
    """The two compiled variants (proposal grads on/off) behind one call."""

    def __init__(self, config: NerfactoNuscMSConfig, tx: optax.GradientTransformation,
                 split_update: bool = False, microbatch_rays: int = 4096,
                 tape_min_bytes: Optional[int] = None):
        self._steps = {
            False: make_train_step(config, tx, stop_prop_grad=False,
                                   split_update=split_update,
                                   microbatch_rays=microbatch_rays,
                                   tape_min_bytes=tape_min_bytes),
            True: make_train_step(config, tx, stop_prop_grad=True,
                                  split_update=split_update,
                                  microbatch_rays=microbatch_rays,
                                  tape_min_bytes=tape_min_bytes),
        }

    def __call__(self, state, cameras, batch, rng, scalars, stop_prop_grad: bool,
                 prop_grid=None):
        return self._steps[bool(stop_prop_grad)](state, cameras, batch, rng,
                                                 scalars, prop_grid)


def init_train_state(params: Dict, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.asarray(0, jnp.int32))
