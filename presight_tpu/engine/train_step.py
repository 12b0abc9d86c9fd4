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
                                      microbatch_rays)

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
):
    """Grad and update as separate programs, with the ray batch processed in
    fixed-size microbatches under lax.scan.

    Microbatching matters twice on this toolchain: (a) the compile pipeline
    cannot handle the fully-unrolled program beyond ~4k rays (each ray-count
    variant adds dozens of sort stages), and scan reuses one compiled body;
    (b) activation memory becomes microbatch-bounded. Loss semantics match
    the reference's DDP training, which also averages per-shard (masked)
    means (my_pipeline.py:121-124).
    """

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

        if k == 1:
            (total, (losses, mse)), grads = vg(params, cameras, batch, rng, scalars,
                                               prop_grid)
        else:
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
                 split_update: bool = False, microbatch_rays: int = 4096):
        self._steps = {
            False: make_train_step(config, tx, stop_prop_grad=False,
                                   split_update=split_update,
                                   microbatch_rays=microbatch_rays),
            True: make_train_step(config, tx, stop_prop_grad=True,
                                  split_update=split_update,
                                  microbatch_rays=microbatch_rays),
        }

    def __call__(self, state, cameras, batch, rng, scalars, stop_prop_grad: bool,
                 prop_grid=None):
        return self._steps[bool(stop_prop_grad)](state, cameras, batch, rng,
                                                 scalars, prop_grid)


def init_train_state(params: Dict, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.asarray(0, jnp.int32))
