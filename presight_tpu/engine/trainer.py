"""Trainer: config -> setup -> train loop -> checkpoints/eval.

Reference spec: nerfstudio-0.3.3/nerfstudio/engine/trainer.py:52-547
(Trainer/TrainerConfig: train loop with before/after-iteration callbacks,
checkpoint cadence, eval cadence, rays/s logging) and
pipelines/PreSight/my_pipeline.py (datamanager+model assembly from
dataparser metadata). TPU-native: the per-iteration work is one jitted XLA
program (engine/train_step.py); the Python loop only runs host schedules,
slices numpy batches, and ships them to the device. The run-directory
contract matches the reference (`<output>/<exp>/<method>/<timestamp>/
{config.yml, nerfstudio_models/}`) so downstream tooling (extract_priors,
eval) finds runs identically.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from ..data import constants as K
from ..data.datamanager import DataManager, DataManagerConfig
from ..data.dataparser import DataParserConfig, DataparserOutputs, make_camera_params, parse
from ..data.dataset import PixelChunkDataset
from ..models.nerfacto_ms import (
    NerfactoNuscMSConfig,
    ProposalUpdateSchedule,
    anneal_at,
    init_model,
    line_of_sight_mult_at,
    line_of_sight_sigma_at,
    make_prop_grid,
    param_groups,
    prop_grid_refresh_due,
)
from ..utils import profiler
from ..utils.writer import Writer
from .checkpoints import latest_checkpoint, load_checkpoint, save_checkpoint
from .optimizers import OptimizerGroupConfig, make_optimizer
from .train_step import StepScalars, TrainStepPair, init_train_state


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    dataparser: DataParserConfig = DataParserConfig()
    datamanager: DataManagerConfig = DataManagerConfig()
    model: NerfactoNuscMSConfig = NerfactoNuscMSConfig()


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    method_name: str = "presight"
    experiment_name: str = "default"
    output_dir: Path = Path("outputs")
    timestamp: str = ""
    max_num_iterations: int = 100_000
    steps_per_save: int = 2_500
    steps_per_eval_batch: int = 1_000
    steps_per_eval_image: int = 5_000
    seed: int = 42
    pipeline: PipelineConfig = PipelineConfig()
    optimizers: Dict[str, OptimizerGroupConfig] = dataclasses.field(
        default_factory=lambda: {
            "proposal_networks": OptimizerGroupConfig(),
            "fields": OptimizerGroupConfig(),
        }
    )
    gradient_accumulation_steps: int = 1
    """Accumulate gradients over k micro-batches before each optimizer step
    (reference trainer.py:475-481)."""
    microbatch_rays: int = 4096
    """Rays per lax.scan microbatch inside the grad program. 16384 measured
    fastest on v5e for the -tpu profile (8192 +11% slower, 32768 +19%);
    4096 is the conservative default for the reference-exact profiles whose
    flat tables leave less activation headroom."""
    camera_optimizer_mode: str = "off"
    """'off' (PreSight default, my_datamanager.py:81-84) or 'so3xr3'."""
    num_devices: int = 1
    """Data-parallel width: 1 = single device, 0 = every visible device,
    N = first N devices. The TPU-native equivalent of the reference's DDP
    launch (scripts/train.py:105-226): ray batch sharded on a ("data",)
    mesh, parameters replicated, gradient all-reduce over ICI inserted by
    XLA. train_num_rays_per_batch must divide evenly (the reference
    asserts the same, my_datamanager.py:206-219)."""
    zero1: bool = True
    """When num_devices > 1, shard large optimizer-state tensors across
    the mesh (ZeRO-1; parallel/mesh.py:57-89)."""
    device_ray_store_mb: int = 512
    """Stage the whole per-pixel dataset in HBM when it fits under this
    cap and gather batches on-device by ray_index (data/device_store.py):
    only indices cross the host->device link per step, with bitwise-
    identical batch tensors. 0 disables. Under a mesh the store replicates
    its tables per chip and ships a host-sharded ray_index, so each device
    gathers exactly its batch shard locally (the DistributedSampler analog,
    my_datamanager.py:206-219)."""
    vis: str = "local"
    """'+'-joined writer backends from {local, tensorboard, wandb}
    (reference utils/writer.py:299-347; its configs default viewer+wandb).
    Unavailable backends degrade to no-ops."""
    eval_lpips: bool = True
    """Compute LPIPS at image-eval cadence (nerfacto_nusc_ms.py:668-674).
    Warns loudly once and omits the metric when no pretrained perceptual
    weights are present (utils/metrics.py lpips_fn resolution order)."""
    load_dir: Optional[Path] = None

    def run_dir(self) -> Path:
        ts = self.timestamp or "run"
        return Path(self.output_dir) / self.experiment_name / self.method_name / ts


class Trainer:
    def __init__(self, config: TrainerConfig):
        self.config = config

    @profiler.time_function(name="Trainer.setup")
    def setup(self, run_dir: Optional[Path] = None,
              write_config: bool = True) -> None:
        """run_dir overrides cfg.run_dir() (eval_setup passes the directory
        the config was loaded from, so a moved/renamed run never grows a
        phantom tree). write_config=False (eval/extraction) leaves the
        training run's config.yml provenance file untouched."""
        import jax
        import jax.numpy as jnp

        from ..utils.jax_setup import setup as jax_setup

        jax_setup()

        cfg = self.config
        pcfg = cfg.pipeline
        self.run_dir = Path(run_dir) if run_dir is not None else cfg.run_dir()
        self.run_dir.mkdir(parents=True, exist_ok=True)

        if write_config:
            from ..configs.config_io import save_config

            save_config(cfg, self.run_dir / "config.yml")

        self.train_outputs: DataparserOutputs = parse(pcfg.dataparser, split="train")
        model_cfg = dataclasses.replace(
            pcfg.model, pose_scale_factor=self.train_outputs.pose_scale_factor
        )
        self.model_config = model_cfg

        labels = None
        if self.train_outputs.predicted_labels is not None:
            train_mask = [not it.is_val for it in self.train_outputs.all_items]
            labels = self.train_outputs.predicted_labels[np.nonzero(train_mask)[0]]

        dataset = PixelChunkDataset(
            self.train_outputs.items,
            labels,
            split="train",
            images_per_chunk=pcfg.datamanager.images_per_chunk,
            chunk_ratio=pcfg.datamanager.chunk_ratio,
            group_balanced=pcfg.datamanager.group_balanced,
            load_features=pcfg.datamanager.load_features and model_cfg.use_semantics,
            mask_seg_classes=pcfg.datamanager.mask_seg_classes,
            num_threads=pcfg.datamanager.num_threads,
        )
        self.datamanager = DataManager(
            dataset, batch_size=pcfg.datamanager.train_num_rays_per_batch, seed=cfg.seed
        )
        self.cameras = make_camera_params(self.train_outputs.items)

        # Eval split (empty when train_split_fraction == 1.0, as in the tile
        # configs; the trainer then skips image-eval cadence).
        self.eval_items = [it for it in self.train_outputs.all_items if it.is_val]
        self.eval_cameras = (
            make_camera_params(self.eval_items) if self.eval_items else None
        )
        self._image_renderer = None
        # Eval-batch cadence source (reference trainer.py:522-523 /
        # my_pipeline.py:172-186): pixel batches from the val split.
        self._eval_dm = None
        self._eval_loss_fn = None
        if self.eval_items and cfg.steps_per_eval_batch > 0:
            eval_labels = None
            if self.train_outputs.predicted_labels is not None:
                val_mask = [it.is_val for it in self.train_outputs.all_items]
                eval_labels = self.train_outputs.predicted_labels[
                    np.nonzero(val_mask)[0]
                ]
            eval_ds = PixelChunkDataset(
                self.train_outputs.all_items,
                eval_labels,
                split="val",
                images_per_chunk=min(
                    pcfg.datamanager.images_per_chunk, len(self.eval_items)
                ),
                chunk_ratio=pcfg.datamanager.chunk_ratio,
                group_balanced=False,
                load_features=pcfg.datamanager.load_features
                and model_cfg.use_semantics,
                mask_seg_classes=pcfg.datamanager.mask_seg_classes,
                num_threads=pcfg.datamanager.num_threads,
            )
            self._eval_dm = DataManager(
                eval_ds, batch_size=pcfg.datamanager.eval_num_rays_per_batch,
                seed=cfg.seed + 7,
            )

        params = init_model(
            jax.random.PRNGKey(cfg.seed),
            model_cfg,
            self.train_outputs.aabbs,
            self.train_outputs.centroids,
            num_train_cameras=len(self.train_outputs.items),
            num_train_videos=self.train_outputs.num_videos,
        )
        if cfg.camera_optimizer_mode == "so3xr3":
            params["camera_opt"] = jnp.zeros((len(self.train_outputs.items), 6),
                                             jnp.float32)
        labels = param_groups(params)
        if "camera_opt" in params:
            labels["camera_opt"] = "fields"
        self.tx = make_optimizer(cfg.optimizers, labels)
        if cfg.gradient_accumulation_steps > 1:
            import optax

            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=cfg.gradient_accumulation_steps
            )
        # split_update + scan microbatching: required at tile scale on TPU
        # (compile-pipeline capacity; PERFORMANCE.md), harmless elsewhere.
        self.steps = TrainStepPair(model_cfg, self.tx, split_update=True,
                                   microbatch_rays=cfg.microbatch_rays)
        self.update_sched = ProposalUpdateSchedule(model_cfg)
        # Cached round-0 proposal grid (-tpu profiles, model_cfg.prop_grid_res
        # > 0): refreshed on a host schedule from the fine prop field.
        self._prop_grid = None
        self.writer = Writer(self.run_dir, vis=cfg.vis)

        # Mesh placement happens BEFORE state init and checkpoint restore:
        # with ZeRO-1 the Adam moments are materialized/restored directly
        # into their mesh shardings (jit out_shardings, and orbax restores
        # onto the template leaves' shardings) — initializing the full
        # optimizer state on one device first would OOM at exactly the
        # scale ZeRO-1 exists for (mesh.py opt_state_shardings).
        self.mesh = None
        self.num_devices = 1
        ndev = cfg.num_devices if cfg.num_devices > 0 else jax.device_count()
        if ndev > 1:
            from ..parallel import make_mesh, opt_state_shardings, replicate

            batch_size = cfg.pipeline.datamanager.train_num_rays_per_batch
            if batch_size % ndev != 0:
                raise ValueError(
                    f"train_num_rays_per_batch={batch_size} not divisible by "
                    f"num_devices={ndev} (reference asserts the same, "
                    "my_datamanager.py:206-219)"
                )
            self.mesh = make_mesh(ndev)
            self.num_devices = ndev
            params = replicate(self.mesh, params)
            if cfg.zero1:
                opt_specs = opt_state_shardings(
                    self.mesh, jax.eval_shape(self.tx.init, params)
                )
                opt_state = jax.jit(self.tx.init, out_shardings=opt_specs)(params)
            else:
                opt_state = replicate(self.mesh, self.tx.init(params))
            from .train_step import TrainState

            self.state = TrainState(
                params=params, opt_state=opt_state,
                step=replicate(self.mesh, jnp.asarray(0, jnp.int32)),
            )
            self.cameras = replicate(self.mesh, self.cameras)
            if self.eval_cameras is not None:
                # Eval/extraction chunks shard on the data axis too
                # (engine/evaluator.py, prior/extraction.py), with cameras
                # replicated like the train table.
                self.eval_cameras = replicate(self.mesh, self.eval_cameras)
            print(f"data-parallel over {ndev} {self.mesh.devices.flat[0].platform} "
                  f"devices (zero1={cfg.zero1})", flush=True)
        else:
            self.state = init_train_state(params, self.tx)

        # Device-resident ray store. Under a mesh the store replicates its
        # tables and gathers each device's batch shard locally from a
        # host-sharded ray_index (device_store.py module docstring).
        self._device_store = None
        self._chunk_store = None
        if cfg.device_ray_store_mb > 0:
            from ..data.device_store import ChunkDeviceStore, DeviceRayStore

            self._device_store = DeviceRayStore.maybe_build(
                self.train_outputs.items,
                pcfg.datamanager.load_features and model_cfg.use_semantics,
                cfg.device_ray_store_mb,
                mesh=self.mesh,
            )
            if self._device_store is not None:
                where = (f"replicated over {self.num_devices} devices"
                         if self.mesh is not None else "on-device")
                print(f"device ray store staged (batch values gathered "
                      f"{where})", flush=True)
            else:
                # Dataset exceeds the whole-dataset cap (or images differ in
                # size): stage at CHUNK granularity instead — the active
                # chunk's sampled rows live in HBM, the next chunk's upload
                # double-buffers behind training, and each step ships only
                # the 4-byte/ray selection (data/device_store.py
                # ChunkDeviceStore). Disables itself if even one padded
                # chunk exceeds the cap.
                self._chunk_store = ChunkDeviceStore(
                    cfg.device_ray_store_mb, mesh=self.mesh)
                self.datamanager.chunk_store = self._chunk_store
                print("chunk-granularity device store attached "
                      f"(cap {cfg.device_ray_store_mb} MB)", flush=True)

        self.start_step = 0
        load_dir = cfg.load_dir
        if load_dir is None:
            ckpt = latest_checkpoint(self.run_dir)
        else:
            ckpt = latest_checkpoint(Path(load_dir))
        if ckpt is not None:
            # The template (self.state) already carries the mesh shardings,
            # so each leaf restores straight into its final placement.
            params, opt_state, step = load_checkpoint(
                ckpt, self.state, model_config=self.model_config)
            step_arr = jnp.asarray(step, jnp.int32)
            if self.mesh is not None:
                from ..parallel import replicate

                step_arr = replicate(self.mesh, step_arr)
            self.state = self.state._replace(
                params=params, opt_state=opt_state, step=step_arr,
            )
            self.start_step = step
            print(f"resumed from {ckpt} at step {step}", flush=True)

        # Resume continuity: fold the start step into the batch RNG, offset
        # the chunk stream past a fresh position (instead of replaying the
        # exact chunk sequence steps 0..start already consumed), and replay
        # the proposal-update counter to its uninterrupted-run value.
        self._rng = jax.random.fold_in(
            jax.random.PRNGKey(cfg.seed + 1), self.start_step)
        if self.start_step > 0:
            self.datamanager.close()
            self.datamanager = DataManager(
                dataset, batch_size=pcfg.datamanager.train_num_rays_per_batch,
                seed=cfg.seed + self.start_step,
                chunk_store=self._chunk_store,
            )
            for s in range(self.start_step):
                self.update_sched.step_cb(s, self.update_sched.updated(s))

    def train(self) -> None:
        import jax
        import jax.numpy as jnp

        cfg = self.config
        mcfg = self.model_config
        batch_size = cfg.pipeline.datamanager.train_num_rays_per_batch

        # Honest steady-state timing: between log steps nothing blocks (the
        # jitted step dispatches asynchronously), so per-step time is the
        # wall time since the LAST sync divided by the steps dispatched in
        # between — timing just the sync iteration would charge the whole
        # drained backlog to one batch and under-report rays/s by up to
        # steps_per_log x.
        last_t = time.perf_counter()
        last_step = self.start_step - 1
        for step in range(self.start_step, cfg.max_num_iterations):
            np_batch = self.datamanager.next_batch()
            # Chunk-store batches arrive as device tensors (already
            # batch-axis-sharded under a mesh); host values are numpy.
            from_chunk_store = not isinstance(np_batch.get(K.RGB), np.ndarray)
            batch = self._make_batch(np_batch)
            scalars = self._scalars_at(step)
            if (self.mesh is not None and self._device_store is None
                    and not from_chunk_store):
                # The stores' gathers already produced batch-axis-sharded
                # tensors; only the host pipeline's values need placing.
                from ..parallel import shard_batch

                batch = shard_batch(self.mesh, batch)
            updated = self.update_sched.updated(step)
            if mcfg.use_prop_grid and (
                self._prop_grid is None or prop_grid_refresh_due(mcfg, step)
            ):
                self._prop_grid = make_prop_grid(self.state.params, mcfg)
            self._rng, sub = jax.random.split(self._rng)
            self.state, metrics = self.steps(
                self.state, self.cameras, batch, sub, scalars,
                stop_prop_grad=not updated, prop_grid=self._prop_grid,
            )
            self.update_sched.step_cb(step, updated)

            if step % self.writer.steps_per_log == 0:
                jax.block_until_ready(metrics["total_loss"])
                now = time.perf_counter()
                iter_time = (now - last_t) / max(step - last_step, 1)
                last_t, last_step = now, step
                host_metrics = {k: float(v) for k, v in metrics.items()}
                self.writer.log_step(
                    step, host_metrics, batch_size, iter_time,
                    cfg.max_num_iterations, num_devices=self.num_devices,
                )

            if (
                self._eval_dm is not None
                and step > 0
                and step % cfg.steps_per_eval_batch == 0
            ):
                self._eval_batch(step)

            if (
                self.eval_cameras is not None
                and cfg.steps_per_eval_image > 0
                and step > 0
                and step % cfg.steps_per_eval_image == 0
            ):
                self._eval_image(step)

            if (
                cfg.steps_per_save > 0
                and step > 0
                and (step + 1) % cfg.steps_per_save == 0
            ):
                save_checkpoint(self.run_dir, step + 1, self.state)

        # Final checkpoint, labeled with the step the state actually holds.
        # When no steps ran (resuming a run already past max_num_iterations)
        # there is nothing new to save — writing one labeled
        # max_num_iterations would mislabel newer weights AND let
        # keep-only-latest delete the genuine newest checkpoint.
        final_step = max(cfg.max_num_iterations, self.start_step)
        if final_step > self.start_step or latest_checkpoint(self.run_dir) is None:
            save_checkpoint(self.run_dir, final_step, self.state)
        self.datamanager.close()
        if self._eval_dm is not None:
            self._eval_dm.close()
        self.writer.close()

    def _make_batch(self, np_batch: Dict[str, np.ndarray],
                    use_store: bool = True) -> Dict:
        import jax.numpy as jnp

        # Chunk-store batches arrive as device tensors already (the
        # DataManager gathered them in HBM); pass through, honoring the
        # semantics gate.
        if use_store and not isinstance(np_batch.get(K.RGB), np.ndarray):
            if K.FEATURES in np_batch and not self.model_config.use_semantics:
                np_batch = {k: v for k, v in np_batch.items()
                            if k != K.FEATURES}
            return np_batch
        # The device store is built over TRAIN items only and ray_index's
        # image_index is split-local (dataparser.py splits renumber from 0),
        # so eval batches must NOT gather from it: a val index would hit an
        # unrelated train-image row. Eval passes use_store=False.
        if use_store and self._device_store is not None:
            return self._device_store.batch(
                np_batch[K.RAY_INDEX],
                self._device_store.features is not None
                and K.FEATURES in np_batch
                and self.model_config.use_semantics,
            )
        batch = {
            "ray_index": jnp.asarray(np_batch[K.RAY_INDEX]),
            "rgb": jnp.asarray(np_batch[K.RGB]),
            "sky": jnp.asarray(np_batch[K.SKY]),
            "depth": jnp.asarray(np_batch[K.DEPTH]),
        }
        if K.FEATURES in np_batch and self.model_config.use_semantics:
            batch["features"] = jnp.asarray(np_batch[K.FEATURES])
        return batch

    def _scalars_at(self, step: int) -> StepScalars:
        import jax.numpy as jnp

        mcfg = self.model_config
        return StepScalars(
            anneal=jnp.asarray(anneal_at(mcfg, step), jnp.float32),
            sigma=jnp.asarray(line_of_sight_sigma_at(mcfg, step), jnp.float32),
            los_mult=jnp.asarray(line_of_sight_mult_at(mcfg, step), jnp.float32),
        )

    def _eval_batch(self, step: int) -> None:
        """Loss metrics on an eval-split pixel batch
        (reference trainer.py:522-523 eval_iteration -> get_eval_loss_dict,
        my_pipeline.py:172-186: eval mode = mean appearance embedding)."""
        import jax
        import jax.numpy as jnp

        mcfg = self.model_config
        if self._eval_loss_fn is None:
            from ..data.cameras import generate_rays
            from ..models.nerfacto_ms import compute_losses, forward

            def eval_loss(params, cameras, batch, rng, scalars, prop_grid=None):
                bundle = generate_rays(cameras, batch["ray_index"])
                outputs = forward(
                    params, mcfg, bundle, rng, scalars.anneal,
                    train=False, stop_prop_grad=True, prop_grid=prop_grid,
                )
                losses = compute_losses(outputs, batch, mcfg, scalars.sigma,
                                        scalars.los_mult)
                total = sum(losses.values())
                losses["total_loss"] = total
                if "rgb" in batch:
                    mse = jnp.mean((outputs["rgb"] - batch["rgb"]) ** 2)
                    losses["psnr"] = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
                return losses

            self._eval_loss_fn = jax.jit(eval_loss)

        np_batch = self._eval_dm.next_batch()
        batch = self._make_batch(np_batch, use_store=False)
        scalars = self._scalars_at(step)
        # Eval cameras are indexed within the eval split: rebuild ray_index
        # against the eval camera table.
        self._rng, sub = jax.random.split(self._rng)
        losses = self._eval_loss_fn(self.state.params, self.eval_cameras,
                                    batch, sub, scalars, self._prop_grid)
        host = {f"eval_{k}": float(v) for k, v in losses.items()}
        self.writer.announce("eval batch", host, step)

    def _eval_image(self, step: int) -> None:
        """Render one eval image and log PSNR/SSIM (trainer.py:513-547 /
        my_pipeline.py:188-217 cadence)."""
        from .evaluator import ImageRenderer, image_metrics

        if self._image_renderer is None:
            self._image_renderer = ImageRenderer(self.model_config,
                                                 mesh=self.mesh)
        idx = (step // self.config.steps_per_eval_image) % len(self.eval_items)
        item = self.eval_items[idx]
        outputs = self._image_renderer.render(
            self.state.params, self.eval_cameras, idx, item.H, item.W,
            prop_grid=self._prop_grid,
        )
        gt = item.load_image()
        metrics = image_metrics(outputs["rgb"], gt,
                                with_lpips=self.config.eval_lpips)
        self.writer.announce(f"eval image {idx}",
                             {f"eval_{k}": v for k, v in metrics.items()}, step)


def eval_setup(config_path: Path,
               num_devices: Optional[int] = None) -> Tuple[TrainerConfig, "Trainer"]:
    """Rebuild a trained run from its config.yml and load the latest
    checkpoint (utils/eval_utils.py:68-110 contract).

    ``num_devices`` overrides the saved config's data-parallel width —
    eval and prior extraction shard their ray chunks over the mesh, so a
    run trained on one chip can still render/extract on all of a host's
    chips (0 = every visible device)."""
    from ..configs.config_io import load_config

    config_path = Path(config_path)
    config: TrainerConfig = load_config(config_path)
    # Run dir is wherever the config lives; setup() restores the latest
    # checkpoint from load_dir itself, and write_config=False keeps the
    # run's provenance file untouched by mere evaluation.
    run_dir = config_path.parent
    config = dataclasses.replace(config, load_dir=run_dir)
    if num_devices is not None:
        config = dataclasses.replace(config, num_devices=num_devices)
    trainer = Trainer(config)
    trainer.setup(run_dir=run_dir, write_config=False)
    return config, trainer
