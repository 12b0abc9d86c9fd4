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
    param_groups,
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
    camera_optimizer_mode: str = "off"
    """'off' (PreSight default, my_datamanager.py:81-84) or 'so3xr3'."""
    load_dir: Optional[Path] = None

    def run_dir(self) -> Path:
        ts = self.timestamp or "run"
        return Path(self.output_dir) / self.experiment_name / self.method_name / ts


class Trainer:
    def __init__(self, config: TrainerConfig):
        self.config = config

    @profiler.time_function(name="Trainer.setup")
    def setup(self) -> None:
        import jax
        import jax.numpy as jnp

        from ..utils.jax_setup import setup as jax_setup

        jax_setup()

        cfg = self.config
        pcfg = cfg.pipeline
        self.run_dir = cfg.run_dir()
        self.run_dir.mkdir(parents=True, exist_ok=True)

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
            load_features=pcfg.datamanager.load_features,
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
        self.state = init_train_state(params, self.tx)
        # split_update + scan microbatching: required at tile scale on TPU
        # (compile-pipeline capacity; PERFORMANCE.md), harmless elsewhere.
        self.steps = TrainStepPair(model_cfg, self.tx, split_update=True)
        self.update_sched = ProposalUpdateSchedule(model_cfg)
        self.writer = Writer(self.run_dir)
        self._rng = jax.random.PRNGKey(cfg.seed + 1)
        self.start_step = 0

        load_dir = cfg.load_dir
        if load_dir is None:
            ckpt = latest_checkpoint(self.run_dir)
        else:
            ckpt = latest_checkpoint(Path(load_dir))
        if ckpt is not None:
            params, opt_state, step = load_checkpoint(ckpt, self.state)
            self.state = self.state._replace(
                params=params, opt_state=opt_state,
                step=jnp.asarray(step, jnp.int32),
            )
            self.start_step = step
            print(f"resumed from {ckpt} at step {step}", flush=True)

    def train(self) -> None:
        import jax
        import jax.numpy as jnp

        cfg = self.config
        mcfg = self.model_config
        batch_size = cfg.pipeline.datamanager.train_num_rays_per_batch

        for step in range(self.start_step, cfg.max_num_iterations):
            t0 = time.perf_counter()
            np_batch = self.datamanager.next_batch()
            batch = {
                "ray_index": jnp.asarray(np_batch[K.RAY_INDEX]),
                "rgb": jnp.asarray(np_batch[K.RGB]),
                "sky": jnp.asarray(np_batch[K.SKY]),
                "depth": jnp.asarray(np_batch[K.DEPTH]),
            }
            if K.FEATURES in np_batch and mcfg.use_semantics:
                batch["features"] = jnp.asarray(np_batch[K.FEATURES])

            scalars = StepScalars(
                anneal=jnp.asarray(anneal_at(mcfg, step), jnp.float32),
                sigma=jnp.asarray(line_of_sight_sigma_at(mcfg, step), jnp.float32),
                los_mult=jnp.asarray(line_of_sight_mult_at(mcfg, step), jnp.float32),
            )
            updated = self.update_sched.updated(step)
            self._rng, sub = jax.random.split(self._rng)
            self.state, metrics = self.steps(
                self.state, self.cameras, batch, sub, scalars,
                stop_prop_grad=not updated,
            )
            self.update_sched.step_cb(step, updated)

            if step % self.writer.steps_per_log == 0:
                jax.block_until_ready(metrics["total_loss"])
                host_metrics = {k: float(v) for k, v in metrics.items()}
                self.writer.log_step(
                    step, host_metrics, batch_size, time.perf_counter() - t0,
                    cfg.max_num_iterations,
                )

            if (
                self.eval_cameras is not None
                and step > 0
                and step % cfg.steps_per_eval_image == 0
            ):
                self._eval_image(step)

            if step > 0 and (step + 1) % cfg.steps_per_save == 0:
                save_checkpoint(self.run_dir, step + 1, self.state)

        save_checkpoint(self.run_dir, cfg.max_num_iterations, self.state)
        self.datamanager.close()
        self.writer.close()

    def _eval_image(self, step: int) -> None:
        """Render one eval image and log PSNR/SSIM (trainer.py:513-547 /
        my_pipeline.py:188-217 cadence)."""
        from .evaluator import ImageRenderer, image_metrics

        if self._image_renderer is None:
            self._image_renderer = ImageRenderer(self.model_config)
        idx = (step // self.config.steps_per_eval_image) % len(self.eval_items)
        item = self.eval_items[idx]
        outputs = self._image_renderer.render(
            self.state.params, self.eval_cameras, idx, item.H, item.W
        )
        gt = item.load_image()
        metrics = image_metrics(outputs["rgb"], gt, with_lpips=False)
        self.writer.put_dict({f"eval_{k}": v for k, v in metrics.items()}, step)
        print(f"eval image {idx} @ step {step}: psnr={metrics['psnr']:.2f} "
              f"ssim={metrics['ssim']:.3f}", flush=True)


def eval_setup(config_path: Path) -> Tuple[TrainerConfig, "Trainer"]:
    """Rebuild a trained run from its config.yml and load the latest
    checkpoint (utils/eval_utils.py:68-110 contract)."""
    from ..configs.config_io import load_config

    config_path = Path(config_path)
    config: TrainerConfig = load_config(config_path)
    # Run dir is wherever the config lives.
    run_dir = config_path.parent
    config = dataclasses.replace(config, load_dir=run_dir,
                                 output_dir=run_dir.parent.parent.parent)
    trainer = Trainer(config)
    trainer.setup()
    trainer.run_dir = run_dir
    ckpt = latest_checkpoint(run_dir)
    if ckpt is not None:
        params, opt_state, step = load_checkpoint(ckpt, trainer.state)
        import jax.numpy as jnp

        trainer.state = trainer.state._replace(
            params=params, opt_state=opt_state, step=jnp.asarray(step, jnp.int32)
        )
    return config, trainer
