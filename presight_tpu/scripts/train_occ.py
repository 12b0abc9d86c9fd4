"""Stage-3 occupancy training CLI (the TPU-native `tools/train.py` analog).

Reference spec: occupancy/tools/train.py + tools/dist_train.sh drive an mmcv
EpochBasedRunner over BEVStereo4DOCC with AdamW(lr=1e-4, wd=1e-2), grad
clipping (max_norm=5) and the MEGVII EMA hook
(bevdet-occ-r50d-8x4-24e_wcamprior_randomdrop.py:269-286). Here the whole
iteration — forward, masked CE, AdamW update, EMA — is one jitted step.

Real nuScenes training data cannot ship in this environment, so the CLI
trains on either (a) a seeded random toy scene (--toy, the default; the
same shape contract the reference's own random-tensor forward tests use) or
(b) a directory of .npz samples with keys imgs/sensor2ego/cam2imgs/
post_rots/post_trans/bda/voxel_semantics[/mask_camera] (--data-dir).

Usage:
  python -m presight_tpu.scripts.train_occ --iters 50 --out outputs/occ
"""

from __future__ import annotations

import argparse
import pickle
import time
from pathlib import Path

import numpy as np


GRID = {
    "x": (-8.0, 8.0, 0.8),
    "y": (-8.0, 8.0, 0.8),
    "z": (-1.0, 3.0, 0.5),
    "depth": (1.0, 9.0, 0.5),
}
INPUT_SIZE = (32, 64)


def toy_batch(seed: int, B: int = 1, N: int = 2, input_size=INPUT_SIZE,
              grid=GRID):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    s2e = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    s2e[..., :3, 3] = rng.randn(B, N, 3) * 0.5
    intrins = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    intrins[..., 0, 0] = intrins[..., 1, 1] = 40.0 / 64 * input_size[1]
    intrins[..., 0, 2] = input_size[1] / 2.0
    intrins[..., 1, 2] = input_size[0] / 2.0
    post_rots = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    post_trans = np.zeros((B, N, 3), np.float32)
    bda = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    nvox = [round((grid[k][1] - grid[k][0]) / grid[k][2]) for k in "xyz"]
    return dict(
        imgs=jnp.asarray(rng.rand(B, N, 3, *input_size).astype(np.float32)),
        sensor2ego=jnp.asarray(s2e),
        cam2imgs=jnp.asarray(intrins),
        post_rots=jnp.asarray(post_rots),
        post_trans=jnp.asarray(post_trans),
        bda=jnp.asarray(bda),
        voxel_semantics=jnp.asarray(
            rng.randint(0, 18, (B, nvox[0], nvox[1], nvox[2]))),
    )


def load_batches(data_dir: Path):
    import jax.numpy as jnp

    batches = []
    for f in sorted(data_dir.glob("*.npz")):
        d = np.load(f)
        batches.append({k: jnp.asarray(d[k]) for k in d.files})
    if not batches:
        raise SystemExit(f"no .npz samples under {data_dir}")
    return batches


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight-decay", type=float, default=1e-2)
    parser.add_argument("--grad-clip", type=float, default=5.0)
    # MEGVIIEMAHook default (bevdet-occ-...-randomdrop.py:281 uses the hook
    # default decay=0.9990 with init_updates=10560 on resume).
    parser.add_argument("--ema-decay", type=float, default=0.9990)
    parser.add_argument("--ema-init-updates", type=int, default=0)
    parser.add_argument("--data-dir", type=Path, default=None)
    parser.add_argument("--infos", type=Path, default=None,
                        help="priorsplit infos pickle "
                             "(create_priorsplit_infos output): train from "
                             "real samples via the full reference data "
                             "pipeline — image loading + ida/bda augs + "
                             "occ GT + optional prior voxelization "
                             "(data/stage3_pipeline.py)")
    parser.add_argument("--prior-root", type=Path, default=None,
                        help="with --infos: root holding "
                             "<prior_type>/<city>/<city>-c{i}.pkl extracted "
                             "priors; enables the prior-fusion inputs")
    parser.add_argument("--prior-city-parts", default=None,
                        help="with --prior-root: 'city:parts,city:parts'")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--out", type=Path, default=Path("outputs/occ"))
    parser.add_argument("--temporal", action="store_true")
    parser.add_argument("--config", default=None,
                        help="named config from configs/stage3_configs.py "
                             "(e.g. bevdet-occ-r50d-8x4-24e_wcamprior_"
                             "randomdrop builds the reference topology at "
                             "reference scale; bevdet-occ-toy the CI "
                             "stand-in). Overrides the width flags below.")
    parser.add_argument("--backbone", choices=["simple", "resnet"],
                        default="simple",
                        help="'resnet' runs the reference topology "
                             "(ResNet + CustomFPN; width via "
                             "--resnet-base-width)")
    parser.add_argument("--resnet-base-width", type=int, default=8)
    parser.add_argument("--bev-neck", choices=["simple", "lssfpn3d"],
                        default="simple")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval-ckpt", type=Path, default=None,
                        help="evaluate a saved occ-step-*.pkl instead of "
                             "training (the tools/dist_test.sh analog): "
                             "forward every batch, report per-class IoU + "
                             "mIoU (utils/occ_metrics.MetricMIoU)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 deployment mode for --eval-ckpt: params "
                             "+ image/prior feature tensors in bf16, "
                             "geometry fp32 (PERFORMANCE.md round 5)")
    parser.add_argument("--eval-params", choices=["ema", "raw"],
                        default="ema",
                        help="which weights to evaluate; the reference's "
                             "dist_test evaluates the EMA checkpoint")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ..occupancy import BEVDetOcc, occ_loss
    from ..utils.ema import ema_init, ema_update

    if args.config is not None:
        import dataclasses

        from ..configs.stage3_configs import occ_configs

        model = occ_configs[args.config]()
        if args.temporal and not model.temporal:
            model = dataclasses.replace(model, temporal=True)
    else:
        model = BEVDetOcc(
            grid_config=GRID, input_size=INPUT_SIZE, downsample=16,
            view_out_channels=16, img_widths=(8, 16, 16, 32), neck_channels=32,
            bev_widths=(16, 32), bev_out_channels=16, occ_out_dim=16,
            num_classes=18, temporal=args.temporal,
            backbone=args.backbone, resnet_base_width=args.resnet_base_width,
            bev_neck=args.bev_neck,
        )

    if args.infos is not None:
        import jax.numpy as jnp2  # alias to avoid shadowing below

        from ..data.stage3_pipeline import IdaAugConfig, Stage3OccDataset

        priors = voxelizer = None
        if args.prior_root is not None:
            import dataclasses

            from ..prior.consume import CityPriors, VoxelizePriorPoints

            parts = dict(
                (kv.split(":")[0], int(kv.split(":")[1]))
                for kv in (args.prior_city_parts or "").split(",") if kv
            )
            if model.prior_pc_range is None:
                # Derive the prior grid from the model's own BEV grid so
                # toy/custom configs work without explicit prior ranges.
                g = model.grid_config
                model = dataclasses.replace(
                    model,
                    prior_pc_range=(g["x"][0], g["y"][0], g["z"][0],
                                    g["x"][1], g["y"][1], g["z"][1]),
                    prior_voxel_size=(g["x"][2], g["y"][2], g["z"][2]),
                )
            pr = list(model.prior_pc_range)
            vs = list(model.prior_voxel_size)
            priors = CityPriors(str(args.prior_root), parts, pr)
            voxelizer = VoxelizePriorPoints(pc_range=pr, voxel_size=vs,
                                            random_drop=True,
                                            max_drop_rate=1.0)
        ida = IdaAugConfig(input_size=tuple(model.input_size))
        ds = Stage3OccDataset(args.infos, ida=ida, is_train=True,
                              temporal=model.temporal,
                              priors=priors, voxelizer=voxelizer)
        rng_np = np.random.RandomState(args.seed)
        order = rng_np.permutation(len(ds))
        batches = []
        # Materialize one epoch of batches up front (the reference's
        # DataLoader streams; at CLI scale this keeps the loop simple and
        # the padded prior V consistent across batches for one compile).
        bs = args.batch_size
        # Fixed prior-voxel padding = the voxelizer's own cap, so every
        # batch compiles to one program (the reference's max_voxels bound).
        pad_v = voxelizer.max_voxels if voxelizer is not None else None
        for s in range(0, len(order) - bs + 1, bs):
            b = ds.batch(order[s : s + bs], rng_np, pad_prior_to=pad_v)
            batches.append({k: jnp2.asarray(v) for k, v in b.items()})
        if not batches:
            raise SystemExit(f"no full batches from {args.infos}")
    else:
        batches = (load_batches(args.data_dir) if args.data_dir
                   else [toy_batch(args.seed + i, input_size=model.input_size,
                                   grid=model.grid_config) for i in range(4)])
    b0 = batches[0]
    model_args = (b0["imgs"], b0["sensor2ego"], b0["cam2imgs"],
                  b0["post_rots"], b0["post_trans"], b0["bda"])
    if "prior_feats" in b0:
        # Prior-fusion parameters only materialize when the prior inputs
        # are traced at init.
        model_args = model_args + (b0["prior_feats"], b0["prior_coords"],
                                   b0["prior_valid"])

    if args.eval_ckpt is not None:
        from ..utils.occ_metrics import MetricMIoU

        with open(args.eval_ckpt, "rb") as f:
            ckpt = pickle.load(f)
        variables = ckpt["ema"] if args.eval_params == "ema" else ckpt["params"]
        if args.bf16:
            from ..utils.deploy import bf16_cast
            variables = bf16_cast(variables)

        @jax.jit
        def forward(batch):
            imgs = batch["imgs"]
            prior_kwargs = {}
            if "prior_feats" in batch:
                prior_kwargs = dict(prior_feats=batch["prior_feats"],
                                    prior_coords=batch["prior_coords"],
                                    prior_valid=batch["prior_valid"])
            if args.bf16:
                # Feature tensors only; sensor2ego/cam2imgs/post_rots/
                # post_trans/bda and prior_coords are geometry and stay fp32.
                imgs = imgs.astype(jnp.bfloat16)
                if prior_kwargs:
                    prior_kwargs["prior_feats"] = (
                        prior_kwargs["prior_feats"].astype(jnp.bfloat16))
            occ, _depth = model.apply(
                variables, imgs, batch["sensor2ego"],
                batch["cam2imgs"], batch["post_rots"], batch["post_trans"],
                batch["bda"], train=False, **prior_kwargs,
            )
            return jnp.argmax(occ, axis=-1)

        metric = MetricMIoU(num_classes=model.num_classes,
                            use_image_mask=any("mask_camera" in b
                                               for b in batches))
        for b in batches:
            metric.add_batch(np.asarray(forward(b)),
                             np.asarray(b["voxel_semantics"]),
                             mask_camera=(np.asarray(b["mask_camera"])
                                          if "mask_camera" in b else None))
        iou = metric.per_class_iou()
        for c, v in enumerate(iou):
            print(f"class {c:2d} IoU {v:.4f}")
        print(f"mIoU (excl. free): {metric.miou():.4f} over "
              f"{len(batches)} batches ({args.eval_params} weights)")
        return 0

    variables = model.init(jax.random.PRNGKey(args.seed), *model_args)

    # AdamW + global-norm clipping, the reference's optimizer_config.
    tx = optax.chain(
        optax.clip_by_global_norm(args.grad_clip),
        optax.adamw(args.lr, weight_decay=args.weight_decay),
    )
    opt_state = tx.init(variables)
    ema = ema_init(variables, init_updates=args.ema_init_updates)

    @jax.jit
    def step(variables, opt_state, ema, batch):
        def loss_fn(v):
            prior_kwargs = {}
            if "prior_feats" in batch:
                prior_kwargs = dict(prior_feats=batch["prior_feats"],
                                    prior_coords=batch["prior_coords"],
                                    prior_valid=batch["prior_valid"])
            (occ, _depth), _mut = model.apply(
                v, batch["imgs"], batch["sensor2ego"], batch["cam2imgs"],
                batch["post_rots"], batch["post_trans"], batch["bda"],
                train=True, mutable=["batch_stats"], **prior_kwargs,
            )
            return occ_loss(occ, batch["voxel_semantics"],
                            batch.get("mask_camera"))

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        ema = ema_update(ema, variables, args.ema_decay)
        return variables, opt_state, ema, loss

    args.out.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    loss = float("nan")
    for i in range(args.iters):
        variables, opt_state, ema, loss = step(
            variables, opt_state, ema, batches[i % len(batches)])
        if i % 10 == 0 or i + 1 == args.iters:
            print(f"iter {i:5d} | loss={float(loss):.4f} | "
                  f"{(time.perf_counter() - t0):.1f}s", flush=True)

    ckpt = {
        "params": jax.device_get(variables),
        "ema": jax.device_get(ema.params),
        "ema_updates": int(ema.updates),
        "iters": args.iters,
    }
    path = args.out / f"occ-step-{args.iters:09d}.pkl"
    with open(path, "wb") as f:
        pickle.dump(ckpt, f)
    print(f"saved {path} (final loss {float(loss):.4f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
