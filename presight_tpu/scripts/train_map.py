"""Stage-3 online-mapping training CLI (the `online-mapping/tools/train.py`
analog).

Reference spec: online-mapping/tools/train.py + dist_train.sh drive an mmcv
IterBasedRunner over StreamMapNet with AdamW and a streaming two-frame clip
sampler (smn_priorsplit_480_100x50_24e.py). Here one jitted step trains the
TPU-native StreamMapNet (`presight_tpu/mapping`): two-frame streaming
forward (ConvGRU BEV memory warped by ego motion, query propagation),
Hungarian-matched classification + point-set L1 losses, AdamW update.

Real nuScenes clips cannot ship in this environment, so the CLI trains on a
seeded random toy clip by default (the same shape contract the mapping
tests use), or on a directory of .npz samples with keys imgs/lidar2img/
gt_lines/gt_labels[/prev2curr] (--data-dir).

Usage:
  python -m presight_tpu.scripts.train_map --iters 50 --out outputs/map
"""

from __future__ import annotations

import argparse
import pickle
import time
from pathlib import Path

import numpy as np

IMG_SIZE = (32, 64)
N_CAM = 2


def toy_clip(seed: int, frames: int = 2, num_gt: int = 4, num_points: int = 20,
             img_size=IMG_SIZE):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    l2i = np.tile(np.eye(4, dtype=np.float32), (N_CAM, 1, 1))
    l2i[:, 0, 0] = 8.0 / 64 * img_size[1]
    l2i[:, 1, 1] = 8.0 / 64 * img_size[1]
    l2i[:, 0, 3] = img_size[1] / 2
    l2i[:, 1, 3] = img_size[0] / 2
    clip = []
    for _ in range(frames):
        clip.append(dict(
            imgs=jnp.asarray(rng.rand(N_CAM, 3, *img_size).astype(np.float32)),
            lidar2img=jnp.asarray(l2i),
            gt_lines=jnp.asarray(
                rng.rand(num_gt, num_points, 2).astype(np.float32)),
            gt_labels=jnp.asarray(rng.randint(0, 3, (num_gt,))),
            prev2curr=jnp.asarray(np.eye(3, dtype=np.float32)),
        ))
    return clip


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--weight-decay", type=float, default=1e-2)
    parser.add_argument("--grad-clip", type=float, default=35.0)
    parser.add_argument("--config", default=None,
                        help="named config from configs/stage3_configs.py "
                             "(smn_wcamprior_480_100x50_24e_randomdrop "
                             "builds the reference topology at reference "
                             "scale; smn-toy the CI stand-in)")
    parser.add_argument("--data-dir", type=Path, default=None)
    parser.add_argument("--samples", type=Path, default=None,
                        help="mapping ann pickle (NuscDataset contract with "
                             "per-sample map_geoms polylines): train on real "
                             "streaming clips via the full reference data "
                             "pipeline (data/stage3_pipeline.py "
                             "Stage3MapDataset). Distinct per-frame GT "
                             "counts compile separate step variants.")
    parser.add_argument("--prior-root", type=Path, default=None,
                        help="with --samples: root holding extracted prior "
                             "pickles; enables the prior-fusion inputs")
    parser.add_argument("--prior-city-parts", default=None,
                        help="with --prior-root: 'city:parts,city:parts'")
    parser.add_argument("--out", type=Path, default=Path("outputs/map"))
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval-ckpt", type=Path, default=None,
                        help="evaluate a saved map-step-*.pkl instead of "
                             "training (the tools/dist_test.sh analog): "
                             "streaming forward over every clip, then "
                             "chamfer-AP (mapping/vector_eval.py)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 deployment mode for --eval-ckpt: params "
                             "+ image/BEV/query feature tensors in bf16, "
                             "geometry (lidar2img, prev2curr, ref points) "
                             "fp32 (PERFORMANCE.md round 5)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ..mapping import StreamMapNet, map_losses

    if args.config is not None:
        from ..configs.stage3_configs import map_configs

        model = map_configs[args.config]()
        if not isinstance(model, StreamMapNet):
            raise SystemExit(
                f"--config {args.config} builds {type(model).__name__}; "
                "this CLI drives StreamMapNet (the raster baseline trains "
                "through mapping.raster_loss, see tests/test_mapping.py)")
    else:
        model = StreamMapNet(img_size=IMG_SIZE)

    if args.samples is not None:
        from ..data.stage3_pipeline import Stage3MapDataset

        priors = voxelizer = None
        if args.prior_root is not None:
            from ..prior.consume import CityPriors, VoxelizePriorPoints

            parts = dict(
                (kv.split(":")[0], int(kv.split(":")[1]))
                for kv in (args.prior_city_parts or "").split(",") if kv
            )
            if model.prior_pc_range is None:
                import dataclasses

                model = dataclasses.replace(
                    model,
                    prior_pc_range=(-model.roi_size[0] / 2,
                                    -model.roi_size[1] / 2, -1.0,
                                    model.roi_size[0] / 2,
                                    model.roi_size[1] / 2, 3.0),
                    prior_voxel_size=(0.5, 0.5, 1.0),
                )
            pr = list(model.prior_pc_range)
            vs = list(model.prior_voxel_size)
            priors = CityPriors(str(args.prior_root), parts, pr)
            voxelizer = VoxelizePriorPoints(pc_range=pr, voxel_size=vs)
        ds = Stage3MapDataset(args.samples, img_size=model.img_size,
                              roi_size=model.roi_size,
                              sample_num=model.num_points,
                              priors=priors, voxelizer=voxelizer)
        windows = ds.clips()
        if not windows:
            raise SystemExit(f"no same-scene clips in {args.samples}")
        clips = [
            [{k: jnp.asarray(v) for k, v in f.items()}
             for f in ds.clip(w, pad_prior_to=4096)]
            for w in windows
        ]
    elif args.data_dir is not None:
        clips = []
        for f in sorted(args.data_dir.glob("*.npz")):
            d = np.load(f)
            frame = {k: jnp.asarray(d[k]) for k in d.files}
            frame.setdefault("prev2curr", jnp.eye(3))
            clips.append([frame])
        if not clips:
            raise SystemExit(f"no .npz samples under {args.data_dir}")
    else:
        clips = [toy_clip(args.seed + i, num_points=model.num_points,
                          img_size=model.img_size) for i in range(4)]

    if args.eval_ckpt is not None:
        from ..mapping.map_head import select_topk_for_propagation
        from ..mapping.vector_eval import VectorEvaluate

        with open(args.eval_ckpt, "rb") as f:
            variables = pickle.load(f)["params"]
        if args.bf16:
            from ..utils.deploy import bf16_cast
            variables = bf16_cast(variables)

        fwd_eval = jax.jit(lambda v, imgs, l2i, pb, p2c, pq, pr: model.apply(
            v, imgs, l2i, prev_bev=pb, prev2curr=p2c, prev_queries=pq,
            prev_ref_pts=pr, train=False))

        gts, results = {}, {}
        for ci, clip in enumerate(clips):
            prev_bev = prev_queries = prev_refs = None
            for fi, frame in enumerate(clip):
                token = f"clip{ci}-f{fi}"
                imgs = frame["imgs"]
                if args.bf16:
                    # Feature tensors in bf16; lidar2img/prev2curr and the
                    # propagated reference points stay fp32 (geometry).
                    imgs = imgs.astype(jnp.bfloat16)
                    if prev_refs is not None:
                        prev_refs = prev_refs.astype(jnp.float32)
                out = fwd_eval(variables, imgs, frame["lidar2img"],
                               prev_bev, frame["prev2curr"], prev_queries,
                               prev_refs)
                prev_bev = out["bev"]
                prev_queries, prev_refs = select_topk_for_propagation(
                    out, model.topk_propagate)
                # Per-query foreground probability with the background slot
                # appended, the same padding the loss applies.
                prob = jax.nn.softmax(
                    jnp.pad(out["scores"].astype(jnp.float32),
                            ((0, 0), (0, 1))), axis=-1,
                )[:, :-1]
                labels = np.asarray(jnp.argmax(prob, axis=-1))
                scores = np.asarray(jnp.max(prob, axis=-1))
                # f32 at the numpy boundary: VectorEvaluate is pure numpy
                # and bf16 (ml_dtypes) arrays don't mix into its math.
                lines = np.asarray(out["lines"].astype(jnp.float32))
                results[token] = {"vectors": list(lines),
                                  "scores": list(scores),
                                  "labels": list(labels)}
                gt_lines = np.asarray(frame["gt_lines"])
                gt_labels = np.asarray(frame["gt_labels"])
                per_cls = {c: [] for c in range(int(model.num_classes))}
                for g, lab in zip(gt_lines, gt_labels):
                    per_cls[int(lab)].append(g)
                gts[token] = per_cls
        out = VectorEvaluate(gts).evaluate(results)
        for k, v in sorted(out.items()):
            print(f"{k}: {v:.4f}")
        return 0

    f0 = clips[0][0]

    def _prior_kwargs(frame):
        if "prior_feats" not in frame:
            return {}
        return dict(prior_feats=frame["prior_feats"],
                    prior_coords=frame["prior_coords"],
                    prior_valid=frame["prior_valid"])

    # init with the streaming branch active so the ConvGRU / query-
    # propagation params exist (frame 2+ uses them).
    bev_hw = model.bev_hw
    topk = model.topk_propagate
    variables = model.init(
        jax.random.PRNGKey(args.seed), f0["imgs"], f0["lidar2img"],
        prev_bev=jnp.zeros((model.embed_dim, *bev_hw)),
        prev2curr=jnp.eye(3),
        prev_queries=jnp.zeros((topk, model.embed_dim)),
        prev_ref_pts=jnp.full((topk, model.num_points, 2), 0.5),
        **_prior_kwargs(f0))

    # AdamW + global-norm clip 35, the reference smn config's
    # optimizer/optimizer_config.
    tx = optax.chain(
        optax.clip_by_global_norm(args.grad_clip),
        optax.adamw(args.lr, weight_decay=args.weight_decay),
    )
    opt_state = tx.init(variables)

    from ..mapping.map_head import greedy_match, select_topk_for_propagation

    @jax.jit
    def fwd(v, frame, pb, pq, pr):
        return model.apply(
            v, frame["imgs"], frame["lidar2img"], prev_bev=pb,
            prev2curr=frame["prev2curr"], prev_queries=pq, prev_ref_pts=pr,
            train=True, mutable=["batch_stats"], **_prior_kwargs(frame))[0]

    @jax.jit
    def grad_step(variables, opt_state, clip, assignments):
        """Two-frame streaming step: frame 0 builds the BEV memory, frame 1
        trains through the warp + query propagation (StreamMapNet.py:160-219
        semantics with a jit-static clip length). The Hungarian assignment
        is host-side and detached, as in the reference's matcher."""

        def loss_fn(v):
            total = 0.0
            prev_bev = None
            prev_queries = None
            prev_refs = None
            losses = {}
            for frame, assignment in zip(clip, assignments):
                out, _mut = model.apply(
                    v, frame["imgs"], frame["lidar2img"],
                    prev_bev=prev_bev, prev2curr=frame["prev2curr"],
                    prev_queries=prev_queries, prev_ref_pts=prev_refs,
                    train=True, mutable=["batch_stats"],
                    **_prior_kwargs(frame),
                )
                losses = map_losses(out, frame["gt_lines"],
                                    frame["gt_labels"], assignment,
                                    roi_size=model.roi_size)
                total = total + sum(losses.values())
                prev_bev = out["bev"]
                prev_queries, prev_refs = select_topk_for_propagation(
                    out, model.topk_propagate)
            return total / len(clip), losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, loss, losses

    def step(variables, opt_state, clip):
        # Phase 1 (host): current predictions -> Hungarian assignment.
        assignments = []
        prev_bev = None
        prev_queries = None
        prev_refs = None
        for frame in clip:
            out = fwd(variables, frame, prev_bev, prev_queries, prev_refs)
            assignments.append(jnp.asarray(greedy_match(
                np.asarray(out["lines"]), np.asarray(frame["gt_lines"]))))
            prev_bev = out["bev"]
            prev_queries, prev_refs = jax.tree_util.tree_map(
                np.asarray, select_topk_for_propagation(out, model.topk_propagate))
        # Phase 2 (device): matched losses + AdamW update.
        return grad_step(variables, opt_state, clip, assignments)

    args.out.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    loss = float("nan")
    for i in range(args.iters):
        variables, opt_state, loss, losses = step(
            variables, opt_state, clips[i % len(clips)])
        if i % 10 == 0 or i + 1 == args.iters:
            ls = " ".join(f"{k}={float(v):.4f}" for k, v in sorted(losses.items()))
            print(f"iter {i:5d} | loss={float(loss):.4f} | {ls} | "
                  f"{(time.perf_counter() - t0):.1f}s", flush=True)

    ckpt = {"params": jax.device_get(variables), "iters": args.iters}
    path = args.out / f"map-step-{args.iters:09d}.pkl"
    with open(path, "wb") as f:
        pickle.dump(ckpt, f)
    print(f"saved {path} (final loss {float(loss):.4f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
