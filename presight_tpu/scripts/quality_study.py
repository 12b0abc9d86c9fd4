"""Quality study: PSNR/SSIM of the TPU-first table layouts vs the
reference-exact corner layout, at matched parameter count, on the synthetic
tile fixture.

This gates the -tpu method profile (configs/method_configs.py _tpu_profile):
the architecture-modified profiles are only legitimate headline configs if
they reach the corner layout's quality. Results are written to QUALITY.md.

Usage:
  python -m presight_tpu.scripts.quality_study [--iters 500] [--out QUALITY.md]
"""

from __future__ import annotations

import argparse
import dataclasses
import re
import time
from pathlib import Path


def variant_model(base, storage: str):
    """Matched-parameter-count variants of the synthetic-demo model.

    Corner (reference-exact): L=6 x F=2, 2^14 rows/level/expert (x2 experts)
    = 393k main params. Cell packs 8 corner sets/row -> log2-3. Shared packs
    per-level leaves of T x 8F shared by both experts -> T = 2^12 for the
    same total.
    """
    if storage == "corner":
        return base
    if storage == "cell":
        return dataclasses.replace(
            base, hash_storage="cell",
            log2_hashmap_size=base.log2_hashmap_size - 3,
        )
    if storage == "shared":
        return dataclasses.replace(
            base, hash_storage="shared", prop_shared_mlp=True,
            log2_hashmap_size=base.log2_hashmap_size - 2,
            proposal_net_args_list=tuple(
                dict(a, log2_hashmap_size=a["log2_hashmap_size"] - 2)
                for a in base.proposal_net_args_list
            ),
        )
    if storage == "shared-rebalanced":
        # The -tpu profile's level/feature split at the demo scale:
        # same encoding width (12), half the levels, double features.
        return dataclasses.replace(
            base, hash_storage="shared", prop_shared_mlp=True,
            num_levels=base.num_levels // 2,
            features_per_level=base.features_per_level * 2,
            log2_hashmap_size=base.log2_hashmap_size - 2,
            proposal_net_args_list=tuple(
                dict(a, log2_hashmap_size=a["log2_hashmap_size"] - 2,
                     num_levels=max(2, a["num_levels"] - 1),
                     features_per_level=a["features_per_level"] * 2)
                for a in base.proposal_net_args_list
            ),
        )
    if storage == "main-lean":
        # prop-lean + the MAIN encoding rebalanced once more: levels x 2/3,
        # features x 1.5 (demo: 2 levels x 6) — same encoding width, same
        # parameter count, ~1/3 fewer main-table rows touched per sample.
        # Gated here because the main field is the quality-sensitive one.
        return dataclasses.replace(
            base, hash_storage="shared", prop_shared_mlp=True,
            num_levels=base.num_levels // 3,
            features_per_level=base.features_per_level * 3,
            log2_hashmap_size=base.log2_hashmap_size - 2,
            proposal_net_args_list=tuple(
                dict(a, log2_hashmap_size=a["log2_hashmap_size"] - 2,
                     num_levels=max(2, (a["num_levels"] - 1) // 2),
                     features_per_level=a["features_per_level"] * 4)
                for a in base.proposal_net_args_list
            ),
        )
    if storage == "main-lean4":
        # prop-lean + a GENTLER main rebalance than the rejected main-lean:
        # levels x 2/3 with features x 1.5 (demo: 6x2 -> 4x3) — identical
        # encoding width (12) and parameter count (4*T*8*3 == 6*T*8*2),
        # 1/3 fewer main-table rows per sample. main-lean (2 levels) failed
        # the SSIM gate; this probes whether 4 levels keep the multiscale
        # ladder intact.
        base2 = variant_model(base, "prop-lean")
        return dataclasses.replace(
            base2,
            num_levels=(base.num_levels * 2) // 3,
            features_per_level=(base.features_per_level * 3) // 2,
        )
    if storage == "grid-lean4":
        # main-lean4 + the cached-density-grid round (the full round-3
        # headline candidate).
        return dataclasses.replace(
            variant_model(base, "main-lean4"), prop_grid_res=64,
        )
    if storage in ("grid-s96", "grid-s64"):
        # grid-lean4 + fewer FIRST-round samples. With the cached 64^3
        # density grid the round-1 histogram is band-limited by the grid
        # resolution — 128 stratified samples oversample it. 96/64 samples
        # cut the biggest per-step row count (the reference's 128 is a
        # CUDA-tuned choice, not a physical one); gated here.
        n1 = 96 if storage == "grid-s96" else 64
        base4 = variant_model(base, "grid-lean4")
        return dataclasses.replace(
            base4,
            num_proposal_samples_per_ray=(
                n1, base.num_proposal_samples_per_ray[1]),
        )
    m = re.fullmatch(r"grid-r(\d+)", storage)
    if m:
        # grid-s64 with the FIRST-round count set to r — sensitivity
        # control for the round-1 axis (r12 should measurably degrade if
        # the fixture can detect round-1 undersampling at all; the
        # adopted 64 sits far above it).
        return dataclasses.replace(
            variant_model(base, "grid-lean4"),
            num_proposal_samples_per_ray=(
                int(m.group(1)), base.num_proposal_samples_per_ray[1]),
        )
    m = re.fullmatch(r"grid-s64-n(\d+)(-cap4x)?", storage)
    if m:
        # grid-s64 with FINAL sample count set ABSOLUTELY to n (the demo
        # base renders with 24). This is the final-quadrature sweep: the
        # headline profile renders with 64 final samples and ~77% of the
        # fused step scales with that count (PERFORMANCE.md round-3
        # probes), so a reduction is the biggest remaining perf lever —
        # but it changes the rendering quadrature itself. The gate
        # therefore runs the headline count (n64) as the baseline arm,
        # candidate cuts (n48, n32) against it, and a deliberately-broken
        # control (n12) that must degrade measurably for the fixture to
        # have any power on this axis. PSNR, SSIM, AND depth_rmse all
        # gate (depth error is the most quadrature-sensitive metric).
        # -cap4x adds 4x shared table rows (log2 +2, measured free at the
        # fused profile) for the capacity-axis composition check.
        v = dataclasses.replace(
            variant_model(base, "grid-s64"),
            num_nerf_samples_per_ray=int(m.group(1)),
        )
        if m.group(2):
            v = dataclasses.replace(
                v, log2_hashmap_size=v.log2_hashmap_size + 2)
        return v
    m = re.fullmatch(r"grid-n(\d+)-cap4x-p(\d+)x(\d+)", storage)
    if m:
        n_final, p1, p2 = int(m.group(1)), int(m.group(2)), int(m.group(3))
        # The adopted round-3c profile (grid + n48 + cap4x) with BOTH
        # proposal-round counts set ABSOLUTELY to (p1, p2). This is the
        # proposal-quadrature sweep: with the final count settled, the
        # two proposal rounds are the next-largest per-step row counts
        # (PERFORMANCE.md config-delta probes: round-1 ~216 ms, round-2
        # ~108 ms at the 65k step). Cutting them changes WHERE the final
        # 48 samples land (the PDF), not the rendering quadrature itself,
        # but mis-placed samples show up on the same axis — depth RMSE —
        # so the gate mirrors round 3c: a p64x64 baseline arm (the
        # headline counts), candidate cuts, and a deliberately-broken
        # control (p16x16) that must degrade for the fixture to have
        # power on this axis.
        v = dataclasses.replace(
            variant_model(base, f"grid-s64-n{n_final}-cap4x"),
            num_proposal_samples_per_ray=(p1, p2),
        )
        return v
    if storage == "grid-s64-cap4x":
        # grid-s64 with 4x the shared table rows (log2 +2). NOT matched
        # params — this is the capacity direction: the cap16 probe measured
        # it FREE at the fused profile (846 vs 852 ms/step), so if quality
        # is >= grid-s64 it directly buys down QUALITY.md's tile-scale
        # capacity caveat at zero cost.
        v = variant_model(base, "grid-s64")
        return dataclasses.replace(
            v, log2_hashmap_size=v.log2_hashmap_size + 2,
        )
    m = re.fullmatch(r"shared-raw-cap(\d+)x", storage)
    if m:
        # `shared` (the UN-rebalanced 6x2 level split) with N x the table
        # rows in both main and proposal tables. Attribution arm for the
        # dense-fixture study: shared-capNx confounds two axes (leaf
        # sharing + the halve-levels/double-features rebalance); this arm
        # scales capacity while keeping corner's exact level/feature
        # split, so a depth-RMSE gap that persists here is a sharing/
        # collision effect and one that vanishes is a rebalance effect.
        mult = int(m.group(1))
        extra = mult.bit_length() - 1
        assert 1 << extra == mult, "capNx must be a power of two"
        v = variant_model(base, "shared")
        return dataclasses.replace(
            v, log2_hashmap_size=v.log2_hashmap_size + extra,
            proposal_net_args_list=tuple(
                dict(a, log2_hashmap_size=a["log2_hashmap_size"] + extra)
                for a in v.proposal_net_args_list
            ),
        )
    m = re.fullmatch(r"shared-cap(\d+)x", storage)
    if m:
        # shared-rebalanced with N x the table rows (log2 + log2 N) in BOTH
        # the main and proposal tables. NOT matched params — the capacity
        # axis of the dense-fixture collision study: shared capacity is
        # measured near-free on TPU (PERFORMANCE.md cap probes), so if
        # scaling it closes the corner-vs-shared gap the demo-cap caveat is
        # bought down at known cost.
        mult = int(m.group(1))
        extra = mult.bit_length() - 1
        assert 1 << extra == mult, "capNx must be a power of two"
        v = variant_model(base, "shared-rebalanced")
        return dataclasses.replace(
            v, log2_hashmap_size=v.log2_hashmap_size + extra,
            proposal_net_args_list=tuple(
                dict(a, log2_hashmap_size=a["log2_hashmap_size"] + extra)
                for a in v.proposal_net_args_list
            ),
        )
    if storage == "prop-grid":
        # prop-lean + the cached-density-grid first proposal round
        # (fields/prop_field.py prop_grid_density): round 1 reads a dense
        # per-expert grid refreshed from the fine prop field instead of a
        # trained hash field. Quality question: does the coarse cached
        # histogram place round-2 samples well enough to hold PSNR/SSIM?
        return dataclasses.replace(
            variant_model(base, "prop-lean"),
            prop_grid_res=64,
        )
    if storage == "prop-lean":
        # shared-rebalanced + proposal encodings halved again (2 levels x
        # 4 features at the demo scale): same encoding width and parameter
        # count, HALF the proposal table gathers/scatters — proposal rounds
        # touch 2/3 of all samples, so this is the hottest row-count knob.
        # Proposal nets only need coarse density, so the multiresolution
        # ladder matters less than for the main field; this study gates it.
        return dataclasses.replace(
            base, hash_storage="shared", prop_shared_mlp=True,
            num_levels=base.num_levels // 2,
            features_per_level=base.features_per_level * 2,
            log2_hashmap_size=base.log2_hashmap_size - 2,
            proposal_net_args_list=tuple(
                dict(a, log2_hashmap_size=a["log2_hashmap_size"] - 2,
                     num_levels=max(2, (a["num_levels"] - 1) // 2),
                     features_per_level=a["features_per_level"] * 4)
                for a in base.proposal_net_args_list
            ),
        )
    raise ValueError(storage)


def param_count(params) -> int:
    import jax

    return sum(
        x.size for x in jax.tree_util.tree_leaves(params) if hasattr(x, "size")
    )


def run_variant(storage: str, iters: int, out_root: Path, eval_only: bool = False,
                seed: int = 42, experts: int = 0, batch: int = 0,
                data_dir: Path = None, save_every: int = 0):
    from ..configs.method_configs import method_configs
    from ..engine.evaluator import evaluate_images
    from ..engine.trainer import Trainer, eval_setup

    base_cfg = method_configs["synthetic-demo"]
    model = variant_model(base_cfg.pipeline.model, storage)
    model = dataclasses.replace(
        model,
        # Whole-image eval renders without remat; 2^15-ray chunks OOM a
        # 16 GB chip at this sample count.
        eval_num_rays_per_chunk=1 << 12,
        proposal_warmup=iters // 4,
        proposal_weights_anneal_max_num_iters=iters // 4,
        line_of_sight_start_step=iters // 4,
        line_of_sight_end_step=iters,
        line_of_sight_decay_steps=iters,
    )
    pipeline = base_cfg.pipeline
    if experts:
        pipeline = dataclasses.replace(
            pipeline,
            dataparser=dataclasses.replace(pipeline.dataparser,
                                           num_aabbs=experts))
    if batch:
        pipeline = dataclasses.replace(
            pipeline,
            datamanager=dataclasses.replace(
                pipeline.datamanager, train_num_rays_per_batch=batch))
    if data_dir is not None:
        pipeline = dataclasses.replace(
            pipeline,
            dataparser=dataclasses.replace(
                pipeline.dataparser, data_dir=data_dir,
                centroids_dir=data_dir / "centroids"))
    cfg = dataclasses.replace(
        base_cfg,
        max_num_iterations=iters,
        # The study's fixtures fit in HBM next to the demo-scale model;
        # staging them once (cached across arms/seeds in-process) keeps
        # the gate device-bound instead of host-link-bound.
        device_ray_store_mb=2048,
        steps_per_save=save_every if save_every else max(iters, 100),
        steps_per_eval_batch=0,
        steps_per_eval_image=10 ** 9,
        seed=seed,
        experiment_name=f"quality-{storage}-s{seed}",
        output_dir=out_root,
        timestamp="study",
        pipeline=dataclasses.replace(pipeline, model=model),
    )
    if eval_only:
        run_dir = cfg.run_dir()
        _, trainer = eval_setup(run_dir / "config.yml")
        wall = float("nan")
    else:
        trainer = Trainer(cfg)
        trainer.setup()
        t0 = time.perf_counter()
        trainer.train()
        wall = time.perf_counter() - t0
    n_params = param_count(trainer.state.params)
    metrics = evaluate_images(
        trainer.state.params, trainer.model_config, trainer.eval_cameras,
        trainer.eval_items, with_lpips=False, with_depth=True,
    )
    return dict(storage=storage, seed=seed, params=n_params, wall_s=wall,
                **metrics)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=500)
    parser.add_argument("--out", type=Path, default=Path("QUALITY.md"))
    parser.add_argument("--out-root", type=Path, default=Path("outputs/quality"))
    parser.add_argument("--variants", nargs="*", default=[
        "corner", "cell", "shared", "shared-rebalanced"])
    parser.add_argument("--eval-only", action="store_true",
                        help="re-evaluate existing study checkpoints")
    parser.add_argument("--seeds", type=int, nargs="*", default=[42],
                        help="one training run per seed per variant; the "
                             "report shows mean and min-max spread")
    parser.add_argument("--experts", type=int, default=0,
                        help="override the fixture's num_aabbs (e.g. 16 to "
                             "study the headline expert count)")
    parser.add_argument("--batch", type=int, default=0,
                        help="override train_num_rays_per_batch")
    parser.add_argument("--hard-fixture", action="store_true",
                        help="generate/use the harder synthetic fixture "
                             "(4 scenes x 16 frames, larger images) under "
                             "data/synthetic_hard")
    parser.add_argument("--save-every", type=int, default=0,
                        help="checkpoint every N steps during study training "
                             "(0 = only at the end) — insurance for "
                             "long-horizon arms against interrupted runs")
    parser.add_argument("--dense-fixture", action="store_true",
                        help="generate/use the dense-texture fixture (4 "
                             "scenes x 16 frames, 90x156, high-frequency "
                             "texture) under data/synthetic_dense — sized "
                             "to make demo-cap hash tables collide for the "
                             "capacity study")
    args = parser.parse_args(argv)

    from ..data.synthetic import generate_scene

    data_dir = None
    if args.dense_fixture:
        root = Path("data/synthetic_dense")
        if not (root / "centroids").exists():
            generate_scene(
                root,
                scene_names=("scene-0001", "scene-0002", "scene-0003",
                             "scene-0004"),
                num_frames=16, height=90, width=156, texture_detail=1.0,
            )
        data_dir = root
    elif args.hard_fixture:
        root = Path("data/synthetic_hard")
        if not (root / "centroids").exists():
            generate_scene(
                root,
                scene_names=("scene-0001", "scene-0002", "scene-0003",
                             "scene-0004"),
                num_frames=16, height=60, width=104,
            )
        data_dir = root
    else:
        root = Path("data/synthetic")
        if not (root / "centroids").exists():
            generate_scene(root)

    rows = []
    for storage in args.variants:
        for seed in args.seeds:
            print(f"=== training variant: {storage} seed {seed} "
                  f"({args.iters} iters)", flush=True)
            rows.append(run_variant(
                storage, args.iters, args.out_root, args.eval_only,
                seed=seed, experts=args.experts, batch=args.batch,
                data_dir=data_dir, save_every=args.save_every,
            ))
            r = rows[-1]
            print(f"    -> psnr={r['psnr']:.2f} ssim={r['ssim']:.3f} "
                  f"depth_rmse={r.get('depth_rmse', float('nan')):.3f} "
                  f"params={r['params']:,} wall={r['wall_s']:.0f}s", flush=True)
            assert -1.0 <= r["ssim"] <= 1.0, "SSIM out of range - corrupted eval"


    lines = [
        "# QUALITY — table-layout study (synthetic tile)",
        "",
        f"Held-out-image metrics after {args.iters} iterations of the",
        "synthetic-demo config at matched parameter count",
        "(presight_tpu/scripts/quality_study.py). Gates the -tpu profile:",
        "the TPU-first layouts must match the reference-exact corner",
        "layout's quality before they may be the bench headline.",
        "",
        "| layout | params | eval PSNR | eval SSIM | depth RMSE (m) | train wall |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        wall = "—" if r["wall_s"] != r["wall_s"] else f"{r['wall_s']:.0f}s"
        dr = f"{r['depth_rmse']:.3f}" if "depth_rmse" in r else "—"
        lines.append(
            f"| {r['storage']} (s{r['seed']}) | {r['params']:,} | "
            f"{r['psnr']:.2f} | {r['ssim']:.3f} | {dr} | {wall} |"
        )
    # Per-variant aggregate over seeds (mean and min-max spread) so
    # adopt/reject deltas can be compared against seed noise.
    by_variant = {}
    for r in rows:
        by_variant.setdefault(r["storage"], []).append(r)
    if any(len(v) > 1 for v in by_variant.values()):
        lines += ["", "| layout | seeds | PSNR mean (min-max) | "
                  "SSIM mean (min-max) | depth RMSE mean (min-max) |",
                  "|---|---|---|---|---|"]
        import numpy as _np

        for k, v in by_variant.items():
            ps = _np.asarray([x["psnr"] for x in v])
            ss = _np.asarray([x["ssim"] for x in v])
            ds = _np.asarray([x["depth_rmse"] for x in v
                              if "depth_rmse" in x])
            d = (f"{ds.mean():.3f} ({ds.min():.3f}-{ds.max():.3f})"
                 if len(ds) else "—")
            lines.append(
                f"| {k} | {len(v)} | {ps.mean():.2f} "
                f"({ps.min():.2f}-{ps.max():.2f}) | {ss.mean():.3f} "
                f"({ss.min():.3f}-{ss.max():.3f}) | {d} |"
            )
    lines += [
        "",
        "Variant definitions: corner = reference-exact iNGP rows; cell =",
        "one row per grid cell (8 corner sets, log2-3 for matched params);",
        "shared = per-level table leaves shared across experts (expert id",
        "mixed into the hash) + shared proposal MLP; shared-rebalanced =",
        "shared + the -tpu profile's halve-levels/double-features split.",
        "",
        "Caveat: the synthetic tile is small; real-tile (nuScenes) PSNR",
        "parity at 100k iters remains to be established once real data can",
        "be staged. The fixture exercises every loss and head end-to-end.",
    ]
    args.out.write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
