"""Benchmark: flagship train-step throughput (rays/s) on the attached TPU.

Baseline (BASELINE.md): the reference trains one city tile at ~91k rays/s on
one A100 (65,536 rays/batch, 100k iters, ~20 h). North star: >= 57k
rays/s/chip on TPU v5e.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from presight_tpu.utils.jax_setup import setup as _setup_jax

_setup_jax()

BASELINE_RAYS_PER_SEC = 91_022.0  # 65536 * 100000 / 72000s, 1x A100

# The shipped -tpu profile's rung (ladder[0]); the drift-guard test pins
# bench.build(HEADLINE) to the -tpu method configs.
HEADLINE = "grid-n48-cap4x-p64x32"


def build(num_experts: int, log2_hashmap_size: int, num_rays: int, storage: str = "corner"):
    import jax
    import jax.numpy as jnp

    from presight_tpu.data.cameras import CameraParams
    from presight_tpu.engine import (
        OptimizerGroupConfig,
        StepScalars,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from presight_tpu.models import NerfactoNuscMSConfig, init_model, param_groups

    pose_rescale = 0.05
    common = dict(
        near_plane=0.1 * pose_rescale,
        far_plane=1000.0 * pose_rescale,
        piecewise_sampler_threshold=100.0 * pose_rescale,
        pose_scale_factor=pose_rescale,
    )
    if storage in ("grid-n48-cap4x", "grid-n48-cap4x-p64x32",
                   "cap-log2-19"):
        # grid-lean4-s64 + 48 final samples + 4x shared main-table rows
        # (QUALITY gates 'grid-s64-n48'/'-cap4x'/both combined, plus the
        # corrected final-quadrature sweep with the n12 sensitivity
        # control — QUALITY.md round 3c). ~77% of the fused step scales
        # with the final count; the capacity bump measured free.
        # The -p64x32 variant (round-4 headline) additionally cuts the
        # SECOND proposal round 64 -> 32: the round-4 proposal-quadrature
        # sweep showed the round-2 axis is quality-free down to 32 (depth
        # RMSE 3.95-3.97 vs the 3.89-4.03 baseline band over 3-5 seeds)
        # while round-1 cuts cost depth (p32x64 +0.43 m disjoint; the
        # p16x16 control +1.65 m) — QUALITY.md round 4.
        # 'cap-log2-19' is the DEPLOY-CAPACITY rung: the identical headline
        # architecture with tile-scale shared tables (2^19 rows/level, the
        # regime of the reference's deployed 10x2^20x4-per-expert field) —
        # served by the TableGradTape sparse-gradient scan (train_step) and
        # microbatch 4096 (PERFORMANCE.md round-4/5 capacity sweeps).
        config = NerfactoNuscMSConfig(
            hash_storage="shared", prop_shared_mlp=True, remat=False,
            log2_hashmap_size=19 if storage == "cap-log2-19" else 17,
            num_levels=4,
            features_per_level=10,
            prop_grid_res=64,
            num_proposal_samples_per_ray=(
                (64, 64) if storage == "grid-n48-cap4x" else (64, 32)),
            num_nerf_samples_per_ray=48,
            proposal_net_args_list=(
                dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                     base_res=16, max_res=1024),
                dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                     base_res=16, max_res=4096),
            ),
            **common,
        )
    elif storage == "grid-lean4-s64":
        # grid-lean4 + 64 first-round samples (QUALITY gate 'grid-s64'):
        # the cached 64^3 grid's histogram is band-limited by the grid
        # resolution, so 128 stratified samples oversample it; 64 halves
        # the largest per-step row count.
        config = NerfactoNuscMSConfig(
            hash_storage="shared", prop_shared_mlp=True, remat=False,
            log2_hashmap_size=15, num_levels=4,
            features_per_level=10,
            prop_grid_res=64,
            num_proposal_samples_per_ray=(64, 64),
            proposal_net_args_list=(
                dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                     base_res=16, max_res=1024),
                dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                     base_res=16, max_res=4096),
            ),
            **common,
        )
    elif storage == "grid-lean4":
        # grid-profile + the main-lean4 rebalance (QUALITY gate: quality
        # study 'grid-lean4' variant): 4 levels x 10 features — identical
        # 40-wide encoding and parameter count (4*2^15*80 == 5*2^15*64),
        # 20% fewer main-table rows and one fewer 17 ms backward scatter.
        config = NerfactoNuscMSConfig(
            hash_storage="shared", prop_shared_mlp=True, remat=False,
            log2_hashmap_size=15, num_levels=4,
            features_per_level=10,
            prop_grid_res=64,
            proposal_net_args_list=(
                dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                     base_res=16, max_res=1024),
                dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                     base_res=16, max_res=4096),
            ),
            **common,
        )
    elif storage == "grid-profile":
        # shared-profile + the cached-density-grid first proposal round
        # (fields/prop_field.py prop_grid_density): round 1 is one gather +
        # trilerp per sample from a per-expert 64^3 cell grid, no MLP, no
        # backward; the grid refreshes from the fine prop field every 128
        # steps (amortized into the reported rate).
        config = NerfactoNuscMSConfig(
            hash_storage="shared", prop_shared_mlp=True, remat=False,
            log2_hashmap_size=15, num_levels=5,
            features_per_level=8,
            prop_grid_res=64,
            proposal_net_args_list=(
                dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                     base_res=16, max_res=1024),
                dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                     base_res=16, max_res=4096),
            ),
            **common,
        )
    elif storage == "shared-profile":
        # The shipped -tpu method-config profile (configs/method_configs.py
        # _tpu_profile): 'shared' storage — per-level table leaves sized for
        # XLA's fast (<= 8 MB output) scatter regime, experts folded into
        # the hash, cell rows, 5 levels x 8 features.
        config = NerfactoNuscMSConfig(
            hash_storage="shared", prop_shared_mlp=True, remat=False,
            log2_hashmap_size=15, num_levels=5,
            features_per_level=8,
            proposal_net_args_list=(
                # 'prop-lean' (QUALITY.md): 2 levels x 4 features.
                dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                     base_res=16, max_res=1024),
                dict(features_per_level=4, log2_hashmap_size=16, num_levels=2,
                     base_res=16, max_res=4096),
            ),
            **common,
        )
    elif storage == "tpu-profile":
        # Round-1 -tpu profile (cell layout, flat table) kept for A/B.
        config = NerfactoNuscMSConfig(
            hash_storage="cell", log2_hashmap_size=16, num_levels=5,
            features_per_level=8,
            proposal_net_args_list=(
                dict(features_per_level=2, log2_hashmap_size=16, num_levels=4,
                     base_res=16, max_res=1024),
                dict(features_per_level=2, log2_hashmap_size=16, num_levels=4,
                     base_res=16, max_res=4096),
            ),
            **common,
        )
    else:
        # Cell storage packs 8 corner feature sets per row; log2-3 gives the
        # same parameter count as the corner layout at log2.
        log2_eff = log2_hashmap_size - 3 if storage == "cell" else log2_hashmap_size
        prop_log2 = 17 if storage == "cell" else 20
        config = NerfactoNuscMSConfig(
            log2_hashmap_size=log2_eff,
            proposal_net_args_list=(
                dict(features_per_level=1, log2_hashmap_size=prop_log2, num_levels=8,
                     base_res=16, max_res=1024),
                dict(features_per_level=1, log2_hashmap_size=prop_log2, num_levels=8,
                     base_res=16, max_res=4096),
            ),
            hash_storage=storage,
            **common,
        )
    rng = np.random.RandomState(0)
    centroids = (rng.randn(num_experts, 3) * 2).astype(np.float32)
    aabbs = np.stack([np.stack([c - 5.0, c + 5.0]) for c in centroids]).astype(np.float32)
    num_cameras, num_videos = 1536, 12
    params = init_model(jax.random.PRNGKey(0), config, aabbs, centroids,
                        num_cameras, num_videos)

    c2w = np.tile(np.eye(3, 4, dtype=np.float32)[None], (num_cameras, 1, 1))
    c2w[:, :3, 3] = rng.randn(num_cameras, 3).astype(np.float32)
    cameras = CameraParams(
        c2w=jnp.asarray(c2w),
        fx=jnp.full((num_cameras,), 800.0, jnp.float32),
        fy=jnp.full((num_cameras,), 800.0, jnp.float32),
        cx=jnp.full((num_cameras,), 400.0, jnp.float32),
        cy=jnp.full((num_cameras,), 225.0, jnp.float32),
        video_ids=jnp.asarray(rng.randint(0, num_videos, num_cameras).astype(np.int32)),
    )

    from presight_tpu.engine import TrainStepPair
    from presight_tpu.models import ProposalUpdateSchedule

    groups = {
        "proposal_networks": OptimizerGroupConfig(),
        "fields": OptimizerGroupConfig(),
    }
    tx = make_optimizer(groups, param_groups(params))
    state = init_train_state(params, tx)
    steps = TrainStepPair(
        config, tx, split_update=True,
        # 1024 measured fastest for the round-3 headline — the lighter
        # grid-s64 shapes moved the optimum far below round-2's 16384
        # (sweep: 16384 -> 55.7k, 4096 -> 57.9k, 1024 -> 71.8k, 256 ->
        # 56.9k rays/s; PERFORMANCE.md).
        microbatch_rays={"shared-profile": 16384, "grid-profile": 16384,
                         "grid-lean4": 16384, "grid-lean4-s64": 1024,
                         "grid-n48-cap4x": 1024,
                         "grid-n48-cap4x-p64x32": 1024,
                         # capacity rung: with the TableGradTape step-end
                         # reduction the per-microbatch table-grad cost is
                         # gone, so the headline's 1024-ray optimum holds
                         # at capacity too (PERFORMANCE.md round 5; round
                         # 4's mb-4096 guidance applied to the dense path).
                         "cap-log2-19": 1024,
                         "tpu-profile": 2048}.get(storage, 4096),
    )
    sched = ProposalUpdateSchedule(config)
    step_state = {"i": 1000}  # steady-state step counter (past warmup)

    from presight_tpu.models.nerfacto_ms import make_prop_grid

    grid_state = {"grid": make_prop_grid(params, config)}

    def refresh(state):
        if config.use_prop_grid:
            grid_state["grid"] = make_prop_grid(state.params, config)
        return grid_state["grid"]

    def step(state, cameras, batch, rng, scalars):
        i = step_state["i"]
        updated = sched.updated(i)
        out = steps(state, cameras, batch, rng, scalars,
                    stop_prop_grad=not updated, prop_grid=grid_state["grid"])
        sched.step_cb(i, updated)
        step_state["i"] = i + 1
        return out

    def batch_for(seed):
        r = np.random.RandomState(seed)
        return {
            "ray_index": jnp.asarray(np.stack([
                r.randint(0, num_cameras, num_rays),
                r.randint(0, 450, num_rays),
                r.randint(0, 800, num_rays),
            ], -1).astype(np.int32)),
            "rgb": jnp.asarray(r.rand(num_rays, 3).astype(np.float32)),
            "sky": jnp.asarray((r.rand(num_rays) > 0.9).astype(np.float32)),
            "depth": jnp.asarray((r.rand(num_rays) * 60).astype(np.float32)),
            "features": jnp.asarray(r.rand(num_rays, 64).astype(np.float32)),
        }

    scalars = StepScalars(
        anneal=jnp.asarray(1.0, jnp.float32),
        sigma=jnp.asarray(5.0, jnp.float32),
        los_mult=jnp.asarray(0.1, jnp.float32),
    )
    return step, state, cameras, batch_for, scalars, refresh, config


def bench_config(num_experts, log2_hashmap_size, num_rays, iters=20,
                 storage="corner", repeats=3):
    import jax

    step, state, cameras, batch_for, scalars, refresh, config = build(
        num_experts, log2_hashmap_size, num_rays, storage
    )
    key = jax.random.PRNGKey(0)
    batches = [batch_for(i) for i in range(6)]
    # Warmup / compile both schedule variants (prop grads on/off).
    for _ in range(7):
        key, sub = jax.random.split(key)
        state, metrics = step(state, cameras, batches[0], sub, scalars)
    _ = float(metrics["total_loss"])

    # Amortized grid-refresh cost: measure the refresh program separately
    # (it runs every prop_grid_update_every steps in training) and charge
    # refresh_dt / update_every to every step.
    refresh_overhead = 0.0
    if config.use_prop_grid:
        g = refresh(state)
        g.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            g = refresh(state)
        g.block_until_ready()
        refresh_dt = (time.perf_counter() - t0) / 3
        refresh_overhead = refresh_dt / max(config.prop_grid_update_every, 1)

    # Steady-state timing: steps chain through the donated TrainState, and a
    # real training loop fetches metrics at a logging cadence, not every
    # step — so we read a value every 4 steps and at the end. The final
    # fetch transitively forces every chained step (each step consumes the
    # previous step's state), so this measures device-bound throughput, not
    # the tunnel's per-dispatch round-trip (~hundreds of ms on this runtime,
    # and weather-dependent). Verified honest: per-step time is flat from
    # N=12 to N=24 (true pipelining, not queue absorption).
    rates = []
    loss = 0.0
    for _rep in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            key, sub = jax.random.split(key)
            state, metrics = step(state, cameras, batches[i % len(batches)], sub, scalars)
            if (i + 1) % 4 == 0:
                loss = float(metrics["total_loss"])
        loss = float(metrics["total_loss"])
        dt = (time.perf_counter() - t0) / iters + refresh_overhead
        rates.append(num_rays / dt)
    rates.sort()
    median = rates[len(rates) // 2]
    return median, rates, num_rays / median, loss


def bench_stage3_rungs():
    """Stage-3 inference FPS at reference scale (batch-1 fp32 — the
    reference's own published-FPS condition, README.md:29-43 — plus the
    occ batch-4 throughput rung that tracks the cost-volume tiling).
    Imported from scripts_dev/bench_stage3.py so the driver-captured bench
    and the dev script share one methodology (chained K-differencing)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench_stage3", Path(__file__).parent / "scripts_dev" / "bench_stage3.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = {}
    try:
        occ = mod.bench_occ(variants=("fp32", "batch4"))
        out["stage3_bevdet_occ_fps"] = round(occ["fp32"], 2)
        out["stage3_bevdet_occ_batch4_samples_per_sec"] = round(occ["batch4"], 2)
    except Exception as e:  # noqa: BLE001
        print(f"# stage3 occ bench failed: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr)
    for name, key in (
        ("smn_wcamprior_480_100x50_24e_randomdrop", "stage3_streammapnet_fps"),
        ("nusc_raster_wcamprior_480_100x50_24e_randomdrop",
         "stage3_bevformer_raster_fps"),
    ):
        try:
            fps = mod.bench_map(name, variants=("fp32",))
            out[key] = round(fps["fp32"], 2)
        except Exception as e:  # noqa: BLE001
            print(f"# stage3 {name} bench failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
    return out


def main():
    results = {}
    # The full ladder runs every round (no early break — a compile flake on
    # one rung must not silently change what the headline measures). The
    # headline is the -tpu method profile ('shared' storage); the corner
    # rung is the reference-exact table layout, reported alongside.
    ladder = [
        # Headline at the reference's real batch size (65,536 rays/step).
        (HEADLINE, 16, 15, 65536),
        # Fallback rung first so a headline compile flake falls back to the
        # same-scale round-3 profile, not the capacity rung.
        ("grid-n48-cap4x", 16, 15, 65536),
        # Deploy capacity: same architecture at tile-scale tables (2^19),
        # sparse table-gradient scan + microbatch 4096.
        ("cap-log2-19", 16, 19, 65536),
        ("corner", 8, 18, 4096),
    ]
    spreads = {}
    for storage, num_experts, log2, num_rays in ladder:
        try:
            big = storage in ("grid-n48-cap4x-p64x32", "grid-n48-cap4x",
                              "cap-log2-19", "grid-lean4-s64", "grid-lean4",
                              "grid-profile", "shared-profile")
            rays_per_sec, rates, step_time, loss = bench_config(
                num_experts, log2, num_rays,
                iters=12 if big else 6,
                storage=storage,
                repeats=3,
            )
            results[storage] = rays_per_sec
            spreads[storage] = rates
            print(
                f"# {storage} E={num_experts} log2={log2} rays={num_rays}: "
                f"{rays_per_sec:,.0f} rays/s median of {[f'{r:,.0f}' for r in rates]} "
                f"({step_time*1e3:.1f} ms/step, loss={loss:.3f})",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 - OOM/compile fallback
            print(f"# {storage} E={num_experts} log2={log2} rays={num_rays} failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            continue

    if not results:
        print(json.dumps({
            "metric": "train_rays_per_sec_per_chip", "value": 0.0,
            "unit": "rays/s", "vs_baseline": 0.0,
        }))
        return

    # The headline is the SHIPPED -tpu profile's rung (the drift-guard test
    # pins ladder[0] to the method configs), never a max over rungs: a max
    # could silently report a different architecture than the configs ship.
    # The previous round's gated profile is the fallback only if the primary
    # rung errored outright (OOM/compile flake), and the JSON names which
    # rung the number belongs to either way.
    headline_key = next(
        (k for k, *_ in ladder if k in results), None)
    best = results[headline_key]
    line = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "rays/s",
        "vs_baseline": round(best / BASELINE_RAYS_PER_SEC, 3),
        "headline_profile": headline_key,
    }
    if headline_key != ladder[0][0]:
        line["headline_is_fallback"] = True
    if "corner" in results:
        line["reference_exact_layout_rays_per_sec"] = round(results["corner"], 1)
    for k, v in results.items():
        if k not in (headline_key, "corner"):
            line[f"rung_{k}_rays_per_sec"] = round(v, 1)
    if headline_key in spreads and len(spreads[headline_key]) > 1:
        r = spreads[headline_key]
        line["spread_min_median_max"] = [round(r[0], 1), round(r[len(r) // 2], 1),
                                         round(r[-1], 1)]
    # Stage-3 inference rungs (VERDICT r4 item 6: regression-track the FPS
    # table in the driver-captured bench, same median-of-3 discipline).
    # Guarded: a stage-3 compile flake must never cost the headline line.
    try:
        line.update(bench_stage3_rungs())
    except Exception as e:  # noqa: BLE001
        print(f"# stage3 rungs failed: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
