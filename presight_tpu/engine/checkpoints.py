"""Checkpoint save/load with the reference's directory contract.

Reference spec: nerfstudio-0.3.3/nerfstudio/engine/trainer.py:396-460 —
`step-%09d.ckpt` files under `<run_dir>/nerfstudio_models/`, keep-latest-only
by default, containing step + pipeline + optimizers + schedulers + scaler;
and utils/eval_utils.py:68-110 (eval_setup: reload config.yml + latest
checkpoint). TPU-native: orbax-checkpoint of {params, opt_state, step};
schedules are pure functions of the step so they need no state; there is no
grad scaler. Directory layout matches the reference so extract_priors /
ns-eval find runs the same way.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import numpy as np


def _ckpt_dir(run_dir: Path) -> Path:
    return Path(run_dir) / "nerfstudio_models"


def save_checkpoint(run_dir: Path, step: int, state, keep_only_latest: bool = True) -> Path:
    """Save {params, opt_state, step} at step-%09d.ckpt (orbax dir)."""
    import orbax.checkpoint as ocp

    d = _ckpt_dir(run_dir)
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"step-{step:09d}.ckpt"
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": np.asarray(step, np.int32)}
    ckptr.save(path.absolute(), payload, force=True)
    ckptr.wait_until_finished()
    if keep_only_latest:
        for f in sorted(d.glob("step-*.ckpt")):
            if f != path and f.is_dir():
                # Only our own orbax checkpoint DIRECTORIES are rotated.
                # A plain step-*.ckpt FILE is a user-supplied reference
                # torch checkpoint (the warm-start import path below) —
                # possibly their only copy — and is never deleted here.
                import shutil

                shutil.rmtree(f, ignore_errors=True)
    return path


def latest_checkpoint(run_dir: Path) -> Optional[Path]:
    d = _ckpt_dir(run_dir)
    if not d.exists():
        return None
    ckpts = sorted(d.glob("step-*.ckpt"))
    return ckpts[-1] if ckpts else None


def load_checkpoint(path: Path, abstract_state,
                    model_config=None) -> Tuple[Dict, object, int]:
    """Restore (params, opt_state, step) matching an abstract/concrete
    template state (shape/dtype source).

    A reference PreSight checkpoint (a torch-pickle FILE, trainer.py:432-460)
    is detected by path type — ours are orbax DIRECTORIES — and imported via
    engine/import_reference.py, so eval_setup / ns-eval / ns-render /
    ns-extract-priors work directly on reference-trained runs: drop the
    reference's ``step-*.ckpt`` into ``<run_dir>/nerfstudio_models/`` next to
    one of OUR config.yml files (hash_storage='corner'). Optimizer state has
    no cross-framework mapping; the template's (fresh) state is returned, so
    training resume from a reference checkpoint is a warm start."""
    import orbax.checkpoint as ocp

    path = Path(path)
    if path.is_file():
        if model_config is None:
            raise ValueError(
                f"{path} is a reference torch checkpoint; importing it needs "
                "the model config (pass model_config=, as Trainer.setup does)"
            )
        from .import_reference import load_reference_checkpoint

        params, ckpt_step = load_reference_checkpoint(path, model_config)
        tpl = abstract_state.params
        if jax.tree_util.tree_structure(params) != \
                jax.tree_util.tree_structure(tpl):
            raise ValueError(
                "imported reference checkpoint does not match the model "
                "config's parameter tree (wrong config for this run?)")
        # Place each imported leaf where the template leaf lives (mesh
        # shardings under data-parallel setups, default device otherwise).
        def _place(x, t):
            s = getattr(t, "sharding", None)
            if isinstance(s, jax.sharding.Sharding):
                return jax.device_put(np.asarray(x), s)
            return jax.device_put(np.asarray(x))

        params = jax.tree_util.tree_map(_place, params, tpl)
        if ckpt_step is None:
            m = re.fullmatch(r"step-(\d+)\.ckpt", path.name)
            ckpt_step = int(m.group(1)) if m else 0
        return params, abstract_state.opt_state, ckpt_step

    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": abstract_state.params,
        "opt_state": abstract_state.opt_state,
        "step": np.asarray(0, np.int32),
    }
    # Orbax requires a concrete sharding on every abstract leaf; restore onto
    # the template's own sharding when it is a live jax.Array, else onto the
    # default device (single-chip eval_setup / cross-platform restore).
    default_sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def _abstract(x):
        if not hasattr(x, "dtype"):
            return x
        sharding = getattr(x, "sharding", None)
        if not isinstance(sharding, jax.sharding.Sharding):
            sharding = default_sharding
        return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sharding)

    abstract = jax.tree_util.tree_map(_abstract, template)
    restored = ckptr.restore(Path(path).absolute(), abstract)
    return restored["params"], restored["opt_state"], int(restored["step"])
