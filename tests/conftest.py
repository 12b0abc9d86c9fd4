"""Test configuration: run everything on an 8-device virtual CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

Note: the environment's sitecustomize pre-imports jax and pins
JAX_PLATFORMS=axon (the tunneled TPU); plain env vars are therefore not
enough — we must update the already-imported config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# PRESIGHT_NIGHTLY=1 runs the nightly-marked quality arm on the attached
# accelerator (tests/test_quality_nightly.py needs the real chip — 1500
# iters at batch 4096 is hours on CPU); everything else stays on the
# 8-device virtual CPU mesh.
if not os.environ.get("PRESIGHT_NIGHTLY"):
    jax.config.update("jax_platforms", "cpu")
