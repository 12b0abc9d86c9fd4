"""Process-wide JAX configuration: persistent compilation cache.

The flagship train step takes minutes to compile on the TPU toolchain;
caching compiled executables across processes makes reruns (bench, trainer
restarts, extraction) near-instant.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/jax_comp_cache")


def setup(cache_dir: str = _DEFAULT_CACHE_DIR) -> None:
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - older jax without these flags
        pass
