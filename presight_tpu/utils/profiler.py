"""Named-span wall-clock profiler + JAX trace wrapper.

Reference spec: nerfstudio-0.3.3/nerfstudio/utils/profiler.py —
@time_function decorator / context manager (:59-131) aggregating per-span
wall-clock into a global table printed at exit (:134,197-226), plus a torch
profiler wrapper (:148-195). TPU equivalents: the same named-span API
(device work is made visible with block_until_ready by callers that need
exact numbers) and `jax.profiler.trace` for XLA-level traces viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict, Optional

_TOTALS: Dict[str, float] = defaultdict(float)
_COUNTS: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def time_span(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _TOTALS[name] += dt
        _COUNTS[name] += 1


def time_function(fn=None, *, name: Optional[str] = None):
    """Decorator recording wall-clock per call under `name` (or qualname)."""

    def wrap(f):
        span = name or f.__qualname__

        @functools.wraps(f)
        def inner(*args, **kwargs):
            with time_span(span):
                return f(*args, **kwargs)

        return inner

    if fn is not None:
        return wrap(fn)
    return wrap


def summary() -> str:
    lines = ["profiler summary (total s | calls | mean ms):"]
    for name in sorted(_TOTALS, key=lambda n: -_TOTALS[n]):
        tot, cnt = _TOTALS[name], _COUNTS[name]
        lines.append(f"  {name:<45s} {tot:9.3f} | {cnt:6d} | {tot / cnt * 1e3:8.2f}")
    return "\n".join(lines)


def reset() -> None:
    _TOTALS.clear()
    _COUNTS.clear()


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA profile viewable in TensorBoard (jax.profiler.trace)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
