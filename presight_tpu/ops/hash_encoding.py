"""Multi-resolution hash-grid encoding (Instant-NGP), TPU-native.

Functional spec: the reference uses tiny-cuda-nn's HashGrid
(nerfstudio-0.3.3/nerfstudio/field_components/encodings.py:251-389, default
``tcnn+fp32``); the pure-torch fallback at encodings.py:324-384 is the precise
per-element formula we reproduce:

  * per-level resolutions: floor(min_res * growth**level) with
    growth = exp((ln max_res - ln min_res) / (L - 1))
  * spatial hash of integer corner (x, y, z):
    (x * 1) XOR (y * 2654435761) XOR (z * 805459861)  mod  table_size,
    plus level * table_size offset
  * trilinear interpolation over the 8 (ceil/floor) corners with weight
    ``offset`` on the ceil corner per axis, offset = scaled - floor(scaled).

Design notes (TPU):
  * The whole encoder is a single fused gather over one flat table; a
    leading *expert* axis for the multi-scene router folds into the same
    gather (index = expert*L*T + level*T + hash), so spatial model
    parallelism costs nothing extra here.
  * Hash arithmetic runs in uint32. Because table_size divides 2^32 and both
    XOR's low bits and products mod 2^k depend only on the operands' low
    bits, uint32 wraparound gives results identical to the reference's int64
    math modulo the table size.
  * Gradients (scatter-add into the table) are handled by XLA's gather
    transpose. A Pallas gather/scatter kernel was prototyped and MEASURED
    SLOWER than XLA on v5e (scalar-loop VMEM gather ~10.4 ns/row vs XLA's
    ~5.2; see PERFORMANCE.md round 2) — the winning design instead keeps
    every scatter output inside XLA's fast (<= ~8 MB) regime via the
    'shared' per-level table layout below.
"""

from __future__ import annotations

import contextlib
import dataclasses
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

_HASH_PRIMES = (1, 2654435761, 805459861)
# Fourth mixing constant for folding the expert id into the spatial hash in
# 'shared' storage (large odd constant, same family as the iNGP primes).
_EXPERT_PRIME = 3674653429

# The 8 trilerp corners in the reference's enumeration order
# (encodings.py:352-360): bit=1 selects ceil for that axis.
_CORNER_BITS = np.array(
    [
        [1, 1, 1],  # h0: (cx, cy, cz)
        [1, 0, 1],  # h1: (cx, fy, cz)
        [0, 0, 1],  # h2: (fx, fy, cz)
        [0, 1, 1],  # h3: (fx, cy, cz)
        [1, 1, 0],  # h4: (cx, cy, fz)
        [1, 0, 0],  # h5: (cx, fy, fz)
        [0, 0, 0],  # h6: (fx, fy, fz)
        [0, 1, 0],  # h7: (fx, cy, fz)
    ],
    dtype=np.int32,
)


@dataclasses.dataclass(frozen=True)
class HashEncodingConfig:
    """Static hash-grid hyperparameters (shapes must be trace-constant).

    ``storage`` selects the table layout:
      * 'corner' — reference-exact iNGP: one row per grid corner, 8 gathers
        per (sample, level) with trilinear blending (encodings.py:324-384).
      * 'cell'   — TPU-first: one row per grid *cell* holding all 8 corner
        feature sets (row = 8*F features), hashed on the floor coordinate.
        One gather per (sample, level) — 8x fewer row touches. Measured on
        v5e, XLA row-gather/scatter cost is per ROW regardless of row
        bytes, so this is ~8x on the dominant cost of training.
        Corners are not shared between adjacent cells (a local-patch
        parameterization, >= iNGP expressiveness at 8x params per entry;
        halve log2_hashmap_size for matched parameter count).
      * 'shared' — TPU-first round 2: cell rows, but each level's table is
        a SEPARATE parameter leaf of exactly `table_size` rows shared by
        all experts (the expert id mixes into the spatial hash instead of
        offsetting into per-expert slabs). Why: measured on v5e, XLA's
        scatter-add (the table-gradient op) runs ~16 ns/row when the
        output buffer is <= ~8 MB and 62-86 ns/row beyond — the backward
        pass of a big flat (E*L*T, F) table is 4-5x slower PER ROW than
        per-level slab tables that individually fit the fast regime.
        Size log2_hashmap_size so that table_size * 8F * 4B <= ~8 MB.
    """

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 1024
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    hash_init_scale: float = 1e-4  # tcnn init; torch fallback uses 1e-3
    storage: str = "corner"

    @property
    def table_size(self) -> int:
        return 2 ** self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def row_features(self) -> int:
        return self.features_per_level * (
            8 if self.storage in ("cell", "shared") else 1
        )

    def scalings(self) -> np.ndarray:
        """Per-level grid resolutions (float), matching encodings.py:281-284.

        The power/multiply runs in float32, reproducing the executed
        reference exactly: torch promotes the float growth factor against
        the int64 level tensor to the default float32 dtype, which changes
        boundary levels (e.g. 10 levels 16->16384 ends at 16384 in f32 but
        16383 in f64; caught by tests/goldens/hash_encoding.npz).
        """
        levels = np.arange(self.num_levels).astype(np.float32)
        if self.num_levels > 1:
            growth = np.exp(
                (np.log(self.max_res) - np.log(self.min_res)) / (self.num_levels - 1)
            )
        else:
            growth = 1.0
        return np.floor(
            (np.float32(self.min_res) * np.float32(growth) ** levels).astype(np.float32)
        ).astype(np.float32)


def init_hash_table(
    key: jax.Array, config: HashEncodingConfig, num_experts: int = 1, dtype=jnp.float32
):
    """U(-s, s) init of the table.

    'corner'/'cell': one flat array (E * L * T, row_features).
    'shared': a LIST of num_levels arrays (T, row_features) — separate
    parameter leaves so XLA emits one small fast scatter per level in the
    backward pass (see HashEncodingConfig.storage).

    tcnn initializes U(-1e-4, 1e-4); the torch fallback uses U(-1e-3, 1e-3)
    (encodings.py:313-316). ``hash_init_scale`` selects.
    """
    if config.storage == "shared":
        keys = jax.random.split(key, config.num_levels)
        return [
            (jax.random.uniform(k, (config.table_size, config.row_features), dtype=dtype)
             * 2.0 - 1.0) * config.hash_init_scale
            for k in keys
        ]
    n = num_experts * config.num_levels * config.table_size
    u = jax.random.uniform(key, (n, config.row_features), dtype=dtype)
    return (u * 2.0 - 1.0) * config.hash_init_scale


# Backward-scatter regime threshold, in bytes of the scatter OUTPUT (the
# gradient table). Measured on v5e (scripts_dev/probe_scatter_big.py,
# K-differenced): a 49k-row, 80-float scatter-add into a 2^17 x 80 table
# (42 MB) costs < 0.1 ms, while the SAME scatter into 2^19 x 80 (168 MB)
# costs 3.72 ms/app — XLA's scatter lowering leaves its fast regime
# somewhere between those sizes. Pre-sorting the indices cuts the big-table
# case to 1.30 ms (the argsort + gather of 49k rows is free at this size),
# but sorted scatter measured slightly SLOWER at small tables
# (scripts_dev/profile_scatter_variants.py), so the sorted backward only
# engages above this threshold. 64 MB sits between the two measured points.
_SORTED_GRAD_MIN_BYTES = 64 * 2**20

# Upper bound on scatter rows for the sorted backward. The argsort is free
# at the shared profile's row counts (49k-393k rows) but does NOT pay for
# itself at the corner layout's fused all-level gather (~15.7M rows/call:
# bench corner rung measured 3072 -> 4098 ms/step with sorting always on).
# 2^20 sits above every shared-profile row count (microbatch 8192 x 48
# samples = 393k) and well below the measured-regression regime.
_SORTED_GRAD_MAX_ROWS = 2**20


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_rows_sorted_grad(n_rows: int, tbl: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """tbl[idx] whose transpose scatter-adds in index-sorted order.

    Forward-identical to a plain gather. The backward argsorts the flat
    index vector, gathers the cotangent rows into sorted order, and
    scatter-adds with indices_are_sorted=True — 2.9x faster than XLA's
    default gather transpose once the gradient table exceeds the fast
    scatter regime (see _SORTED_GRAD_MIN_BYTES). Gradient values differ
    from the unsorted scatter only by float summation order.
    """
    return tbl[idx]


def _gather_rows_sorted_grad_fwd(n_rows, tbl, idx):
    return tbl[idx], idx


def _gather_rows_sorted_grad_bwd(n_rows, idx, g):
    flat_idx = idx.reshape(-1)
    flat_g = g.reshape(flat_idx.shape[0], g.shape[-1])
    order = jnp.argsort(flat_idx)
    grad_tbl = (
        jnp.zeros((n_rows, g.shape[-1]), g.dtype)
        .at[flat_idx[order]]
        .add(flat_g[order], indices_are_sorted=True)
    )
    return grad_tbl, np.zeros(idx.shape, dtype=jax.dtypes.float0)


_gather_rows_sorted_grad.defvjp(
    _gather_rows_sorted_grad_fwd, _gather_rows_sorted_grad_bwd
)


class TableGradTape:
    """Trace-time capture of big-table gather cotangents as explicit
    (indices, rows) pairs, instead of letting AD materialize a dense
    (T, F) gradient per microbatch.

    Why (v5e, PERFORMANCE.md round 4): at deploy table capacity
    (log2_hashmap_size >= 19) the microbatch scan's dense per-microbatch
    table gradients cost two ways — each gradient is an XLA scatter into a
    fresh (T, F) zeros buffer past the fast-scatter regime, and the scan
    carry then dense-ADDS the full table every microbatch (~86 GB of HBM
    traffic per step at 2^19). The tape removes both: the gather reads
    ``stop_gradient(tbl)[idx] + dummy`` where ``dummy`` is an explicit
    zeros input of the gathered-rows shape, so d(loss)/d(dummy) IS the
    cotangent row block, and the train step scatter-adds those rows
    straight into a bucketed gradient accumulator it carries through the
    scan (engine/train_step.py). Gradient values differ from plain AD only
    by float summation order.

    Protocol (all trace-time; the tape never outlives one trace):
      * ``register(key, leaf)`` — the train step registers each big table
        leaf (by object identity, which tracing preserves from the merged
        params pytree down to the ``table[l]`` the gather touches).
      * ``_gather_rows`` consults the active tape; on a match it consumes
        the next dummy for that key and records the flat gather indices in
        ``captured`` — the loss fn returns ``captured`` as aux so the
        indices are ordinary values at the caller's trace level.
      * Discovery mode (``dummies=None``): gathers run normally (plain
        stop-grad reads) while ``shapes`` records per-key row counts, so
        the caller can allocate the dummy inputs before the real trace.
    """

    def __init__(self, dummies: Optional[Dict[str, List[jnp.ndarray]]] = None):
        self._by_id: Dict[int, tuple] = {}
        self._dummies = dummies
        self._consumed: Dict[str, int] = {}
        self.shapes: Dict[str, List[tuple]] = {}
        self.captured: Dict[str, List[jnp.ndarray]] = {}

    def register(self, key: str, leaf) -> None:
        # The leaf ref is pinned in the value so a recycled id() can never
        # alias a dead object onto a registered key.
        self._by_id[id(leaf)] = (key, leaf)

    def match(self, tbl) -> Optional[str]:
        hit = self._by_id.get(id(tbl))
        return hit[0] if hit is not None and hit[1] is tbl else None

    def gather(self, key: str, tbl: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
        flat_idx = idx.reshape(-1)
        base = jax.lax.stop_gradient(tbl)[idx]
        self.captured.setdefault(key, []).append(flat_idx)
        if self._dummies is None:  # discovery pass
            self.shapes.setdefault(key, []).append(
                (int(flat_idx.shape[0]), int(tbl.shape[-1]))
            )
            return base
        i = self._consumed.get(key, 0)
        self._consumed[key] = i + 1
        dummy = self._dummies[key][i]
        return base + dummy.reshape(base.shape)


_ACTIVE_TAPE: Optional[TableGradTape] = None


@contextlib.contextmanager
def active_table_grad_tape(tape: TableGradTape):
    """Install ``tape`` for the duration of one trace (not thread-safe
    across concurrent traces; JAX traces a given function body serially)."""
    global _ACTIVE_TAPE
    prev = _ACTIVE_TAPE
    _ACTIVE_TAPE = tape
    try:
        yield tape
    finally:
        _ACTIVE_TAPE = prev


def _gather_rows(tbl: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather that picks the backward-scatter strategy by table size
    (sorted pays off only past the slow-scatter regime) and by row count
    (the argsort stops paying for itself at multi-million-row scatters).
    An active TableGradTape overrides both: registered tables get the
    dummy-capture read whose cotangent stays sparse."""
    if _ACTIVE_TAPE is not None:
        key = _ACTIVE_TAPE.match(tbl)
        if key is not None:
            return _ACTIVE_TAPE.gather(key, tbl, idx)
    if (
        tbl.shape[0] * tbl.shape[-1] * tbl.dtype.itemsize > _SORTED_GRAD_MIN_BYTES
        and idx.size <= _SORTED_GRAD_MAX_ROWS
    ):
        return _gather_rows_sorted_grad(tbl.shape[0], tbl, idx)
    return tbl[idx]


def trilerp_weights(offset: jnp.ndarray) -> jnp.ndarray:
    """In-cell offsets (..., 3) in [0, 1] -> (..., 8) trilinear corner
    weights in _CORNER_BITS order (bit=1 selects the +1 corner on that
    axis). Shared by hash_encode and the cached proposal grid so the corner
    enumeration can never drift between them."""
    bits = jnp.asarray(_CORNER_BITS)  # (8, 3)
    w = jnp.where(bits == 1, offset[..., None, :], 1.0 - offset[..., None, :])
    return w[..., 0] * w[..., 1] * w[..., 2]


def _raw_hash(corners: jnp.ndarray) -> jnp.ndarray:
    """Unmasked spatial hash of int coords (..., 3) -> uint32 (...,).

    uint32 wraparound arithmetic. Kept separate from the table-size mask so
    'shared' storage can XOR its expert mix into the full-width hash before
    masking — every storage layout hashes through this one function.
    """
    c = corners.astype(jnp.uint32)
    return (
        c[..., 0] * jnp.uint32(_HASH_PRIMES[0])
        ^ c[..., 1] * jnp.uint32(_HASH_PRIMES[1])
        ^ c[..., 2] * jnp.uint32(_HASH_PRIMES[2])
    )


def _hash_corners(corners: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Spatial-hash int32 corner coords (..., 3) -> flat index (...,) in
    [0, table_size)."""
    return (_raw_hash(corners) & jnp.uint32(table_size - 1)).astype(jnp.int32)


def hash_encode(
    table,
    positions: jnp.ndarray,
    config: HashEncodingConfig,
    expert_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Hash-grid lookup + trilinear interpolation.

    Args:
      table: (E * L * T, F) flat feature table for 'corner'/'cell' storage
        (E=1 when unrouted), or a list of L per-level (T, 8F) tables for
        'shared' storage.
      positions: (..., 3) in [0, 1].
      config: static hyperparameters.
      expert_ids: optional (...,) int32 expert assignment; selects the
        expert's slab of the table ('corner'/'cell') or mixes into the
        hash ('shared'). None means single-expert table.

    Returns:
      (..., L * F) encoded features, positions' dtype.
    """
    L = config.num_levels
    T = config.table_size
    F = config.features_per_level

    scalings = jnp.asarray(config.scalings())  # (L,)
    scaled = positions[..., None, :] * scalings[:, None]  # (..., L, 3)
    scaled_f = jnp.floor(scaled)
    offset = (scaled - scaled_f).astype(positions.dtype)  # (..., L, 3)
    fl = scaled_f.astype(jnp.int32)

    w = trilerp_weights(offset)  # (..., L, 8)

    if config.storage == "shared":
        # Per-level tables shared by all experts: the expert id mixes into
        # the hash so distinct experts' identical local coordinates do not
        # collide systematically. One gather per (sample, level), each
        # level's gradient scatter targets its own small parameter leaf.
        emix = None
        if expert_ids is not None:
            emix = expert_ids.astype(jnp.uint32) * jnp.uint32(_EXPERT_PRIME)
        outs = []
        for l in range(L):
            h = _raw_hash(fl[..., l, :])
            if emix is not None:
                h = h ^ emix
            idx = (h & jnp.uint32(T - 1)).astype(jnp.int32)
            rows = _gather_rows(table[l], idx).astype(positions.dtype)  # (..., 8*F)
            rows = rows.reshape(*rows.shape[:-1], 8, F)
            outs.append(jnp.sum(rows * w[..., l, :, None], axis=-2))  # (..., F)
        return jnp.concatenate(outs, axis=-1)

    level_offset = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]  # (L, 1)

    if config.storage == "cell":
        # One row per cell: hash the floor coordinate; the row carries all 8
        # corners' features in _CORNER_BITS order.
        idx = _hash_corners(fl, T) + level_offset[..., 0]  # (..., L)
        if expert_ids is not None:
            idx = idx + (expert_ids.astype(jnp.int32) * (L * T))[..., None]
        rows = _gather_rows(table, idx).astype(positions.dtype)  # (..., L, 8*F)
        rows = rows.reshape(*rows.shape[:-1], 8, F)
        out = jnp.sum(rows * w[..., None], axis=-2)  # (..., L, F)
        return out.reshape(*out.shape[:-2], L * F)

    ce = jnp.ceil(scaled).astype(jnp.int32)
    # (..., L, 8, 3): pick ceil where bit==1 else floor.
    corner_bits = jnp.asarray(_CORNER_BITS)  # (8, 3)
    corners = jnp.where(corner_bits[None, :, :] == 1, ce[..., None, :], fl[..., None, :])

    idx = _hash_corners(corners, T)  # (..., L, 8)
    idx = idx + level_offset
    if expert_ids is not None:
        idx = idx + (expert_ids.astype(jnp.int32) * (L * T))[..., None, None]

    feats = _gather_rows(table, idx)  # (..., L, 8, F)
    feats = feats.astype(positions.dtype)

    out = jnp.sum(feats * w[..., None], axis=-2)  # (..., L, F)
    return out.reshape(*out.shape[:-2], L * F)
