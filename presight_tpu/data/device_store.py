"""Device-resident ray stores: per-step batch VALUES live in HBM and only
tiny index arrays cross the host link.

Two granularities, picked automatically by the Trainer:
  * DeviceRayStore — the whole per-pixel dataset staged once (datasets
    under the cap); per-step batches gather rows on-device by ray_index.
  * ChunkDeviceStore — deploy scale: the active 512-image chunk's sampled
    rows staged, next chunk double-buffered behind training, 4 bytes/ray
    per step over the link. Real tiles (hundreds of GB of pixel rows with
    64-d features) train through this path.

Motivation (TPU-native data path): the host chunk pipeline ships every
batch's VALUES over the host->device link — ~1.2 MB per 4096-ray batch
with 64-dim DINO features. On a remote-attached chip (or any link where
bandwidth rather than latency dominates) that per-step copy can exceed
the train step itself. Every chunk row value is a pure per-pixel function
of (camera, v, u) (dataset.py ``_load_one``: resized rgb, sky-from-seg,
depth, nearest-resized features), so for datasets that fit in HBM the
values can live on device and each step ships only the 12-byte/ray
``ray_index``. The gathered batch tensors are bitwise identical to the
host path's rows (tests/test_device_store.py asserts this) and the
host-side sampling stream (chunk choice, masking, subsample, shuffle) is
untouched.

Reference analog: none — the reference's DataLoader keeps pixel values on
host and pays the PCIe copy per batch (my_datamanager.py:66-346). This is
a transfer-layout optimization, not a sampling change.

Under a ``("data",)`` mesh the store tensors are REPLICATED across the
mesh (they are capped at device_ray_store_mb ≪ HBM) and only
``ray_index`` is host-sharded on the batch axis; each device gathers its
batch shard from its full local copy, so the per-step gather needs zero
ICI traffic and the link still carries only 12 bytes/ray. This is the
mesh analog of the reference's per-rank DistributedSampler slicing
(my_datamanager.py:206-219): every chip sees exactly its shard of the
global batch, bitwise-identical to what shard_batch of the host
pipeline's values would have placed there.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from . import constants as K


def _pad_rows_pow2(n: int, multiple: int = 1 << 16) -> int:
    """Round a chunk's row count up to a power-of-two multiple so one
    compiled gather program serves every chunk (chunk sizes vary with the
    per-image masking)."""
    units = max(1, -(-n // multiple))
    return (1 << (units - 1).bit_length()) * multiple


class ChunkDeviceStore:
    """Chunk-granularity HBM staging for datasets that exceed the
    whole-dataset DeviceRayStore cap.

    The reference bounds its working set with 512-image chunks
    (my_dataset.py:165-191) — a real tile's full pixel table is hundreds of
    GB and can never live in HBM. The TPU-native analog: stage only the
    ACTIVE chunk's sampled pixel rows (rgb/sky/depth/features AND
    ray_index) on device, padded to a power-of-two row count so one
    compiled gather serves every chunk; each step then ships only the
    4-byte/ray chunk-local selection over the host link. The NEXT chunk's
    upload is double-buffered: DataManager's prefetch thread stages it
    right after loading, so the upload rides behind the current chunk's
    steps and rotation costs nothing. At most two chunks are ever resident.

    Batches are bitwise identical to the host path's ``data[k][sel]`` rows
    (tests/test_device_store.py asserts this). Under a ("data",) mesh the
    chunk tables replicate and ``sel`` is host-sharded on the batch axis,
    exactly like DeviceRayStore's ray_index."""

    def __init__(self, cap_mb: int, mesh=None):
        self.cap_bytes = cap_mb * 2 ** 20
        self.mesh = mesh
        self._staged: Dict[int, Dict] = {}   # chunk_id -> device arrays
        self._nrows: Dict[int, int] = {}
        self.enabled = True
        self._sel_sharding = None
        self._gathers: Dict[tuple, object] = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._rep = NamedSharding(mesh, P())
            self._sel_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))

    def _put(self, a: np.ndarray):
        import jax

        if self.mesh is not None:
            return jax.device_put(a, self._rep)
        return jax.device_put(a)

    def stage(self, chunk_id: int, data: Dict[str, np.ndarray]) -> bool:
        """Upload one chunk's rows (padded). Returns False (and disables
        the store for the run) when even a single padded chunk exceeds the
        cap — the caller falls back to host-value batches."""
        if not self.enabled:
            return False
        n = len(data[K.RGB])
        n_pad = _pad_rows_pow2(n)
        nbytes = sum(
            n_pad * int(np.prod(v.shape[1:], dtype=np.int64)) * v.dtype.itemsize
            for v in data.values()
        )
        # Double buffering keeps two chunks resident.
        if 2 * nbytes > self.cap_bytes:
            self.enabled = False
            self._staged.clear()
            return False
        staged = {
            k: self._put(np.pad(v, [(0, n_pad - n)] + [(0, 0)] * (v.ndim - 1)))
            for k, v in data.items()
        }
        self._staged[chunk_id] = staged
        self._nrows[chunk_id] = n
        return True

    def retain_only(self, chunk_ids) -> None:
        keep = set(chunk_ids)
        for cid in list(self._staged):
            if cid not in keep:
                del self._staged[cid]
                del self._nrows[cid]

    def has(self, chunk_id: int) -> bool:
        return chunk_id in self._staged

    def _gather_fn(self, keys: tuple):
        import jax

        fn = self._gathers.get(keys)
        if fn is None:
            def gather(sel, *tables):
                return {k: t[sel] for k, t in zip(keys, tables)}

            fn = jax.jit(gather)
            self._gathers[keys] = fn
        return fn

    def batch(self, chunk_id: int, sel: np.ndarray) -> Dict:
        import jax

        staged = self._staged[chunk_id]
        sel = np.asarray(sel, np.int32)
        if self._sel_sharding is not None:
            sel_dev = jax.device_put(sel, self._sel_sharding)
        else:
            sel_dev = jax.device_put(sel)
        keys = tuple(sorted(staged))
        return self._gather_fn(keys)(sel_dev, *(staged[k] for k in keys))


class DeviceRayStore:
    """Flat (sum HW, C) per-pixel tensors on device, indexed by
    ``(image_index * H + v) * W + u``."""

    # Staged stores keyed by dataset identity so successive Trainer
    # instances over the same data (e.g. quality-study arms) reuse one
    # upload instead of re-shipping ~100 MB per run.
    _cache: Dict[tuple, "DeviceRayStore"] = {}

    def __init__(self, items: List, load_features: bool, mesh=None):
        import jax
        import jax.numpy as jnp

        H, W = items[0].H, items[0].W
        n = max(it.image_index for it in items) + 1
        rgb = np.zeros((n, H * W, 3), np.float32)
        sky = np.zeros((n, H * W), np.float32)
        depth = np.zeros((n, H * W), np.float32)
        feat = None
        for it in items:
            i = it.image_index
            rgb[i] = it.load_image().reshape(-1, 3)
            seg = it.load_segmentation().reshape(-1)
            sky[i] = (seg == K.SKY_CLASS_ID).astype(np.float32)
            depth[i] = it.load_depth().reshape(-1)
            if load_features:
                f = it.load_features().astype(np.float32)
                f = f.reshape(-1, f.shape[-1])
                if feat is None:
                    feat = np.zeros((n, H * W, f.shape[-1]), np.float32)
                feat[i] = f
        self.H, self.W = H, W
        self.mesh = mesh
        self._idx_sharding = None
        put = jax.device_put
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self._idx_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
            put = lambda a: jax.device_put(a, rep)  # noqa: E731
        self.rgb = put(rgb.reshape(-1, 3))
        self.sky = put(sky.reshape(-1))
        self.depth = put(depth.reshape(-1))
        self.features = (
            put(feat.reshape(-1, feat.shape[-1]))
            if feat is not None else None
        )
        # The store tensors are jit ARGUMENTS, never closures: closed-over
        # arrays are embedded as compile-request constants, and on a
        # remote-compile runtime a multi-hundred-MB store blows the
        # request-size limit (HTTP 413). Passing device-resident arrays
        # as arguments costs nothing.
        def gather(rgb, sky, depth, feat, ray_index):
            flat = (ray_index[:, 0] * H + ray_index[:, 1]) * W \
                + ray_index[:, 2]
            batch = {
                "ray_index": ray_index,
                "rgb": rgb[flat],
                "sky": sky[flat],
                "depth": depth[flat],
            }
            if feat is not None:
                batch["features"] = feat[flat]
            return batch

        # Under a mesh the batch-axis sharding of the output follows the
        # sharded ray_index input through the gather automatically (the
        # tables are replicated operands), so no out_shardings pin is
        # needed — asserted bitwise in tests/test_device_store.py.
        self._gather = jax.jit(gather)
        self._gather_nofeat = jax.jit(lambda rgb, sky, depth, idx:
                                      gather(rgb, sky, depth, None, idx))

    def batch(self, ray_index: np.ndarray, with_features: bool) -> Dict:
        import jax
        import jax.numpy as jnp

        if self._idx_sharding is not None:
            # Host-sharded staging: each device receives ONLY its slice of
            # the 12-byte/ray index array over the host link.
            idx = jax.device_put(np.asarray(ray_index), self._idx_sharding)
        else:
            idx = jnp.asarray(ray_index)
        if with_features:
            return self._gather(self.rgb, self.sky, self.depth,
                                self.features, idx)
        return self._gather_nofeat(self.rgb, self.sky, self.depth, idx)

    @classmethod
    def maybe_build(cls, items: List, load_features: bool,
                    cap_mb: int, mesh=None) -> Optional["DeviceRayStore"]:
        """Build (or fetch from cache) iff every image shares one (H, W)
        and the staged tensors fit under ``cap_mb``."""
        if not items or cap_mb <= 0:
            return None
        H, W = items[0].H, items[0].W
        if any(it.H != H or it.W != W for it in items):
            return None
        feat_dim = 0
        if load_features:
            f0 = items[0].feature_path
            if f0 is None:
                load_features = False
            else:
                try:
                    if str(f0).endswith(".npz"):
                        # Probe the same key load_features() reads ("arr_0"
                        # for np.savez positional arrays), falling back to
                        # the first member only if absent.
                        with np.load(f0) as z:
                            name = "arr_0" if "arr_0" in z.files else z.files[0]
                            feat_dim = int(z[name].shape[-1])
                    else:
                        feat_dim = int(np.load(f0, mmap_mode="r").shape[-1])
                except Exception:
                    return None
        n = max(it.image_index for it in items) + 1
        size_mb = n * H * W * (3 + 1 + 1 + feat_dim) * 4 / 2 ** 20
        if size_mb > cap_mb:
            return None
        # (H, W, feat_dim) are part of the identity: the same files loaded
        # at a different image_downscale_factor must not hit a stale store
        # whose jitted gather bakes in the wrong stride.
        key = (tuple(str(it.image_path) for it in items), load_features,
               H, W, feat_dim,
               None if mesh is None else tuple(d.id for d in mesh.devices.flat))
        store = cls._cache.get(key)
        if store is None:
            store = cls(items, load_features, mesh=mesh)
            # Keep only the most recent store: each entry pins O(100 MB) of
            # HBM for the process lifetime, and iterating over distinct
            # datasets in one process would otherwise accumulate to OOM.
            cls._cache.clear()
            cls._cache[key] = store
        return store
