"""Data manager: chunk prefetch + fixed-size device batches.

Reference spec: nerfstudio-0.3.3/nerfstudio/data/PreSight/my_datamanager.py:
66-346. The reference double-buffers chunk loading in a
ThreadPoolExecutor(2) and slices batches with a torch DataLoader
(+DistributedSampler under DDP). Here: one background thread prefetches the
next chunk while the current one is consumed; batches are contiguous numpy
slices of a per-chunk shuffle, shipped to device by the caller (the train
loop overlaps host->device transfer with compute via jax's async dispatch).
Under a data-parallel mesh the global batch is simply sharded on the ray
axis (parallel/mesh.py) — no DistributedSampler needed in a single-
controller world.
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from . import constants as K
from .dataset import PixelChunk, PixelChunkDataset


@dataclasses.dataclass(frozen=True)
class DataManagerConfig:
    train_num_rays_per_batch: int = 65536
    eval_num_rays_per_batch: int = 8192
    images_per_chunk: int = 512
    chunk_ratio: float = 0.025
    group_balanced: bool = True
    load_features: bool = True
    mask_seg_classes: Tuple[str, ...] = K.DEFAULT_MASK_SEG_CLASSES
    num_threads: int = 8


class DataManager:
    """Streams fixed-size pixel batches from chunked image loading.

    ``chunk_store`` (optional data.device_store.ChunkDeviceStore): stage
    each prefetched chunk's rows in HBM from the prefetch thread (the
    upload double-buffers behind the current chunk's steps) and gather
    batches on-device — ``next_batch`` then returns device tensors and only
    the 4-byte/ray selection crosses the host link. Falls back to host
    values transparently if a chunk exceeds the store's cap."""

    def __init__(self, dataset: PixelChunkDataset, batch_size: int, seed: int = 0,
                 chunk_store=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.chunk_store = chunk_store
        self._executor = ThreadPoolExecutor(1)
        self._next_chunk: Optional[Future] = None
        self._chunk: Optional[PixelChunk] = None
        self._chunk_id: Optional[int] = None
        self._order: Optional[np.ndarray] = None
        self._cursor = 0
        self._chunk_step = seed

    def _schedule_next(self) -> None:
        step = self._chunk_step
        self._chunk_step += 1

        def load():
            chunk = self.dataset.load_chunk(step)
            if self.chunk_store is not None:
                # Upload from the prefetch thread: jax transfers are async,
                # so this rides behind the current chunk's train steps.
                self.chunk_store.stage(step, chunk.data)
            return step, chunk

        self._next_chunk = self._executor.submit(load)

    def _advance_chunk(self) -> None:
        if self._next_chunk is None:
            self._schedule_next()
        self._chunk_id, self._chunk = self._next_chunk.result()
        self._schedule_next()
        if self.chunk_store is not None:
            # Evict everything but the active chunk and the one being
            # prefetched — at most two chunks resident.
            self.chunk_store.retain_only({self._chunk_id, self._chunk_step - 1})
        rng = np.random.default_rng(self._chunk_step)
        self._order = rng.permutation(len(self._chunk))
        self._cursor = 0

    def next_batch(self) -> Dict[str, np.ndarray]:
        """Next fixed-size batch; advances to a fresh chunk when drained.
        Returns host numpy values, or device tensors when a chunk store is
        attached and holds the active chunk."""
        if self._chunk is None or self._cursor + self.batch_size > len(self._chunk):
            self._advance_chunk()
        sel = self._order[self._cursor : self._cursor + self.batch_size]
        self._cursor += self.batch_size
        if self.chunk_store is not None and self.chunk_store.has(self._chunk_id):
            return self.chunk_store.batch(self._chunk_id, sel)
        return {k: v[sel] for k, v in self._chunk.data.items()}

    def close(self) -> None:
        self._executor.shutdown(wait=False, cancel_futures=True)
