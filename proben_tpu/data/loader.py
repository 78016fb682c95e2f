"""Data loaders: infinite sharded training stream + sequential test loader
(reference ``detectron2/data/build.py:255,342`` and
``samplers/distributed_sampler.py``).

TPU-first design: the loader produces globally-batched numpy arrays with
static shapes; per-host sharding follows the ``TrainingSampler`` convention
(seeded infinite permutation stream, strided by host). Background threads
overlap host-side decode/augment with device compute (the reference's
worker-process pool equivalent — no process fork needed since decode releases
the GIL inside cv2)."""

from __future__ import annotations

import itertools
import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..structures.detections import GroundTruth
from .dataset_mapper import DatasetMapper


def collate(samples: Sequence[Dict]) -> Dict:
    """Stack mapped samples into one batch dict (jnp-convertible)."""
    import jax.numpy as jnp

    batch = {
        "image": np.stack([s["image"] for s in samples]),
        "image_size": np.stack([s["image_size"] for s in samples]),
        "gt": GroundTruth(
            boxes=jnp.asarray(np.stack([s["gt_boxes"] for s in samples])),
            classes=jnp.asarray(np.stack([s["gt_classes"] for s in samples])),
            valid=jnp.asarray(np.stack([s["gt_valid"] for s in samples])),
        ),
        "image_id": [s["image_id"] for s in samples],
        "orig_size": np.stack([s["orig_size"] for s in samples]),
        "file_name": [s["file_name"] for s in samples],
    }
    batch["image"] = jnp.asarray(batch["image"])
    batch["image_size"] = jnp.asarray(batch["image_size"])
    return batch


def training_index_stream(
    n: int, seed: int = 0, shard: int = 0, num_shards: int = 1, shuffle: bool = True
) -> Iterator[int]:
    """Infinite epoch-less index stream, strided per host
    (reference ``TrainingSampler``)."""
    rng = np.random.RandomState(seed)
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        yield from order[shard::num_shards]


class TrainLoader:
    """Infinite training loader with threaded prefetch."""

    def __init__(
        self,
        dataset_dicts: List[dict],
        mapper: DatasetMapper,
        batch_size: int,
        seed: int = 0,
        shard: int = 0,
        num_shards: int = 1,
        num_workers: int = 4,
        prefetch: int = 4,
    ):
        self.dataset_dicts = dataset_dicts
        self.mapper = mapper
        self.batch_size = batch_size
        self._indices = training_index_stream(
            len(dataset_dicts), seed, shard, num_shards
        )
        self._lock = threading.Lock()
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, num_workers))
        ]
        for t in self._threads:
            t.start()

    def _next_batch_indices(self) -> List[int]:
        with self._lock:
            return [next(self._indices) for _ in range(self.batch_size)]

    def _worker(self):
        while not self._stop.is_set():
            idxs = self._next_batch_indices()
            samples = [self.mapper(self.dataset_dicts[i]) for i in idxs]
            batch = collate(samples)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self) -> Dict:
        return self._q.get()

    def close(self):
        self._stop.set()


def build_test_loader(
    dataset_dicts: List[dict],
    mapper: DatasetMapper,
    batch_size: int = 1,
    shard: int = 0,
    num_shards: int = 1,
) -> Iterator[Dict]:
    """Sequential eval loader (reference ``InferenceSampler``: exact split,
    each sample exactly once). The final short batch is padded by repeating
    the last sample; consumers use len(batch['image_id']) real entries via
    the 'num_real' field."""
    shard_dicts = dataset_dicts[shard::num_shards]
    for i in range(0, len(shard_dicts), batch_size):
        chunk = shard_dicts[i : i + batch_size]
        real = len(chunk)
        while len(chunk) < batch_size:
            chunk = chunk + [chunk[-1]]
        samples = [mapper(d) for d in chunk]
        batch = collate(samples)
        batch["num_real"] = real
        yield batch
