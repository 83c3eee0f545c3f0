"""Minimal batching loader with per-host sharding and device prefetch.

Replaces ``torch.utils.data.DataLoader`` for the numpy datasets: shuffling,
fixed-size collation and (for multi-host pods) deterministic sharding of
the example stream by ``jax.process_index()`` over DCN, so each host feeds
only its local devices (SURVEY.md §2.7 TPU translation of the reference's
single-process DataParallel scatter).

Ragged full-resolution chamfer clouds (ACD 4-tuples) are collated to a
fixed ``chamfer_npoints`` by resampling with replacement — the reference
relies on every ``.npy`` having the same resolution and then resamples
2048 of the first 5000 on the fly (``train_partseg_shapenet.py:441``).
"""

from typing import Iterator, Sequence

import numpy as np


def shard_for_host(indices: np.ndarray, process_index: int,
                   process_count: int) -> np.ndarray:
    """Static round-robin shard of an index stream for one host."""
    return indices[process_index::process_count]


def _resample(points: np.ndarray, n: int,
              rng: np.random.Generator) -> np.ndarray:
    if points.shape[0] == n:
        return points
    # subsample without replacement (unbiased; a prefix would permanently
    # drop ordered tails, e.g. ACD files sorted by component), upsample
    # with replacement
    choice = rng.choice(points.shape[0], n,
                        replace=points.shape[0] < n)
    return points[choice]


class DataLoader:
    """Iterates a dataset in collated numpy batches.

    Args:
        dataset: indexable with ``__len__``; items are tuples of arrays.
        batch_size: global per-host batch size.
        shuffle: reshuffle each epoch with the loader's rng.
        drop_last: drop the trailing partial batch (default True — static
            shapes; the reference instead papers over DataParallel arity
            crashes with try/except, ``train_partseg_shapenet.py:386-389``).
        chamfer_npoints: fixed collation size for ragged element 1 of ACD
            4-tuples (None = items are already fixed-size).
        process_index/process_count: multi-host sharding of the stream.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, seed: int = 0,
                 chamfer_npoints: int | None = None,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.chamfer_npoints = chamfer_npoints
        self.process_index = process_index
        self.process_count = process_count
        self.rng = np.random.default_rng(seed)
        self._seed = seed
        self._epoch = 0

    def __len__(self):
        n = len(shard_for_host(np.arange(len(self.dataset)),
                               self.process_index, self.process_count))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _collate(self, items: Sequence[tuple]) -> tuple:
        cols = list(zip(*items))
        out = []
        for ci, col in enumerate(cols):
            col = list(col)
            if self.chamfer_npoints is not None and ci == 1:
                col = [_resample(c, self.chamfer_npoints, self.rng)
                       for c in col]
            out.append(np.stack(col))
        return tuple(out)

    def __iter__(self) -> Iterator[tuple]:
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            # epoch-dependent shuffle shared by all hosts (same seed), so
            # the round-robin shard is disjoint and exhaustive
            epoch_rng = np.random.default_rng(
                self._seed * 100003 + self._epoch)
            epoch_rng.shuffle(indices)
        self._epoch += 1
        indices = shard_for_host(indices, self.process_index,
                                 self.process_count)
        for start in range(0, len(indices), self.batch_size):
            batch_idx = indices[start:start + self.batch_size]
            if self.drop_last and len(batch_idx) < self.batch_size:
                return
            yield self._collate([self.dataset[int(i)] for i in batch_idx])
