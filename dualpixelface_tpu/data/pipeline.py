"""Batching, shuffling, and threaded host prefetch.

TPU-native replacement for the reference's torch DataLoader worker pool
(ref src/model/*/mainmodel.py train_dataloader, num_workers=opt.workers,
SURVEY.md §3.1 device boundary #1): samples are decoded/augmented by a
thread pool, collated into channels-last numpy batches, and prefetched a few
batches ahead so the accelerator never waits on host IO. Device placement is
a single `jax.device_put(batch, sharding)` against the `data`-axis
NamedSharding (device boundary #2 — one fused H2D per batch).

Determinism: sample i of epoch e draws augmentation randomness from
default_rng(hash(seed, e, i)) — reproducible regardless of worker timing,
unlike the reference's global-RNG worker processes.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_STRING_KEYS = ("groupname", "pathname")


def collate(samples: list[dict]) -> dict:
    """Stack a list of sample dicts into one batch dict."""
    batch: dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key in _STRING_KEYS:
            batch[key] = vals
        else:
            batch[key] = np.stack([np.asarray(v) for v in vals], 0)
    return batch


def numeric_batch(batch: dict) -> dict:
    """Drop host-only string fields before device placement."""
    return {k: v for k, v in batch.items() if k not in _STRING_KEYS}


class DataPipeline:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 1,
        num_workers: int = 4,
        drop_last: bool = False,
        prefetch: int = 2,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0
        # multi-host sharding: each jax process reads a disjoint strided
        # slice of the (seed, epoch)-deterministic global order — the
        # DistributedSampler semantics the reference gets from PL DDP.
        # All hosts share the same permutation (same seed), so shards are
        # disjoint by construction.
        assert 0 <= shard_index < shard_count, (shard_index, shard_count)
        self.shard_index = shard_index
        self.shard_count = shard_count

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self._order())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.default_rng((self.seed, self.epoch)).permutation(n)
        else:
            order = np.arange(n)
        if self.shard_count > 1:
            order = order[self.shard_index :: self.shard_count]
        return order

    def _get(self, index: int) -> dict:
        rng = np.random.default_rng((self.seed, self.epoch, int(index)))
        try:
            return self.dataset.__getitem__(int(index), rng=rng)
        except TypeError:
            return self.dataset[int(index)]

    def __iter__(self):
        order = self._order()
        n_batches = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(n_batches):
                        if stop.is_set():
                            return
                        idx = order[b * self.batch_size : (b + 1) * self.batch_size]
                        samples = list(pool.map(self._get, idx))
                        if len(samples) < self.batch_size and not self.drop_last:
                            pad = self.batch_size - len(samples)
                            samples = samples + [samples[-1]] * pad
                            batch = collate(samples)
                            batch["_valid"] = np.arange(self.batch_size) < (self.batch_size - pad)
                        else:
                            batch = collate(samples)
                            batch["_valid"] = np.ones(self.batch_size, bool)
                        q.put(batch)
                q.put(None)
            except BaseException as e:  # propagate worker failures to consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
