"""Grain-backed host input pipeline (process-parallel decode/augment).

The thread pipeline (data/pipeline.py) is the default; this wraps the same
dataset objects in a `grain.python.DataLoader` for process-level parallelism
— the Grain-style prefetched host pipeline SURVEY.md §3.5 #4 calls for when
CPU-bound augmentation (JPEG decode + numpy) would otherwise hit the GIL.
Selected with config `"data_pipeline": "grain"`; exposes the same iterator
contract (batch dicts with a `_valid` mask).

Sharding across hosts uses grain's ShardByJaxProcess, so a multi-host pod
reads disjoint sample shards without extra wiring.
"""
from __future__ import annotations

import numpy as np

from dualpixelface_tpu.data.pipeline import collate


class _RandomAccessAdapter:
    """Adapts our Loader objects (deterministic per (seed, epoch, index) RNG)
    to grain's RandomAccessDataSource protocol."""

    def __init__(self, dataset, seed: int):
        self.dataset = dataset
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index: int):
        rng = np.random.default_rng((self.seed, self.epoch, int(index)))
        try:
            return self.dataset.__getitem__(int(index), rng=rng)
        except TypeError:
            return self.dataset[int(index)]


class GrainPipeline:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 1,
        num_workers: int = 4,
        drop_last: bool = False,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0
        self._source = _RandomAccessAdapter(dataset, seed)

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        self._source.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        import grain.python as gp

        sampler = gp.IndexSampler(
            num_records=len(self.dataset),
            shard_options=gp.ShardByJaxProcess(drop_remainder=False),
            shuffle=self.shuffle,
            num_epochs=1,
            seed=(self.seed * 1000003 + self.epoch) % (2**31),
        )
        # explicit read threading: grain defaults to 16 reader threads even
        # with worker_count=0, which makes same-epoch re-iteration only
        # ULP-deterministic through shared native augmentation state
        n_threads = max(1, self.num_workers)
        loader = gp.DataLoader(
            data_source=self._source,
            sampler=sampler,
            operations=[],
            worker_count=self.num_workers,
            read_options=gp.ReadOptions(
                num_threads=n_threads,
                prefetch_buffer_size=max(n_threads, self.prefetch * self.batch_size),
            ),
        )
        buf = []
        for sample in loader:
            buf.append(sample)
            if len(buf) == self.batch_size:
                batch = collate(buf)
                batch["_valid"] = np.ones(self.batch_size, bool)
                yield batch
                buf = []
        if buf and not self.drop_last:
            pad = self.batch_size - len(buf)
            batch = collate(buf + [buf[-1]] * pad)
            batch["_valid"] = np.arange(self.batch_size) < (self.batch_size - pad)
            yield batch


def make_pipeline(option, dataset, training: bool, seed: int = 1):
    """Pipeline factory honoring config `data_pipeline` ('threads' default)."""
    kind = option.get("data_pipeline", "threads") if hasattr(option, "get") else "threads"
    kwargs = dict(
        batch_size=option.batch_size,
        shuffle=training,
        seed=seed,
        num_workers=option.workers,
        drop_last=training,
    )
    if kind == "grain":
        return GrainPipeline(dataset, **kwargs)
    from dualpixelface_tpu.data.pipeline import DataPipeline

    # per-process shard selection for multi-host pods (the thread-pipeline
    # twin of grain's ShardByJaxProcess)
    import jax

    return DataPipeline(
        dataset,
        shard_index=jax.process_index(),
        shard_count=jax.process_count(),
        **kwargs,
    )
