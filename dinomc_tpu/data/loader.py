"""Host -> device input pipeline: sharded sampling, prefetch, subsets.

TPU-native replacements for the reference's loader stack (SURVEY.md §2.2/2.9):
  * ``ShardedSampler`` — epoch-seeded shuffled index sharding per host, the
    ``DistributedSampler`` + ``set_epoch`` equivalent
    (``main_dino_mc.py:193,324-325``);
  * ``PrefetchLoader`` — background-thread batch assembly + device_put
    double-buffering, replacing the 10-worker fork pool + pinned-memory
    H2D copies (``main_dino_mc.py:195-201``). Because augmentation runs on
    device here, host work is only decode+resize;
  * ``InfiniteLoader`` — never-ending epoch-sharded iteration (reference
    ``InfiniteDataLoader``/``_RepeatSampler``, ``utils/data.py:33-48``);
  * ``random_subset`` — seeded fractional subset (``utils/data.py:27-30``,
    the BigEarthNet-10% path ``main_bigearthnet.py:88-90``).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence

import jax
import numpy as np


class ShardedSampler:
    """Deterministic per-epoch shuffle, sharded across hosts."""

    def __init__(
        self,
        n: int,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_shards: int = 1,
        shard_id: int = 0,
        seed: int = 0,
    ):
        self.n, self.batch_size = n, batch_size
        self.shuffle, self.drop_last = shuffle, drop_last
        self.num_shards, self.shard_id, self.seed = num_shards, shard_id, seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[np.ndarray]:
        order = np.arange(self.n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        # Pad to a multiple of num_shards by wrapping (torch
        # DistributedSampler's total_size semantics): every shard must yield
        # the SAME number of batches, else in multi-host SPMD the rank with
        # an extra batch blocks forever in its step's collectives.
        total = -(-self.n // self.num_shards) * self.num_shards
        if total != self.n:
            # np.resize tiles `order` as many times as needed — handles the
            # pad exceeding n (n < num_shards), where a single slice can't
            pad = np.resize(order, total - self.n)
            order = np.concatenate([order, pad])
        shard = order[self.shard_id :: self.num_shards]
        end = len(shard) - (len(shard) % self.batch_size if self.drop_last else 0)
        for s in range(0, end, self.batch_size):
            batch = shard[s : s + self.batch_size]
            if len(batch):
                yield batch

    def __len__(self) -> int:
        per_shard = -(-self.n // self.num_shards)
        if self.drop_last:
            return per_shard // self.batch_size
        return (per_shard + self.batch_size - 1) // self.batch_size


def random_subset(n: int, frac: float, seed: int = 42) -> np.ndarray:
    """Seeded fractional subset of range(n) (``utils/data.py:27-30``)."""
    rng = np.random.RandomState(seed)
    k = int(round(n * frac))
    return rng.permutation(n)[:k]


class PrefetchLoader:
    """Assemble batches in background threads, optionally device_put with a
    target sharding, keep ``prefetch`` batches in flight.

    ``num_threads`` fans the per-item ``dataset[i]`` fetches of each batch
    over a thread pool (order-preserving). Decode paths release the GIL —
    the native loader entirely, PIL/numpy partially — so this is the
    replacement for the reference's 10-process fork pool
    (``main_dino_mc.py:195-201``); measured host-IO rates are in
    docs/performance.md."""

    def __init__(
        self,
        dataset,
        sampler: ShardedSampler,
        collate: Optional[Callable[[list], np.ndarray]] = None,
        sharding=None,
        prefetch: int = 2,
        num_threads: int = 4,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.collate = collate or (lambda items: np.stack(items))
        self.sharding = sharding
        self.prefetch = prefetch
        self.num_threads = num_threads

    def __len__(self) -> int:
        return len(self.sampler)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that notices consumer abandonment (a producer
            # blocked forever on a full queue would leak per epoch)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        error: list = []
        pool = (
            ThreadPoolExecutor(self.num_threads) if self.num_threads > 1 else None
        )

        def fetch(idx) -> list:
            if pool is None:
                return [self.dataset[int(i)] for i in idx]
            return list(pool.map(self.dataset.__getitem__, [int(i) for i in idx]))

        def producer():
            try:
                for idx in self.sampler:
                    if stop.is_set():
                        return
                    items = fetch(idx)
                    batch = self.collate(items)
                    if self.sharding is not None:
                        if jax.process_count() > 1:
                            # multi-host: this process's batch is its shard
                            # of the global batch (ShardedSampler gave each
                            # host disjoint indices); device_put can't
                            # target non-addressable devices
                            batch = jax.make_array_from_process_local_data(
                                self.sharding, np.asarray(batch)
                            )
                        else:
                            batch = jax.device_put(batch, self.sharding)
                    if not put(batch):
                        return
            except BaseException as e:  # surface in the consumer, not stderr
                error.append(e)
            finally:
                if pool is not None:
                    pool.shutdown(wait=False)
                put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
            if error:
                raise error[0]
        finally:
            stop.set()


class InfiniteLoader:
    """Endless iteration; bumps the sampler epoch at each wrap so shuffling
    differs per pass (``InfiniteDataLoader`` parity, ``utils/data.py:33-48``)."""

    def __init__(self, loader: PrefetchLoader):
        self.loader = loader

    def __iter__(self):
        epoch = self.loader.sampler.epoch
        while True:
            for batch in self.loader:
                yield batch
            epoch += 1
            self.loader.sampler.set_epoch(epoch)
            if hasattr(self.loader.dataset, "set_epoch"):
                self.loader.dataset.set_epoch(epoch)
