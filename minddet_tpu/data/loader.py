"""Host data loader: sharded, shuffled, prefetched batches of padded arrays.

Replaces the reference's three loader stacks — ``ds.MindDataset`` +
python-multiprocessing map (``centernet/src/dataset.py:411-435``),
``ds.GeneratorDataset`` + ``DistributedSampler``
(``pointpillars/train.py:96-107``, ``loader/sampler.py:9-157``), and the
``collate_kitti`` per-batch map (``build_loader.py:15-120``) — with one
threaded pipeline: deterministic per-epoch shuffling, host sharding by
``jax.process_index`` (the DistributedSampler equivalent), a user decode_fn
per example, stack-collate to static shapes, and background prefetch so the
device never waits on python.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np


class DistributedSampler:
    """Deterministic epoch shuffling + host sharding + optional padding.

    Mirrors the reference's DistributedSampler semantics (shuffle with epoch
    seed, pad to equal shards, every host sees len(dataset)/num_shards items).
    """

    def __init__(
        self,
        num_examples: int,
        num_shards: int = 1,
        shard_id: int = 0,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.n = num_examples
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last

    def epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            rng.shuffle(idx)
        if self.drop_last:
            per = self.n // self.num_shards
            idx = idx[: per * self.num_shards]
        else:
            pad = (-len(idx)) % self.num_shards
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
        return idx[self.shard_id :: self.num_shards]


class GroupSampler:
    """Group-coherent batching + host sharding: every batch is drawn from one
    flag group (the reference's aspect-ratio ``GroupSampler`` +
    ``DistributedGroupSampler``, det3d_ms/datasets/loader/sampler.py:34-157).

    ``flags``: one int per example (e.g. 0 = landscape, 1 = portrait). Each
    group is shuffled, padded to a multiple of ``batch_size`` by repeating its
    head, chunked into batches, and the batch blocks are permuted; shards
    receive whole batches round-robin so each host still sees group-pure
    batches.
    """

    def __init__(
        self,
        flags: Sequence[int],
        batch_size: int,
        num_shards: int = 1,
        shard_id: int = 0,
        seed: int = 0,
    ):
        self.flags = np.asarray(flags, np.int64)
        self.batch_size = batch_size
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.seed = seed

    def epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.RandomState(self.seed + epoch)
        batches = []
        for flag in np.unique(self.flags):
            idx = np.nonzero(self.flags == flag)[0]
            rng.shuffle(idx)
            pad = (-len(idx)) % self.batch_size
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
            batches.extend(idx.reshape(-1, self.batch_size))
        order = rng.permutation(len(batches))
        pad_b = (-len(batches)) % self.num_shards
        order = np.concatenate([order, order[:pad_b]]) if pad_b else order
        mine = order[self.shard_id :: self.num_shards]
        return np.concatenate([batches[i] for i in mine]) if len(mine) else (
            np.zeros(0, np.int64)
        )


def aspect_flags(hws: Sequence[Sequence[int]]) -> np.ndarray:
    """Image (h, w) list -> 0/1 landscape/portrait flags for GroupSampler
    (the reference flags by aspect ratio > 1, sampler.py:42)."""
    hw = np.asarray(hws)
    return (hw[:, 0] > hw[:, 1]).astype(np.int64)


def stack_collate(examples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack same-shaped example dicts into batch arrays."""
    keys = examples[0].keys()
    return {k: np.stack([e[k] for e in examples]) for k in keys}


class DataLoader:
    """dataset[int] -> decode_fn -> collate -> prefetch queue."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        decode_fn: Optional[Callable[[Dict], Dict]] = None,
        collate_fn: Callable = stack_collate,
        sampler: Optional[DistributedSampler] = None,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.decode_fn = decode_fn or (lambda x: x)
        self.collate_fn = collate_fn
        self.sampler = sampler or DistributedSampler(len(dataset))
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last

    def steps_per_epoch(self) -> int:
        n = len(self.sampler.epoch_indices(0))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield collated batches for one epoch with background workers."""
        indices = self.sampler.epoch_indices(epoch)
        n_batches = self.steps_per_epoch()
        if n_batches == 0:
            # without this, __iter__ spins over empty epochs forever and the
            # caller's next() hangs silently
            raise ValueError(
                f"dataset shard yields {len(indices)} examples — fewer than "
                f"batch_size={self.batch_size} with drop_last; shrink the "
                "batch or add data")
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        task_q: "queue.Queue" = queue.Queue()
        for bi, b in enumerate(batches):
            task_q.put((bi, b))
        results: Dict[int, Any] = {}
        lock = threading.Lock()
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    bi, b = task_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    exs = [self.decode_fn(self.dataset[int(i)]) for i in b]
                    batch = self.collate_fn(exs)
                except Exception as e:  # surface errors to the consumer
                    batch = e
                with lock:
                    results[bi] = batch

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            for bi in range(n_batches):
                while True:
                    with lock:
                        if bi in results:
                            batch = results.pop(bi)
                            break
                    stop.wait(0.002)
                if isinstance(batch, Exception):
                    raise batch
                yield batch
        finally:
            stop.set()

    def __iter__(self):
        epoch = 0
        while True:
            yield from self.epoch(epoch)
            epoch += 1
