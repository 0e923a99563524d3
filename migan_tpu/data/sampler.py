"""Deterministic shard-aware samplers + a threaded prefetching batch loader.

Replaces the reference's DistributedSampler + torch DataLoader
(reference: lib/data_factory/common/ds_sampler.py:7-85, used at
lib/experiments/migan_default.py:271-295):

  - The reference makes the shuffle order identical across ranks by
    broadcasting a rank-0 randperm over NCCL (ds_sampler.py:77-85). Here all
    hosts derive the same permutation from the same integer seed — no
    collective needed.
  - `extend=True` pads to equal per-shard length for eval (ds_sampler.py:49-52).
  - The loader is a thread pool + bounded queue (replaces torch DataLoader
    worker processes; the work is PIL decode + numpy, which releases the GIL
    in the hot parts).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List

import numpy as np

from .factory import collate


class ShardSampler:
    """Rank-strided sampler with a seed-derived global permutation."""

    def __init__(self, dataset_len: int, num_shards: int = 1, shard: int = 0,
                 shuffle: bool = True, seed: int = 0, extend: bool = False):
        assert 0 <= shard < num_shards
        self.n = dataset_len
        self.num_shards = num_shards
        self.shard = shard
        self.shuffle = shuffle
        self.seed = seed
        self.extend = extend

    def epoch_indices(self, epoch: int = 0) -> np.ndarray:
        if self.shuffle:
            order = np.random.RandomState(self.seed + epoch).permutation(
                self.n)
        else:
            order = np.arange(self.n)
        if self.extend:
            # pad so every shard sees the same count (eval re-interleaving)
            pad = (-len(order)) % self.num_shards
            if pad:
                order = np.concatenate([order, order[:pad]])
        else:
            usable = (len(order) // self.num_shards) * self.num_shards
            order = order[:usable]
        return order[self.shard::self.num_shards]


class InfiniteSampler:
    """Endless shuffled index stream (training; reference misc.py:109-140
    capability, simplified to seed-derived reshuffling per pass).

    block: BLOCK-contiguous multi-process sharding. With ``block=b``,
    shard p of P yields exactly the global positions t of the
    single-process stream (``InfiniteSampler(n, seed=seed)``) for which
    ``(t // b) % P == p`` — i.e. process p owns the contiguous rows
    [p*b, (p+1)*b) of every global batch of P*b items. The union of all
    shards, re-interleaved block-wise, IS the single-process stream
    bit-for-bit (tests/test_multihost.py::
    test_block_sharded_stream_matches_single_process), which is what
    makes multi-process training row-for-row identical to
    single-process (train/loop.py). ``block=None`` keeps the legacy
    per-item rank striding of ShardSampler (used by eval's
    shard-extend protocol)."""

    def __init__(self, dataset_len: int, num_shards: int = 1, shard: int = 0,
                 seed: int = 0, block: int = None):
        self.inner = ShardSampler(dataset_len, num_shards, shard,
                                  shuffle=True, seed=seed)
        self.block = block
        if block is not None:
            assert block >= 1 and 0 <= shard < num_shards
            # the GLOBAL (single-process) stream this shard filters
            self._global = ShardSampler(dataset_len, 1, 0,
                                        shuffle=True, seed=seed)
            self.num_shards = num_shards
            self.shard = shard

    def __iter__(self) -> Iterator[int]:
        epoch = 0
        if self.block is None:
            while True:
                yield from self.inner.epoch_indices(epoch)
                epoch += 1
        b, P, p = self.block, self.num_shards, self.shard
        t = 0  # global stream position, continuous across epochs
        while True:
            for idx in self._global.epoch_indices(epoch):
                if (t // b) % P == p:
                    yield int(idx)
                t += 1
            epoch += 1


def _item_rng(seed: int, position: int) -> np.ndarray:
    """Per-item RandomState derived from (loader seed, global item
    position) — bit-reproducible regardless of worker count or thread
    scheduling. The reference relied on torch DataLoader's per-worker
    process seeding for the same property (its streams depended on
    num_workers; these don't even do that)."""
    return np.random.RandomState(
        np.array([seed, position], np.uint64).view(np.uint32))


class DataLoader:
    """Threaded prefetching batch loader over (dataset, indices).

    seed: when set (and the dataset advertises ``supports_rng``), each
    item is materialized with its own RandomState derived from
    (seed, global item position), so any RNG the dataset's formatters
    consume (mask synthesis, random flips, crops) is deterministic and
    independent of num_workers. When None (default), formatters fall back
    to the global ``np.random`` stream — the reference's single-process
    semantics, deterministic only at num_workers=1.

    start_position / position_stride / position_block: address this
    loader's items inside the GLOBAL item stream. The t-th item this
    loader yields sits at global position ``_position(t) =
    start_position + (t // position_block) * position_stride *
    position_block + (t % position_block)`` — i.e. the loader's stream
    is consumed in contiguous blocks of ``position_block`` items placed
    ``position_stride`` blocks apart. With the default
    ``position_block=1`` this is the legacy per-item striding
    ``start_position + t * position_stride``. A resumed run passes the
    items already consumed so per-item RNG continues at the same
    absolute positions (stream-exact resume; the caller fast-forwards
    `indices` to match). A block-sharded training run (train/loop.py)
    passes ``start_position=shard*local_bs, position_stride=num_shards,
    position_block=local_bs`` so shard p's j-th item of its b-th batch
    sits at global position ``b*global_bs + p*local_bs + j`` — no two
    shards share a mask/flip stream, and the union of all shards
    reproduces the single-process stream bit-exactly, row order
    included.
    """

    def __init__(self, dataset, batch_size: int, indices=None,
                 num_workers: int = 4, prefetch: int = 4,
                 drop_last: bool = True, seed=None, start_position: int = 0,
                 position_stride: int = 1, position_block: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = indices
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        if seed is not None and not getattr(dataset, "supports_rng", False):
            raise ValueError(
                f"seed given but {type(dataset).__name__} does not "
                "support per-item RNG (set supports_rng = True and "
                "accept __getitem__(idx, rng=...))")
        self.seed = seed
        self.start_position = start_position
        self.position_stride = position_stride
        self.position_block = position_block

    def _position(self, t: int) -> int:
        """Global item-stream position of this loader's t-th item."""
        b = self.position_block
        return (self.start_position
                + (t // b) * self.position_stride * b + (t % b))

    def _index_batches(self):
        """Yields (t0, [dataset indices]); t0 is the local ordinal of the
        batch's first item — `_position(t0 + j)` is item j's offset in
        the global item stream (the per-item RNG key when `seed` is
        set)."""
        it = iter(self.indices if self.indices is not None
                  else range(len(self.dataset)))
        batch: List[int] = []
        t0 = 0
        for idx in it:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield t0, batch
                t0 += len(batch)
                batch = []
        if batch and not self.drop_last:
            yield t0, batch

    def __iter__(self):
        """Yields batches in deterministic index order regardless of worker
        scheduling: workers tag each batch with its sequence number and the
        consumer reorders through a small pending buffer (bounded by
        prefetch + num_workers items), so two runs with the same seed
        produce identical batch streams — matching the reference's fully
        deterministic seeded eval protocol."""
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        batch_iter = enumerate(self._index_batches())
        lock = threading.Lock()

        def next_batch():
            with lock:
                return next(batch_iter, None)

        def worker():
            while not stop.is_set():
                job = next_batch()
                if job is None:
                    q.put(None)
                    return
                seq, (t0, idxs) = job
                if self.seed is None:
                    items = [self.dataset[i] for i in idxs]
                else:
                    items = [self.dataset.__getitem__(
                        i, rng=_item_rng(self.seed, self._position(t0 + j)))
                        for j, i in enumerate(idxs)]
                q.put((seq, collate(items)))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        finished = 0
        next_seq = 0
        pending = {}
        try:
            while True:
                while next_seq in pending:
                    yield pending.pop(next_seq)
                    next_seq += 1
                if finished == self.num_workers:
                    break  # all produced batches have been yielded in order
                item = q.get()
                if item is None:
                    finished += 1
                    continue
                seq, batch = item
                pending[seq] = batch
        finally:
            stop.set()
            # drain so workers blocked on put() can exit
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
