"""Batched host-side data loading with background prefetch.

Yields numpy batches; device placement/sharding happens in the training loop
(jax.device_put with a NamedSharding over the data axis), keeping the loader
framework-free and multi-host deterministic: every sample is generated from
(seed, step, position) so each host can compute exactly its shard.
"""
from __future__ import annotations

import threading
import queue as queue_mod

import numpy as np


def _stack_batch(samples, keys=None):
    """Stack a list of sample dicts into a dict of (B, ...) arrays."""
    batch = {}
    if keys is None:
        keys = [k for k, v in samples[0].items()
                if isinstance(v, (np.ndarray, np.floating, float, int, np.integer))]
    for k in keys:
        vals = [np.asarray(s[k]) for s in samples]
        batch[k] = np.stack(vals, axis=0)
    return batch


_BATCH_KEYS_TRAIN = ("img", "depth_gt", "pe_k_gt", "cam_height", "index",
                     "scene_class")
_BATCH_KEYS_EVAL = ("img", "cam_height", "index")


class TrainLoader:
    """Infinite iter-based loader: global batch per step, deterministic.

    Args:
      dataset: indexable returning sample dicts.
      pipeline: Compose of transforms, called as pipeline(sample, rng).
      global_batch: total batch size across all hosts/devices.
      seed: base seed; sample randomness = hash(seed, step, slot).
      shard_index / shard_count: this host's slice of the global batch
        (multi-host: each host materialises only its rows).
      prefetch: number of batches prepared ahead on a worker thread.
      sampling: 'epoch' (default) draws indices from a fresh deterministic
        permutation of the dataset per epoch — every sample seen exactly
        once per epoch, the reference DistributedSampler's semantics
        (depth/datasets/builder.py:123-125: shuffle=True epoch permutation
        split across ranks). 'replacement' draws i.i.d. uniform indices per
        step (the pre-round-5 behavior; same expectation, higher-moment
        coverage statistics differ over long runs).
    """

    def __init__(self, dataset, pipeline, global_batch, seed=0,
                 shard_index=0, shard_count=1, prefetch=2, num_workers=0,
                 sampling="epoch"):
        assert global_batch % shard_count == 0
        assert sampling in ("epoch", "replacement"), sampling
        self.dataset = dataset
        self.pipeline = pipeline
        self.global_batch = global_batch
        self.local_batch = global_batch // shard_count
        self.seed = seed
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.sampling = sampling
        self._epoch_cache = (-1, None)  # (epoch, permutation) memo

    def _epoch_order(self, epoch):
        """Deterministic permutation for `epoch` — a pure function of
        (seed, epoch), so every shard/worker/process computes the same
        order without coordination. Memoised per instance (workers in the
        process pool each hold their own memo; recompute is O(N) ~ ms)."""
        if self._epoch_cache[0] != epoch:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, 0xE90C4]))
            self._epoch_cache = (epoch, rng.permutation(len(self.dataset)))
        return self._epoch_cache[1]

    def _index_for(self, step, slot):
        """Dataset index for global slot `slot` of batch `step`."""
        if self.sampling == "replacement":
            rng_idx = np.random.default_rng(
                np.random.SeedSequence([self.seed, step, 0xA11CE]))
            order = rng_idx.integers(0, len(self.dataset),
                                     size=self.global_batch)
            return int(order[slot])
        pos = step * self.global_batch + slot  # position in the epoch stream
        n = len(self.dataset)
        return int(self._epoch_order(pos // n)[pos % n])

    def _make_batch(self, step):
        lo = self.shard_index * self.local_batch
        samples = []
        for slot in range(lo, lo + self.local_batch):
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, step, slot]))
            sample = self.dataset[self._index_for(step, slot)]
            sample = self.pipeline(sample, rng)
            samples.append(sample)
        keys = [k for k in _BATCH_KEYS_TRAIN if k in samples[0]]
        return _stack_batch(samples, keys)

    def __iter__(self):
        if self.num_workers > 1:
            yield from self._iter_multiprocess()
            return
        q = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            step = 0
            while not stop.is_set():
                try:
                    q.put(self._make_batch(step), timeout=0.5)
                    step += 1
                except queue_mod.Full:
                    continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()

    def _iter_multiprocess(self):
        """Multi-process batch preparation (the analogue of the reference's
        DataLoader workers_per_gpu, builder.py): a sliding window of
        `max(prefetch, num_workers)` in-flight `_make_batch(step)` futures.
        Every batch is a pure function of (seed, step, slot), so the stream
        is IDENTICAL for any worker count — workers change throughput only.
        Requires dataset + pipeline to be picklable (all in-tree datasets
        and transform Composes are)."""
        import concurrent.futures as cf

        window = max(self.prefetch, self.num_workers)
        with cf.ProcessPoolExecutor(max_workers=self.num_workers) as pool:
            futures = {s: pool.submit(self._make_batch, s)
                       for s in range(window)}
            step = 0
            while True:
                batch = futures.pop(step).result()
                futures[step + window] = pool.submit(
                    self._make_batch, step + window)
                yield batch
                step += 1


class EvalLoader:
    """Ordered eval loader with tail padding to a fixed batch size.

    Yields (batch, valid) where valid marks real rows (padding repeats the
    last sample so shapes stay static for jit; padded rows are dropped from
    metric aggregation by the caller via batch['index']).

    shard_index / shard_count: multi-host eval — this process evaluates the
    strided subset ``range(shard_index, len(dataset), shard_count)`` (the
    reference's DistributedSampler split, depth/apis/test.py:148-232); the
    caller allgathers per-image metrics across processes afterwards.
    """

    def __init__(self, dataset, pipeline, batch_size, prefetch=2,
                 shard_index=0, shard_count=1):
        self.dataset = dataset
        self.pipeline = pipeline
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.shard_count = shard_count
        self._indices = list(range(shard_index, len(dataset), shard_count))

    def __len__(self):
        return -(-len(self._indices) // self.batch_size)

    def __iter__(self):
        """Batches are prepared on a background thread (queue depth
        `prefetch`) so host-side GT decode/transform overlaps the device
        eval step — the reference gets the same overlap from DataLoader
        workers (builder.py). Order is preserved; prefetch=0 disables."""
        if self.prefetch <= 0:
            yield from self._make_batches()
            return
        q = queue_mod.Queue(maxsize=self.prefetch)
        done = object()

        def worker():
            for item in self._make_batches():
                q.put(item)
            q.put(done)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is done:
                return
            yield item

    def _make_batches(self):
        n = len(self._indices)
        rng = np.random.default_rng(0)  # eval transforms must be deterministic
        for start in range(0, n, self.batch_size):
            idxs = self._indices[start:min(start + self.batch_size, n)]
            valid = np.zeros(self.batch_size, dtype=bool)
            valid[:len(idxs)] = True
            while len(idxs) < self.batch_size:
                idxs.append(idxs[-1])
            samples = []
            for i in idxs:
                sample = self.dataset[i]
                sample = self.pipeline(sample, rng)
                samples.append(sample)
            keys = [k for k in _BATCH_KEYS_EVAL if k in samples[0]]
            batch = _stack_batch(samples, keys)
            yield batch, valid
