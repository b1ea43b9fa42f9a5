"""Threaded host loading + double-buffered device prefetch.

TPU-native replacement for the reference's TF1 queue-runners
(``tf.train.slice_input_producer`` / ``tf.train.batch``,
``imageselect_Dataloader_optflow.py:41-56``) and for the feeding side of the DeMoN C++
reader threads.  Design: a small worker pool decodes samples into pinned NumPy batches on
the host; the prefetcher keeps ``prefetch_depth`` batches in flight to HBM via
``jax.device_put`` so the accelerator never waits on input (SURVEY §3.5).

Single-writer queue discipline — the only threaded component in the framework
(SURVEY §5 'race detection').
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


class BatchLoader:
    """Shuffled, epoch-repeating batch iterator over an indexable dataset.

    ``dataset[i]`` must return a dict of numpy arrays with fixed shapes.  Mirrors the
    reference queue semantics: shuffle each epoch, fixed batch size, drop remainder
    (``tf.train.batch`` with a shuffling producer), bounded epochs optional
    (slice_input_producer ``num_epochs``).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_epochs: Optional[int] = None,
        num_workers: int = 2,
        queue_depth: int = 4,
        host_index: int = 0,
        host_count: int = 1,
    ):
        if len(dataset) == 0:
            raise ValueError("empty dataset")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_epochs = num_epochs
        self.rng = np.random.RandomState(seed + host_index)
        self.host_index = host_index
        self.host_count = host_count
        self.num_workers = num_workers
        self.queue_depth = queue_depth

    def _index_stream(self) -> Iterator[int]:
        """Per-host shard of the shuffled index stream (multi-host input sharding:
        each host reads a disjoint 1/host_count slice, SURVEY §2.8)."""
        epoch = 0
        n = len(self.dataset)
        while self.num_epochs is None or epoch < self.num_epochs:
            idx = np.arange(n)
            if self.shuffle:
                self.rng.shuffle(idx)
            shard = idx[self.host_index :: self.host_count]
            yield from shard
            epoch += 1

    def _collate(self, samples: Sequence[dict]) -> dict:
        out = {}
        for k in samples[0]:
            out[k] = np.stack([s[k] for s in samples], axis=0)
        return out

    def __iter__(self) -> Iterator[dict]:
        """Background-threaded batch stream."""
        idx_stream = self._index_stream()
        idx_lock = threading.Lock()
        out_q: queue.Queue = queue.Queue(maxsize=self.queue_depth)
        stop = threading.Event()
        SENTINEL = None

        def producer():
            while not stop.is_set():
                batch_idx = []
                with idx_lock:
                    try:
                        for _ in range(self.batch_size):
                            batch_idx.append(next(idx_stream))
                    except StopIteration:
                        break
                samples = [self.dataset[i] for i in batch_idx]
                out_q.put(self._collate(samples))
            out_q.put(SENTINEL)

        workers = [
            threading.Thread(target=producer, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in workers:
            t.start()

        finished = 0
        try:
            while finished < self.num_workers:
                item = out_q.get()
                if item is SENTINEL:
                    finished += 1
                    continue
                yield item
        finally:
            stop.set()
            # drain so producers blocked on put() can exit
            while not out_q.empty():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break


class IterBatcher:
    """Batches a restartable sample-dict stream (e.g. the native C++ loader).

    ``factory()`` must return a fresh sample iterator; each exhaustion is one epoch
    (the native sampler reshuffles per iteration like the reference's shuffling queue).
    Partial batches carry across epoch boundaries — ``tf.train.batch`` batches a
    continuous queue, so only the final partial batch (after the last epoch) is
    dropped.  No extra worker threads — sources like ``NativePairSampler`` pipeline
    internally.
    """

    def __init__(self, factory: Callable[[], Iterator[dict]], batch_size: int,
                 num_epochs: Optional[int] = None):
        self.factory = factory
        self.batch_size = batch_size
        self.num_epochs = num_epochs

    def __iter__(self) -> Iterator[dict]:
        epoch = 0
        buf = []
        while self.num_epochs is None or epoch < self.num_epochs:
            produced = 0
            for s in self.factory():
                produced += 1
                buf.append(s)
                if len(buf) == self.batch_size:
                    yield {k: np.stack([x[k] for x in buf], 0) for k in buf[0]}
                    buf = []
            if produced == 0:
                # match BatchLoader's empty-dataset error instead of silently
                # yielding nothing (or hot-looping forever with num_epochs=None)
                raise ValueError("IterBatcher: source iterator produced no samples")
            epoch += 1


class _ProducerError:
    """Queue marker carrying a producer-thread exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class StreamLoader:
    """Sampler-driven infinite batch stream (scene pool + weighted sources).

    Production analog of the reference C++ reader's draw loop
    (``Demon_Data_loader.py:52-74``): instead of iterating a shuffled epoch, each worker
    thread draws samples via ``dataset.sample(rng)`` — which for ``DemonDataset`` is a
    weighted multi-source draw through a shared scene pool.  This is the loader behind
    every DeMoN training CLI; ``BatchLoader`` remains the epoch-ordered path for the
    eval/test harnesses.

    Each worker owns an independent ``RandomState`` (seed x host x worker), so batches
    are deterministic given (seed, worker schedule) and hosts draw decorrelated streams
    (multi-host input sharding happens by seed, not index slicing — matching the
    reference reader, where every host's reader owns its own sampling stream).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        seed: int = 0,
        num_workers: int = 2,
        queue_depth: int = 4,
        host_index: int = 0,
    ):
        if not hasattr(dataset, "sample"):
            raise TypeError("StreamLoader needs a dataset with .sample(rng)")
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.num_workers = num_workers
        self.queue_depth = queue_depth
        self.host_index = host_index

    def _collate(self, samples: Sequence[dict]) -> dict:
        return {k: np.stack([s[k] for s in samples], axis=0) for k in samples[0]}

    def __iter__(self) -> Iterator[dict]:
        out_q: queue.Queue = queue.Queue(maxsize=self.queue_depth)
        stop = threading.Event()

        def producer(worker_id: int):
            rng = np.random.RandomState(
                (self.seed * 1000003 + self.host_index * 9973 + worker_id) & 0x7FFFFFFF
            )
            try:
                while not stop.is_set():
                    samples = []
                    for _ in range(self.batch_size):
                        if stop.is_set():
                            return
                        samples.append(self.dataset.sample(rng))
                    out_q.put(self._collate(samples))
            except BaseException as e:  # propagate instead of hanging the consumer
                out_q.put(_ProducerError(e))

        workers = [
            threading.Thread(target=producer, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in workers:
            t.start()
        try:
            while True:
                item = out_q.get()
                if isinstance(item, _ProducerError):
                    # a worker died (corrupt record, I/O error, ...): fail the run
                    # loudly rather than blocking forever on an empty queue
                    raise RuntimeError(
                        "StreamLoader producer thread failed"
                    ) from item.exc
                yield item
        finally:
            stop.set()
            # unblock producers stuck on put(), then join so the caller may safely
            # close the dataset (no draws continue past generator close)
            while any(t.is_alive() for t in workers):
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    pass
                for t in workers:
                    t.join(timeout=0.01)


def device_prefetch(batches: Iterator[dict], size: int = 2, sharding=None) -> Iterator[dict]:
    """Keep ``size`` batches in flight on-device (double buffering by default).

    With a ``sharding`` (e.g. batch-sharded NamedSharding over the data mesh axis),
    ``device_put`` scatters each host batch across local devices — the multi-chip input
    path; without one, batches land on the default device.
    """
    import collections

    import jax

    buf = collections.deque()

    def put(b):
        if sharding is not None:
            return jax.device_put(b, sharding)
        return jax.device_put(b)

    for b in batches:
        buf.append(put(b))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
