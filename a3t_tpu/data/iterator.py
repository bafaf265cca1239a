"""Epoch iterator factories with background prefetch.

The analogue of SequenceIterFactory (espnet2/iterators/sequence_iter_factory.py:27):
epoch-seeded, reproducible order, optional ``num_iters_per_epoch`` windowing,
and a one-deep producer thread so host batch assembly overlaps device steps
(the reference gets this from DataLoader workers).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

from a3t_tpu.data.batcher import BucketBatcher


class PrefetchIterator:
    """Wrap an iterator with a background producer thread.

    ``transform`` (e.g. ``jax.device_put``) runs in the producer thread, so
    host→device transfer overlaps the consumer's device steps — on a
    tunneled backend the transfer latency is otherwise serialized into
    every dispatch.
    """

    def __init__(self, it: Iterator, depth: int = 2, transform=None):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: Optional[BaseException] = None
        self._closed = False
        # producer-side timing (seconds, cumulative): where a slow pipeline
        # spends its time — batch assembly (gen), host->device transform,
        # or waiting on a full queue (consumer-bound, the healthy state).
        # Read by Trainer's log line; written only by the producer thread.
        self.t_gen = 0.0
        self.t_transform = 0.0
        self.t_qfull = 0.0
        self.n_produced = 0

        def produce():
            import time as _time

            try:
                while True:
                    t0 = _time.perf_counter()
                    try:
                        item = next(it)
                    except StopIteration:
                        break
                    t1 = _time.perf_counter()
                    self.t_gen += t1 - t0
                    if self._closed:
                        return
                    if transform is not None:
                        item = transform(item)
                        t2 = _time.perf_counter()
                        self.t_transform += t2 - t1
                    t2 = _time.perf_counter()
                    while not self._closed:
                        try:
                            self.q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    self.t_qfull += _time.perf_counter() - t2
                    self.n_produced += 1
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                # the sentinel MUST land for a live consumer (a full queue
                # without it deadlocks __next__); only a close()d iterator
                # may skip it — its consumer is the closer
                while not self._closed:
                    try:
                        self.q.put(self._done, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        self.thread = threading.Thread(target=produce, daemon=True)
        self.thread.start()

    def close(self):
        """Stop the producer and drop queued items.

        Abandoning an un-closed iterator leaves depth+1 prefetched batches
        alive behind a blocked producer thread — with a device_put
        transform those are device-resident buffers pinned in HBM for the
        rest of the process.  Callers that only peek (e.g. fetching a
        sample batch for model init) must close.
        """
        self._closed = True
        # the producer exits within one put-retry interval (or after its
        # in-flight transform); drain only once it is gone so a pending
        # put cannot land after the drain
        self.thread.join(timeout=5.0)
        while True:
            try:
                self.q.get_nowait()
            except queue.Empty:
                break

    def __iter__(self):
        return self

    def __next__(self):
        # a close()d iterator is exhausted — its queue was drained and the
        # producer skips the sentinel, so a blocking get would never return
        if self._closed:
            raise StopIteration
        item = self.q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class EpochIterFactory:
    """factory(epoch) -> iterator of host batches; pluggable into Trainer."""

    def __init__(
        self,
        batcher: BucketBatcher,
        num_iters_per_epoch: Optional[int] = None,
        shard: tuple[int, int] = (0, 1),
        prefetch: int = 2,
        transform=None,
        chain: int = 1,
    ):
        self.batcher = batcher
        self.num_iters = num_iters_per_epoch
        self.shard = shard
        self.prefetch = prefetch
        self.transform = transform
        # chain > 1: yield ("chained", stacked, valid, weights) groups of
        # that many same-bucket batches (see BucketBatcher.chained_plan);
        # num_iters then counts SUB-steps, with the window edge realized
        # by invalidating the tail of the final group
        self.chain = chain

    def __call__(self, epoch: int):
        def gen():
            produced = 0
            # cycle the epoch plan until num_iters batches were produced
            # (the reference windows batches across epochs the same way,
            # sequence_iter_factory.py:60-101)
            offset = 0
            while True:
                if self.chain > 1:
                    it = self.batcher.chained_epoch_iterator(
                        epoch + offset, self.chain, self.shard)
                else:
                    it = self.batcher.epoch_iterator(
                        epoch + offset, self.shard)
                empty = True
                for batch in it:
                    empty = False
                    if self.chain > 1:
                        tag, stacked, valid, weights = batch
                        nv = int(valid.sum())
                        if (self.num_iters is not None
                                and produced + nv > self.num_iters):
                            m = self.num_iters - produced
                            valid = valid.copy()
                            weights = weights.copy()
                            valid[m:] = False
                            weights[m:] = 0.0
                            nv = m
                            batch = (tag, stacked, valid, weights)
                        yield batch
                        produced += nv
                    else:
                        yield batch
                        produced += 1
                    if (self.num_iters is not None
                            and produced >= self.num_iters):
                        return
                if self.num_iters is None or empty:
                    return
                offset += 1000  # reseed for the wrap-around pass

        if self.prefetch > 0:
            return PrefetchIterator(gen(), self.prefetch, self.transform)
        if self.transform is not None:
            return map(self.transform, gen())
        return gen()
