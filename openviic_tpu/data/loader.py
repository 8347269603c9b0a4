"""Host-side batching + prefetch pipeline.

Replaces the reference's ``torch.utils.data.DataLoader`` usage (reference:
trainers/base_trainer.py:40-80) with a numpy pipeline designed for XLA:

 - deterministic shuffling from an integer seed (reproducible resume);
 - fixed-shape padding: variable-row feature keys are padded to a bucket
   boundary (multiple of ``bucket``) or to explicit ``pad_sizes`` so the
   number of distinct compiled shapes stays tiny;
 - background-thread prefetching so feature `.npy` reads overlap device
   compute (the reference uses worker processes; threads suffice here since
   numpy IO releases the GIL).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional

import numpy as np

from openviic_tpu.data.instance import InstanceList


_PREFETCH_END = object()


def _threaded_prefetch(items: Iterable, fn: Callable, depth: int) -> Iterator:
    """Yield ``fn(item)`` for each item, computed up to ``depth`` ahead in a
    background thread.

    The single producer/consumer implementation behind both
    ``DataLoader.__iter__`` (host batch assembly) and ``device_prefetch``
    (H2D conversion).  Exceptions are delivered to the consumer in stream
    order; abandoning the iterator (an error in the consuming loop, or a
    preemption KeyboardInterrupt) unblocks and stops the producer instead
    of leaking a thread pinned on a full queue."""
    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()

    def _put(obj) -> bool:
        while not stop.is_set():
            try:
                q.put(obj, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer() -> None:
        try:
            for item in items:
                if not _put(fn(item)):
                    return
        except BaseException as e:  # propagate, incl. KeyboardInterrupt
            _put(e)
        finally:
            _put(_PREFETCH_END)

    threading.Thread(target=producer, daemon=True).start()
    try:
        while True:
            out = q.get()
            if out is _PREFETCH_END:
                return
            if isinstance(out, BaseException):
                raise out
            yield out
    finally:
        stop.set()


def device_prefetch(
    iterable: Iterable, convert: Callable, depth: int = 2
) -> Iterator:
    """Keep ``depth`` converted (device-resident) items ahead of the consumer.

    ``convert`` (host batch -> device arrays, e.g. the trainer's
    ``_device_batch``) runs in a background thread with a bounded queue, so
    BOTH the host-side conversion work and the async H2D transfer overlap
    the consumer's device waits — an inline lookahead only overlaps the
    transfer, and on a single-core host the conversion itself is a large
    share of step time."""
    return _threaded_prefetch(iterable, convert, depth)


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def make_instance_batch(
    samples, pad_sizes: Optional[Dict[str, int]] = None, bucket: int = 8
) -> InstanceList:
    """Collate samples into an ``InstanceList`` with bucketed fixed shapes.

    Variable-row array keys not explicitly sized are padded to a multiple of
    ``bucket`` so XLA sees at most a handful of distinct shapes per key.
    Shared by the native ``DataLoader`` and the Grain pipeline
    (grain_loader.py)."""
    samples = list(samples)
    pad_sizes = dict(pad_sizes) if pad_sizes else {}
    for key, v0 in samples[0].items():
        if key in pad_sizes or not isinstance(v0, np.ndarray) or v0.ndim < 1:
            continue
        lens = {s[key].shape[0] for s in samples}
        if v0.ndim >= 2 or len(lens) > 1:
            # Feature-like keys (region/grid rows) are bucket-padded so the
            # number of distinct compiled shapes stays small even when row
            # counts vary across batches.  1-D token vectors are already
            # globally fixed-length (vocab.encode_caption) and stay at
            # their natural length.
            pad_sizes[key] = _round_up(max(lens), bucket)
    return InstanceList(samples, pad_sizes=pad_sizes)


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        pad_sizes: Optional[Dict[str, int]] = None,
        bucket: int = 8,
        drop_last: bool = False,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.pad_sizes = pad_sizes
        self.bucket = bucket
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            return rng.permutation(n)
        return np.arange(n)

    def _make_batch(self, indices: np.ndarray) -> InstanceList:
        samples = [self.dataset[int(i)] for i in indices]
        return make_instance_batch(samples, self.pad_sizes, self.bucket)

    def __iter__(self) -> Iterator[InstanceList]:
        order = self._order()
        self.epoch += 1
        n_batches = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

        if self.prefetch <= 0:
            for idxs in batches:
                yield self._make_batch(idxs)
            return

        yield from _threaded_prefetch(batches, self._make_batch, self.prefetch)
