"""Grain-backed input pipeline with host sharding.

The reference feeds its trainer from ``torch.utils.data.DataLoader`` with
worker processes (reference: trainers/base_trainer.py:40-80).  The native
``DataLoader`` here (data/loader.py) covers single-host training; this
module provides the *scale-out* pipeline on Google Grain
(``grain.MapDataset``), adding what a multi-host TPU job needs:

 - **host sharding**: each process reads a disjoint shard of a single
   globally-shuffled index space (shuffle-then-slice), so a data-parallel
   mesh spanning hosts sees the whole epoch exactly once with no
   coordination traffic;
 - **deterministic resume**: the shuffle is keyed by ``seed + epoch``
   exactly like the native loader, so realigning ``.epoch`` on restore
   (training/trainer.py) reproduces the uninterrupted stream;
 - **threaded read-ahead**: feature ``.npy`` reads overlap device compute
   via Grain's prefetching iterator (numpy IO releases the GIL, so
   threads suffice and nothing needs to be picklable).

Batches are collated by the same ``make_instance_batch`` bucket-padding
as the native loader, so downstream shapes (and therefore XLA compilation
counts) are identical between the two pipelines.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

from openviic_tpu.data.instance import InstanceList
from openviic_tpu.data.loader import make_instance_batch


def _default_shard() -> tuple:
    """(shard_index, shard_count) from the JAX runtime, else (0, 1)."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


class _Source:
    """RandomAccessDataSource view over a framework dataset."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx: int):
        return self._dataset[int(idx)]


class GrainDataLoader:
    """Drop-in for ``data.loader.DataLoader`` built on ``grain.MapDataset``.

    Extra arguments over the native loader: ``shard_index``/``shard_count``
    (default: this process's slot in the JAX multi-host job) and
    ``read_threads`` for the prefetching iterator.
    """

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
        shard_index: Optional[int] = None,
        shard_count: Optional[int] = None,
        read_threads: int = 2,
    ):
        if shard_index is None or shard_count is None:
            default_index, default_count = _default_shard()
            shard_index = default_index if shard_index is None else shard_index
            shard_count = default_count if shard_count is None else shard_count
        if not (0 <= shard_index < shard_count):
            raise ValueError(
                f"shard_index {shard_index} out of range for {shard_count} shards"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.pad_sizes = pad_sizes
        self.bucket = bucket
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.read_threads = read_threads
        self.epoch = 0

    def _shard_len(self) -> int:
        # Every shard is truncated to n // shard_count elements so all
        # hosts yield IDENTICAL batch counts — unequal shard lengths make
        # hosts run different step counts, which deadlocks the gradient
        # collectives / checkpoint barriers in multi-host data parallel.
        return len(self.dataset) // self.shard_count

    def __len__(self) -> int:
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _build(self, epoch: int):
        import grain

        ds = grain.MapDataset.source(_Source(self.dataset))
        if self.shuffle:
            # keyed by seed+epoch — identical convention to the native
            # loader so trainer resume realignment works unchanged
            ds = ds.shuffle(seed=self.seed + epoch)
        if self.shard_count > 1:
            # equal-length shards (see _shard_len): stop at the last index
            # that keeps every shard at exactly n // shard_count elements
            stop = self._shard_len() * self.shard_count
            ds = ds.slice(slice(self.shard_index, stop, self.shard_count))
        ds = ds.batch(
            self.batch_size,
            drop_remainder=self.drop_last,
            batch_fn=lambda samples: make_instance_batch(
                samples, self.pad_sizes, self.bucket
            ),
        )
        read_options = grain.ReadOptions(
            num_threads=max(1, self.read_threads),
            prefetch_buffer_size=max(1, self.prefetch),
        )
        return ds.to_iter_dataset(read_options)

    def __iter__(self) -> Iterator[InstanceList]:
        it = iter(self._build(self.epoch))
        self.epoch += 1
        return it
