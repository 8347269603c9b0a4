"""DataLoader behavior tests: determinism, bucketing, prefetch errors."""

import numpy as np
import pytest

from openviic_tpu.data.instance import Instance, InstanceList
from openviic_tpu.data.loader import DataLoader


class ToyDataset:
    def __init__(self, n=20, fail_at=None):
        self.n = n
        self.fail_at = fail_at
        rng = np.random.default_rng(0)
        self.rows = [int(r) for r in rng.integers(3, 12, size=n)]

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise RuntimeError("boom")
        return Instance(
            idx=np.int32(i),
            feats=np.full((self.rows[i], 4), i, np.float32),
            tokens=np.full((7,), i, np.int32),
        )


def test_shuffle_deterministic_per_seed_and_epoch():
    ds = ToyDataset()
    l1 = DataLoader(ds, 4, shuffle=True, seed=5)
    l2 = DataLoader(ds, 4, shuffle=True, seed=5)
    o1 = [list(b["idx"]) for b in l1]
    o2 = [list(b["idx"]) for b in l2]
    assert o1 == o2
    # second epoch differs (epoch counter advances the stream)
    o1b = [list(b["idx"]) for b in l1]
    assert o1 != o1b
    # different seed differs
    o3 = [list(b["idx"]) for b in DataLoader(ds, 4, shuffle=True, seed=6)]
    assert o1 != o3


def test_bucketed_shapes_and_fixed_token_length():
    ds = ToyDataset()
    loader = DataLoader(ds, 4, bucket=8)
    for batch in loader:
        # feature rows padded to a multiple of 8; 1-D tokens untouched
        assert batch["feats"].shape[1] % 8 == 0
        assert batch["tokens"].shape[1] == 7


def test_drop_last():
    ds = ToyDataset(n=10)
    assert len(DataLoader(ds, 4, drop_last=True)) == 2
    assert len(DataLoader(ds, 4, drop_last=False)) == 3


def test_prefetch_error_propagates():
    ds = ToyDataset(fail_at=5)
    loader = DataLoader(ds, 4, prefetch=2)
    with pytest.raises(RuntimeError, match="boom"):
        for _ in loader:
            pass


def test_explicit_pad_sizes_respected():
    ds = ToyDataset()
    loader = DataLoader(ds, 4, pad_sizes={"feats": 16})
    batch = next(iter(loader))
    assert batch["feats"].shape[1] == 16


def test_pad_overflow_raises():
    samples = [Instance(feats=np.zeros((9, 2), np.float32))]
    with pytest.raises(ValueError, match="pad size"):
        InstanceList(samples, pad_sizes={"feats": 4})


def test_device_prefetch_preserves_order_and_count():
    from openviic_tpu.data.loader import device_prefetch

    calls = []

    def convert(x):
        calls.append(x)
        return x * 10

    out = list(device_prefetch(range(7), convert, depth=3))
    assert out == [0, 10, 20, 30, 40, 50, 60]
    assert calls == list(range(7))
    # depth larger than the iterable, and empty iterables
    assert list(device_prefetch([1, 2], lambda x: x, depth=10)) == [1, 2]
    assert list(device_prefetch([], lambda x: x)) == []


def test_device_prefetch_stays_ahead():
    import time

    from openviic_tpu.data.loader import device_prefetch

    converted = []

    def convert(x):
        converted.append(x)
        return x

    gen = device_prefetch(range(5), convert, depth=2)
    assert next(gen) == 0
    # the background producer runs ahead of the consumer...
    deadline = time.time() + 5
    while len(converted) < 3 and time.time() < deadline:
        time.sleep(0.005)
    assert converted[:3] == [0, 1, 2]
    # ...but no further than the queue bound (+1 in flight)
    assert len(converted) <= 4
    assert list(gen) == [1, 2, 3, 4]
    assert converted == [0, 1, 2, 3, 4]


def test_device_prefetch_abandonment_stops_producer():
    """Dropping the iterator mid-stream unblocks the producer thread
    instead of leaking it pinned on a full queue."""
    import time

    from openviic_tpu.data.loader import device_prefetch

    converted = []

    def convert(x):
        converted.append(x)
        return x

    gen = device_prefetch(range(1000), convert, depth=2)
    next(gen)
    gen.close()  # abandon
    time.sleep(0.5)
    n = len(converted)
    time.sleep(0.3)
    assert len(converted) == n  # producer stopped
    assert n < 10


def test_feature_cache_lru(tmp_path):
    """DATASET.CACHE_FEATURES: bounded LRU over parsed .npy dicts, shared
    per features directory."""
    import numpy as np

    from openviic_tpu.data.datasets import _FeatureSource

    d = tmp_path / "feats"
    d.mkdir()
    for i in range(5):
        np.save(d / f"{i}.npy", {"region_features": np.full((2, 3), i, np.float32)},
                allow_pickle=True)

    src = _FeatureSource(str(d), cache_size=2)
    a = src.load(0)
    assert src.load(0) is a  # cache hit returns the same parsed dict
    src.load(1)
    src.load(2)  # evicts 0 (LRU bound = 2)
    assert src.load(0) is not a
    # second source over the same dir shares the cache
    src2 = _FeatureSource(str(d), cache_size=2)
    assert src2.load(0) is src.load(0)
    # uncached source re-parses every time
    plain = _FeatureSource(str(d))
    assert plain.load(3) is not plain.load(3)
