"""Record IO + loader: roundtrip, sharding, shuffling, prefetch correctness."""

import numpy as np
import pytest

from minddet_tpu.data.loader import DataLoader, DistributedSampler, stack_collate
from minddet_tpu.data.records import (
    RecordDataset,
    decode_example,
    encode_example,
    write_records,
)


def test_encode_decode_roundtrip():
    ex = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": np.asarray(7, np.int64),
        "raw": b"\x00\x01jpegdata\xff",
    }
    out = decode_example(encode_example(ex))
    np.testing.assert_array_equal(out["a"], ex["a"])
    assert int(out["b"]) == 7
    assert out["raw"] == ex["raw"]


def test_write_read_shards(tmp_path):
    exs = [{"x": np.full((2,), i, np.int32)} for i in range(25)]
    paths = write_records(str(tmp_path / "ds"), exs, shard_size=10)
    assert len(paths) == 3
    ds = RecordDataset(str(tmp_path / "ds-*.arrayrecord"))
    assert len(ds) == 25
    for i in (0, 9, 10, 24, -1):
        want = i if i >= 0 else 25 + i
        np.testing.assert_array_equal(ds[i]["x"], [want, want])


def test_distributed_sampler_partitions():
    s0 = DistributedSampler(10, num_shards=2, shard_id=0, shuffle=False)
    s1 = DistributedSampler(10, num_shards=2, shard_id=1, shuffle=False)
    i0, i1 = s0.epoch_indices(0), s1.epoch_indices(0)
    assert len(i0) == len(i1) == 5
    assert set(i0) | set(i1) == set(range(10))


def test_sampler_shuffles_deterministically():
    s = DistributedSampler(100, shuffle=True, seed=3)
    a, b = s.epoch_indices(0), s.epoch_indices(0)
    np.testing.assert_array_equal(a, b)
    c = s.epoch_indices(1)
    assert not np.array_equal(a, c)
    assert sorted(c) == list(range(100))


class _ToyDataset:
    def __len__(self):
        return 23

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "i": np.asarray(i)}


def test_loader_batches_all_and_in_order():
    dl = DataLoader(_ToyDataset(), batch_size=4, num_workers=3,
                    sampler=DistributedSampler(23, shuffle=False))
    batches = list(dl.epoch(0))
    assert len(batches) == 5  # drop_last
    seen = np.concatenate([b["i"] for b in batches])
    np.testing.assert_array_equal(seen, np.arange(20))
    assert batches[0]["x"].shape == (4, 3)


def test_loader_decode_fn_and_errors():
    def decode(ex):
        ex = dict(ex)
        ex["x"] = ex["x"] * 2
        return ex

    dl = DataLoader(_ToyDataset(), batch_size=4, decode_fn=decode,
                    sampler=DistributedSampler(23, shuffle=False))
    b = next(iter(dl.epoch(0)))
    np.testing.assert_array_equal(b["x"][1], [2, 2, 2])

    def bad(ex):
        raise ValueError("boom")

    dl_bad = DataLoader(_ToyDataset(), batch_size=4, decode_fn=bad)
    with pytest.raises(ValueError, match="boom"):
        next(iter(dl_bad.epoch(0)))


def test_group_sampler_batches_are_group_pure():
    from minddet_tpu.data.loader import GroupSampler, aspect_flags

    hws = [(480, 640)] * 10 + [(640, 480)] * 7  # 10 landscape, 7 portrait
    flags = aspect_flags(hws)
    s = GroupSampler(flags, batch_size=4, seed=3)
    idx = s.epoch_indices(0)
    assert len(idx) % 4 == 0
    for b in idx.reshape(-1, 4):
        assert len(set(flags[b])) == 1, "mixed-aspect batch"
    # every example appears at least once
    assert set(idx) == set(range(17))
    # sharding hands out whole, disjoint batches
    s0 = GroupSampler(flags, 4, num_shards=2, shard_id=0, seed=3)
    s1 = GroupSampler(flags, 4, num_shards=2, shard_id=1, seed=3)
    i0, i1 = s0.epoch_indices(1), s1.epoch_indices(1)
    assert len(i0) % 4 == 0 and len(i1) % 4 == 0
    assert len(i0) + len(i1) >= len(idx)


def test_loader_refuses_empty_epoch():
    """batch_size > shard size with drop_last must raise, not spin forever
    (pre-fix: __iter__ looped empty epochs and next() hung silently)."""
    from minddet_tpu.data.loader import DataLoader

    class _DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {"x": np.zeros(3, np.float32)}

    dl = DataLoader(_DS(), batch_size=8, num_workers=1)
    with pytest.raises(ValueError, match="fewer than batch_size"):
        next(iter(dl))
