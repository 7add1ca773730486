"""Offline dataset materialization: ArrayRecord shards of ndarray dicts.

Fills the MindRecord role from the reference (``centernet/src/dataset.py:
146-205`` COCO->MindRecord FileWriter; ``centerpoint/tools_ms/
create_mindrecord.py:16-121`` offline voxelized records): datasets are
materialized once into random-access ArrayRecord shards, then streamed with
host-side decode + device-side augmentation. Records are dicts of numpy
arrays (+ raw bytes fields), serialized with the npz container.
"""

from __future__ import annotations

import glob
import io
import os
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from array_record.python.array_record_module import (
    ArrayRecordReader,
    ArrayRecordWriter,
)


def encode_example(example: Dict[str, Any]) -> bytes:
    """dict of ndarrays / bytes / scalars -> npz bytes."""
    norm = {}
    for k, v in example.items():
        if isinstance(v, bytes):
            norm[k] = np.frombuffer(v, dtype=np.uint8)
            norm[f"__bytes__{k}"] = np.asarray(True)
        else:
            norm[k] = np.asarray(v)
    buf = io.BytesIO()
    np.savez(buf, **norm)
    return buf.getvalue()


def decode_example(blob: bytes) -> Dict[str, Any]:
    with np.load(io.BytesIO(blob), allow_pickle=False) as z:
        out: Dict[str, Any] = {}
        byte_keys = {k[len("__bytes__"):] for k in z.files if k.startswith("__bytes__")}
        for k in z.files:
            if k.startswith("__bytes__"):
                continue
            out[k] = z[k].tobytes() if k in byte_keys else z[k]
    return out


def write_records(
    path_prefix: str,
    examples: Iterable[Dict[str, Any]],
    shard_size: int = 4096,
    group_size: int = 1,
) -> List[str]:
    """Write examples to ``{prefix}-{i:05d}.arrayrecord`` shards."""
    os.makedirs(os.path.dirname(os.path.abspath(path_prefix)) or ".", exist_ok=True)
    paths: List[str] = []
    writer = None
    count = 0
    for ex in examples:
        if writer is None or count % shard_size == 0:
            if writer is not None:
                writer.close()
            path = f"{path_prefix}-{len(paths):05d}.arrayrecord"
            writer = ArrayRecordWriter(path, f"group_size:{group_size}")
            paths.append(path)
        writer.write(encode_example(ex))
        count += 1
    if writer is not None:
        writer.close()
    return paths


class RecordDataset:
    """Random-access view over a set of ArrayRecord shards."""

    def __init__(self, pattern_or_paths):
        if isinstance(pattern_or_paths, str):
            paths = sorted(glob.glob(pattern_or_paths))
        else:
            paths = list(pattern_or_paths)
        if not paths:
            raise FileNotFoundError(f"no record shards match {pattern_or_paths}")
        self._readers = [ArrayRecordReader(p) for p in paths]
        self._sizes = [r.num_records() for r in self._readers]
        self._offsets = np.cumsum([0] + self._sizes)

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        if idx < 0:
            idx += len(self)
        shard = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        local = idx - int(self._offsets[shard])
        (blob,) = self._readers[shard].read([local])
        return decode_example(blob)

    def read_batch(self, indices: Sequence[int]) -> List[Dict[str, Any]]:
        out = []
        for i in indices:
            out.append(self[int(i)])
        return out
