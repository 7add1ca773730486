"""Pure-python MindSpore ``.ckpt`` reader/writer (no mindspore dependency).

The reference's published checkpoints are MindSpore protobuf checkpoints
(e.g. ``pointpillars-160_37120.ckpt``, ``pointpillars/README.md:311``; the
reference itself converts torch->MS with ``centernet/convert_ckpt.py:56``).
Until now parity runs needed a prep-machine export to ``.npz``
(``tools/parity_eval.py``); this module parses the checkpoint's protobuf wire
format directly so ``parity_eval`` consumes the reference's artifacts as-is.

Wire schema (mindspore ``checkpoint.proto``, stable since 1.x)::

    message Checkpoint { repeated Value value = 1; }
    message Value     { required string tag = 1; optional TensorProto tensor = 2; }
    message TensorProto {
        repeated int64 dims = 1;       # [0] encodes a scalar
        optional string tensor_type = 2;   # "Float32", "Int64", ...
        optional bytes tensor_content = 3; # raw little-endian array bytes
    }
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import numpy as np

_DTYPES = {
    "Float64": np.float64,
    "Float32": np.float32,
    "Float16": np.float16,
    "Int8": np.int8,
    "Int16": np.int16,
    "Int32": np.int32,
    "Int64": np.int64,
    "UInt8": np.uint8,
    "UInt16": np.uint16,
    "UInt32": np.uint32,
    "UInt64": np.uint64,
    "Bool": np.bool_,
}


def _bf16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _np_dtype(tensor_type: str) -> np.dtype:
    if tensor_type == "BFloat16":
        return _bf16()
    try:
        return np.dtype(_DTYPES[tensor_type])
    except KeyError:
        raise ValueError(f"unsupported MindSpore tensor_type {tensor_type!r}")


def _type_name(dtype: np.dtype) -> str:
    if dtype == _bf16():
        return "BFloat16"
    for name, np_t in _DTYPES.items():
        if np.dtype(np_t) == dtype:
            return name
    raise ValueError(f"unsupported dtype {dtype}")


# --- protobuf wire primitives -------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over one message's bytes."""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        elif wire == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire} (field {field})")
        yield field, wire, val


def _parse_tensor(buf: bytes) -> np.ndarray:
    dims, ttype, content = [], "Float32", b""
    for field, wire, val in _fields(buf):
        if field == 1:  # dims: packed (wire 2) or one-per-field (wire 0)
            if wire == 0:
                dims.append(int(val))
            else:
                pos = 0
                while pos < len(val):
                    d, pos = _read_varint(val, pos)
                    dims.append(d)
        elif field == 2:
            ttype = bytes(val).decode()
        elif field == 3:
            content = bytes(val)
    shape = () if dims == [0] else tuple(dims)
    arr = np.frombuffer(content, dtype=_np_dtype(ttype))
    return arr.reshape(shape)


def load_ms_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """MindSpore ``.ckpt`` file -> {parameter name: numpy array}."""
    with open(path, "rb") as f:
        buf = f.read()
    out: Dict[str, np.ndarray] = {}
    for field, _, val in _fields(buf):
        if field != 1:
            continue
        tag, tensor = None, None
        for vfield, _, vval in _fields(val):
            if vfield == 1:
                tag = bytes(vval).decode()
            elif vfield == 2:
                tensor = _parse_tensor(vval)
        if tag is not None and tensor is not None:
            out[tag] = tensor
    return out


def save_ms_checkpoint(path: str, arrays: Dict[str, np.ndarray]) -> None:
    """Write {name: array} in the MindSpore checkpoint wire format
    (round-trip tests + fixture generation; produces files
    ``mindspore.load_checkpoint`` reads)."""
    blob = bytearray()
    for name, arr in arrays.items():
        # NOT ascontiguousarray: it promotes 0-d arrays to 1-d, breaking the
        # dims-[0] scalar encoding; tobytes() already emits C order
        arr = np.asarray(arr)
        t = bytearray()
        dims = [0] if arr.shape == () else list(arr.shape)
        for d in dims:
            t += _write_varint((1 << 3) | 0) + _write_varint(d)
        tt = _type_name(arr.dtype).encode()
        t += _write_varint((2 << 3) | 2) + _write_varint(len(tt)) + tt
        content = arr.tobytes()
        t += (_write_varint((3 << 3) | 2) + _write_varint(len(content))
              + content)
        v = bytearray()
        nb = name.encode()
        v += _write_varint((1 << 3) | 2) + _write_varint(len(nb)) + nb
        v += _write_varint((2 << 3) | 2) + _write_varint(len(t)) + bytes(t)
        blob += _write_varint((1 << 3) | 2) + _write_varint(len(v)) + bytes(v)
    with open(path, "wb") as f:
        f.write(bytes(blob))


# --- MindSpore -> torch-lineage naming ---------------------------------------

_MS_LEAF_MAP = {
    "gamma": "weight",
    "beta": "bias",
    "moving_mean": "running_mean",
    "moving_variance": "running_var",
}
_MS_DROP_PREFIXES = ("moments.", "moment1.", "moment2.", "accum.", "stat.")
_MS_DROP_NAMES = ("global_step", "learning_rate", "current_iterator_step",
                  "last_overflow_iterator_step", "loss_scale", "beta1_power",
                  "beta2_power", "scale_sense")


def ms_to_torch_names(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Normalize MindSpore parameter names to the torch-lineage convention
    the rule tables in :mod:`minddet_tpu.utils.convert` target.

    BatchNorm leaves map gamma/beta/moving_mean/moving_variance ->
    weight/bias/running_mean/running_var; optimizer state (``moments.*``,
    ``global_step``, loss-scale bookkeeping) drops; a leading ``network.``
    (the reference wraps models in WithLossCell/TrainOneStepCell) strips.
    Layouts are untouched: the reference's MS models keep torch's OIHW conv
    layout (its converters only rename, ``centernet/convert_ckpt.py:56``),
    so ``convert_state_dict``'s transpositions still apply downstream.
    """
    out: Dict[str, np.ndarray] = {}
    for name, arr in state.items():
        if name in _MS_DROP_NAMES or name.startswith(_MS_DROP_PREFIXES):
            continue
        while name.startswith("network."):
            name = name[len("network."):]
        parts = name.split(".")
        parts[-1] = _MS_LEAF_MAP.get(parts[-1], parts[-1])
        out[".".join(parts)] = arr
    return out


def load_ms_state_dict(path: str) -> Dict[str, np.ndarray]:
    """``.ckpt`` -> torch-lineage-named state dict, ready for the
    ``convert_*`` rule tables (one call in ``tools/parity_eval.py``)."""
    return ms_to_torch_names(load_ms_checkpoint(path))
