"""ctypes bindings for the native host-ops library (libminddet_host_ops.so).

The C++ side (``native/src/host_ops.cpp``) provides multithreaded rotated IoU
matrices, greedy rotated/2D NMS, and point-in-rotated-box tests for host-side
tooling (offline data prep, CPU eval fallback) — the runtime counterpart of
the reference's ``nms_fast.so`` CPU custom op, and an independent golden
implementation the Pallas/XLA device kernels are validated against in tests.

Auto-builds with ``make -C native`` on first use if the .so is missing or
older than its source (the binary is never committed — a foreign-arch
``-march=native`` build could SIGILL, and a stale one would silently ignore
source edits, poisoning the golden cross-validation).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libminddet_host_ops.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "src", "host_ops.cpp")


def _needs_build() -> bool:
    if not os.path.exists(_SO_PATH):
        return True
    try:
        return os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
    except OSError:
        return False


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    if _needs_build():
        subprocess.run(["make", "-C", _NATIVE_DIR, "-B"], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_SO_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.rotated_iou_matrix.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_int, f32p
    ]
    lib.rotated_nms.restype = ctypes.c_int64
    lib.rotated_nms.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ctypes.c_int64, i64p,
    ]
    lib.nms_2d.restype = ctypes.c_int64
    lib.nms_2d.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ctypes.c_int64, i64p,
    ]
    lib.points_in_rboxes.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64, u8p]
    lib.host_ops_version.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    try:
        return _load().host_ops_version() >= 1
    except Exception:
        return False


def rotated_iou_matrix(
    boxes1: np.ndarray, boxes2: np.ndarray, criterion: int = -1
) -> np.ndarray:
    """(N, 5) x (M, 5) [x, y, w, l, yaw] -> (N, M) float32, multithreaded."""
    lib = _load()
    b1 = np.ascontiguousarray(boxes1, np.float32)
    b2 = np.ascontiguousarray(boxes2, np.float32)
    out = np.empty((len(b1), len(b2)), np.float32)
    lib.rotated_iou_matrix(b1, len(b1), b2, len(b2), criterion, out)
    return out


def rotated_nms(
    boxes: np.ndarray,
    scores: np.ndarray,
    iou_threshold: float = 0.1,
    score_threshold: float = -np.inf,
    max_outputs: Optional[int] = None,
) -> np.ndarray:
    """Greedy rotated NMS -> kept indices (original order), score-descending."""
    lib = _load()
    scores = np.asarray(scores, np.float32)
    order = np.argsort(-scores, kind="stable")
    b = np.ascontiguousarray(np.asarray(boxes, np.float32)[order])
    s = np.ascontiguousarray(scores[order])
    m = len(b) if max_outputs is None else max_outputs
    keep = np.empty(min(m, len(b)), np.int64)
    thr = score_threshold if np.isfinite(score_threshold) else -3.4e38
    n = lib.rotated_nms(b, s, len(b), iou_threshold, thr, len(keep), keep)
    return order[keep[:n]]


def nms_2d(
    boxes: np.ndarray,
    scores: np.ndarray,
    iou_threshold: float = 0.5,
    score_threshold: float = -np.inf,
    max_outputs: Optional[int] = None,
) -> np.ndarray:
    lib = _load()
    scores = np.asarray(scores, np.float32)
    order = np.argsort(-scores, kind="stable")
    b = np.ascontiguousarray(np.asarray(boxes, np.float32)[order])
    s = np.ascontiguousarray(scores[order])
    m = len(b) if max_outputs is None else max_outputs
    keep = np.empty(min(m, len(b)), np.int64)
    thr = score_threshold if np.isfinite(score_threshold) else -3.4e38
    n = lib.nms_2d(b, s, len(b), iou_threshold, thr, len(keep), keep)
    return order[keep[:n]]


def points_in_rboxes(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """(N, 2) points x (M, 5) rotated boxes -> (N, M) bool."""
    lib = _load()
    p = np.ascontiguousarray(points[:, :2], np.float32)
    b = np.ascontiguousarray(boxes, np.float32)
    out = np.empty((len(p), len(b)), np.uint8)
    lib.points_in_rboxes(p, len(p), b, len(b), out)
    return out.astype(bool)
