"""Non-maximum suppression suite, fully on-device.

The reference implements NMS five different ways — numpy greedy
(``pointpillars/src/core/nms.py:123``), ``ops.NMSWithMask`` (``nms.py:115``),
a CPU C++ custom op (``centerpoint/det3d_ms/ops/iou-bev-nms-org.cpp:237-283``),
a Huawei TIK NPU kernel (``nms_with_mask3d.py:351``), and a CUDA extension
(``iou3d_nms_kernel.cu``) — and its CenterPoint eval graph hops device->CPU
mid-decode for it (``nms_cpu.py:10-27``). Here every variant runs inside the
XLA graph with static shapes:

* `nms` — greedy hard NMS via a fixed-point mask iteration (O(depth) passes of
  an N x N boolean matrix on the VPU instead of N sequential steps).
* `batched_nms` — class-aware via the coordinate-offset trick.
* `soft_nms` — Gaussian/linear score decay (replaces the external compiled
  ``nms`` package the reference builds at runtime, ``centernet/eval.py:38-52``).
* `rotated_nms` — same greedy machinery over the rotated-BEV IoU matrix.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from minddet_tpu.ops.box import pairwise_iou
from minddet_tpu.ops.rotated_iou import rotated_iou_bev


def _greedy_keep_from_iou(
    iou: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float
) -> jnp.ndarray:
    """Greedy-NMS keep mask given a precomputed (N, N) IoU matrix.

    Fixed-point iteration: a box is kept iff no higher-scoring *kept* box
    overlaps it above threshold. The iteration stabilizes in at most
    suppression-chain-depth passes (typically < 10), each pass a dense
    (N, N) masked reduction — far better on TPU than N sequential steps.
    """
    n = iou.shape[0]
    # "i suppresses j" candidates: i earlier in score order, iou > threshold.
    order_i = scores[:, None] > scores[None, :]
    # tie-break by index for exact determinism on equal scores
    tie = (scores[:, None] == scores[None, :]) & (
        jnp.arange(n)[:, None] < jnp.arange(n)[None, :]
    )
    earlier = order_i | tie
    suppress = (iou > iou_threshold) & earlier & valid[:, None] & valid[None, :]

    def body(state):
        keep, _, it = state
        new_keep = valid & ~jnp.any(suppress & keep[:, None], axis=0)
        return new_keep, jnp.any(new_keep != keep), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, jnp.array(True), jnp.array(0)))
    return keep


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    score_threshold: float = float("-inf"),
    max_outputs: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy hard NMS over (N, 4) xyxy boxes.

    Returns ``(indices, num_valid)``: indices of kept boxes sorted by score
    (padded with -1 to ``max_outputs`` or N).
    """
    n = boxes.shape[0]
    k = n if max_outputs is None else min(max_outputs, n)
    valid = scores > score_threshold
    iou = pairwise_iou(boxes, boxes)
    keep = _greedy_keep_from_iou(iou, scores, valid, iou_threshold)
    sel_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(sel_scores, k)
    idx = jnp.where(jnp.isfinite(top_scores), idx, -1)
    return idx, jnp.sum(keep.astype(jnp.int32))


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_threshold: float = 0.5,
    score_threshold: float = float("-inf"),
    max_outputs: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS: boxes of different classes never suppress each other.

    Uses the standard per-class coordinate-offset trick so one IoU matrix
    serves all classes. Replaces ``ops.NMSWithMask`` + host per-class loops
    (``pointpillars/src/core/nms.py:44-120``, ``post_process.py:36-61``).
    """
    span = jnp.max(boxes) - jnp.min(boxes) + 1.0
    offsets = classes.astype(boxes.dtype)[:, None] * span
    shifted = boxes + offsets
    return nms(shifted, scores, iou_threshold, score_threshold, max_outputs)


@functools.partial(jax.jit, static_argnames=("method", "top_k"))
def soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    sigma: float = 0.5,
    iou_threshold: float = 0.3,
    score_threshold: float = 0.001,
    method: str = "gaussian",
    top_k: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Soft-NMS (Bodla et al.): decay instead of suppress.

    Matches the semantics of the compiled Cython ``soft_nms`` the reference
    pulls in for CenterNet eval (``centernet/src/post_process.py:44-52``,
    method=2/gaussian, sigma=0.5, Nt=0.3, threshold=0.001).

    Returns ``(new_scores, order)``: rescored boxes and the selection order;
    boxes decayed below ``score_threshold`` get score 0.
    """
    n = boxes.shape[0]
    k = n if top_k is None else min(top_k, n)
    iou = pairwise_iou(boxes, boxes)

    def body(i, state):
        cur_scores, out_scores, order = state
        best = jnp.argmax(cur_scores)
        best_score = cur_scores[best]
        alive = best_score > score_threshold
        out_scores = out_scores.at[best].set(jnp.where(alive, best_score, 0.0))
        order = order.at[i].set(jnp.where(alive, best, -1))
        ov = iou[best]
        if method == "gaussian":
            decay = jnp.exp(-(ov * ov) / sigma)
        else:  # linear
            decay = jnp.where(ov > iou_threshold, 1.0 - ov, 1.0)
        cur_scores = cur_scores * decay
        cur_scores = cur_scores.at[best].set(-jnp.inf)  # selected: remove
        return cur_scores, out_scores, order

    init = (scores, jnp.zeros_like(scores), jnp.full((k,), -1, dtype=jnp.int32))
    _, out_scores, order = jax.lax.fori_loop(0, k, body, init)
    return out_scores, order


def rotated_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.1,
    score_threshold: float = float("-inf"),
    max_outputs: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over rotated BEV boxes (N, 5) = [x, y, w, l, yaw].

    On-device replacement for all three of the reference's native rotated-NMS
    paths (C++ ``boxes_iou_nms_cpu``, TIK ``nms3d``, CUDA ``nms_gpu``).
    """
    n = boxes.shape[0]
    k = n if max_outputs is None else min(max_outputs, n)
    valid = scores > score_threshold
    iou = rotated_iou_bev(boxes, boxes)
    keep = _greedy_keep_from_iou(iou, scores, valid, iou_threshold)
    sel_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(sel_scores, k)
    idx = jnp.where(jnp.isfinite(top_scores), idx, -1)
    return idx, jnp.sum(keep.astype(jnp.int32))


def circle_nms(
    centers: jnp.ndarray,
    scores: jnp.ndarray,
    radius: float,
    score_threshold: float = float("-inf"),
    max_outputs: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Center-distance NMS (CenterPoint's ``circle_nms_jit.py``) on device.

    Suppresses a box when its center lies within ``radius`` of a kept,
    higher-scoring center. ``centers`` is (N, 2).
    """
    n = centers.shape[0]
    k = n if max_outputs is None else min(max_outputs, n)
    valid = scores > score_threshold
    d2 = jnp.sum((centers[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    # reuse greedy machinery with "iou" = -distance^2 and threshold -radius^2
    keep = _greedy_keep_from_iou(-d2, scores, valid, -(radius * radius))
    sel_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(sel_scores, k)
    idx = jnp.where(jnp.isfinite(top_scores), idx, -1)
    return idx, jnp.sum(keep.astype(jnp.int32))
