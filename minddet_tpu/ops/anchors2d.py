"""2D anchor machinery for the R-CNN / SSD / RetinaNet family.

The reference advertises Faster/Mask R-CNN and SSD but ships only stubs
(``minddet/models/faster_rcnn.py:1-4``, ``configs/faster_rcnn/readme.md``).
This module supplies the missing layer TPU-style: anchors are static numpy
grids computed at build time; matching and sampling are fixed-shape batched
XLA (randomized top-k instead of ``np.random.choice``), so the whole target
path lives inside the jitted train step.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.ops.box import encode_deltas, pairwise_iou


def grid_anchors(
    feature_hw: Tuple[int, int],
    stride: int,
    scales: Sequence[float] = (8.0,),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """(H*W*A, 4) xyxy anchors for one level, centers at (i+0.5)*stride."""
    h, w = feature_hw
    base = []
    for s in scales:
        for r in ratios:
            size = s * stride
            bw = size * np.sqrt(1.0 / r)
            bh = size * np.sqrt(r)
            base.append([-bw / 2, -bh / 2, bw / 2, bh / 2])
    base = np.asarray(base, np.float32)  # (A, 4)
    ys = (np.arange(h, dtype=np.float32) + 0.5) * stride
    xs = (np.arange(w, dtype=np.float32) + 0.5) * stride
    cx, cy = np.meshgrid(xs, ys)
    shifts = np.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def multilevel_anchors(
    image_hw: Tuple[int, int],
    strides: Sequence[int],
    scales: Sequence[float] = (8.0,),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    scales_per_level: Optional[Sequence[Sequence[float]]] = None,
) -> np.ndarray:
    """Concatenated anchors over FPN levels -> (A_total, 4)."""
    ih, iw = image_hw
    out = []
    for li, s in enumerate(strides):
        fh, fw = -(-ih // s), -(-iw // s)
        sc = scales_per_level[li] if scales_per_level is not None else scales
        out.append(grid_anchors((fh, fw), s, sc, ratios))
    return np.concatenate(out, axis=0)


def match_anchors(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    pos_iou: float = 0.7,
    neg_iou: float = 0.3,
    force_match: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Max-IoU matcher -> (labels (A,), matched_gt_idx (A,)).

    labels: 1 positive, 0 negative, -1 ignore. Each GT's best anchor is forced
    positive (ties included), detectron-style.
    """
    iou = pairwise_iou(anchors, gt_boxes)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    a_max = jnp.max(iou, axis=1)
    a_arg = jnp.argmax(iou, axis=1)

    labels = jnp.full((anchors.shape[0],), -1, jnp.int32)
    labels = jnp.where(a_max < neg_iou, 0, labels)
    labels = jnp.where(a_max >= pos_iou, 1, labels)
    if force_match:
        g_best = jnp.max(iou, axis=0)
        forced = jnp.any(
            (iou == g_best[None, :]) & (iou > 0) & gt_mask[None, :], axis=1
        )
        labels = jnp.where(forced, 1, labels)
    return labels, a_arg


def sample_balanced(
    rng: jax.Array,
    labels: jnp.ndarray,
    num_samples: int = 256,
    pos_fraction: float = 0.5,
) -> jnp.ndarray:
    """Randomized fixed-size pos/neg sampling -> weight mask (A,) in {0, 1}.

    Static-shape replacement for detectron's np.random.choice subsampling
    (cf. create_target_np's positive_fraction branch): positives get priority
    2+U(0,1) capped at num_pos, negatives 1+U(0,1); top-k(num_samples) wins.
    """
    a = labels.shape[0]
    num_pos = int(num_samples * pos_fraction)
    r1, r2 = jax.random.split(rng)
    u = jax.random.uniform(r1, (a,))
    pos = labels == 1
    neg = labels == 0
    # cap positives at num_pos by random rank among positives
    pos_key = jnp.where(pos, u, -1.0)
    kth = jax.lax.top_k(pos_key, min(num_pos, a))[0][-1]
    pos_keep = pos & (pos_key >= jnp.maximum(kth, 0.0))
    pri = jnp.where(pos_keep, 2.0 + u, jnp.where(neg, 1.0 + jax.random.uniform(r2, (a,)), 0.0))
    thresh = jax.lax.top_k(pri, min(num_samples, a))[0][-1]
    chosen = (pri >= jnp.maximum(thresh, 1.0)) & (pos_keep | neg)
    return chosen.astype(jnp.float32)


def rpn_targets(
    rng: jax.Array,
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    num_samples: int = 256,
    pos_iou: float = 0.7,
    neg_iou: float = 0.3,
) -> Dict[str, jnp.ndarray]:
    """One image's RPN training targets (objectness + deltas + sample mask)."""
    labels, match = match_anchors(anchors, gt_boxes, gt_mask, pos_iou, neg_iou)
    weights = sample_balanced(rng, labels, num_samples, 0.5)
    deltas = encode_deltas(gt_boxes[match], anchors)
    pos = (labels == 1).astype(jnp.float32)
    return {
        "labels": labels,
        "deltas": deltas,
        "cls_weights": weights,
        "reg_weights": weights * pos,
    }
