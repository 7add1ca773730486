"""Region Proposal Network head + on-device proposal generation.

Fills the reference's empty Faster R-CNN stack (``minddet/models/
faster_rcnn.py``, ``configs/faster_rcnn/``) the TPU way: shared 3x3 conv +
1x1 objectness/delta heads over every FPN level, per-level top-k, then one
batched NMS on the concatenated candidates — all static shapes, no host.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from minddet_tpu.core.registry import HEADS
from minddet_tpu.ops.box import clip_boxes, decode_deltas
from minddet_tpu.ops.nms import nms


@HEADS.register_module()
class RPNHead(nn.Module):
    num_anchors: int = 3
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (objectness (B, A_total), deltas (B, A_total, 4)) concat over levels."""
        conv = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="cls")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="reg")
        logits, deltas = [], []
        for f in feats:
            x = nn.relu(conv(f))
            b = x.shape[0]
            logits.append(cls(x).reshape(b, -1))
            deltas.append(reg(x).reshape(b, -1, 4))
        return (
            jnp.concatenate(logits, axis=1).astype(jnp.float32),
            jnp.concatenate(deltas, axis=1).astype(jnp.float32),
        )


def generate_proposals(
    logits: jnp.ndarray,        # (B, A)
    deltas: jnp.ndarray,        # (B, A, 4)
    anchors: jnp.ndarray,       # (A, 4)
    level_sizes: Sequence[int],  # anchors per level (sums to A)
    image_hw: Tuple[int, int],
    pre_nms_topk: int = 1000,
    post_nms_topk: int = 1000,
    nms_threshold: float = 0.7,
    min_size: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (proposals (B, post_nms_topk, 4), scores (B, post_nms_topk)).

    Per-level top-k (detectron semantics) then a single NMS across levels.
    """
    ih, iw = image_hw

    def per_image(lg, dl):
        cand_boxes, cand_scores = [], []
        start = 0
        for n in level_sizes:
            sl = lg[start : start + n]
            k = min(pre_nms_topk, n)
            sc, idx = jax.lax.top_k(sl, k)
            boxes = decode_deltas(dl[start + idx], anchors[start + idx])
            cand_boxes.append(boxes)
            cand_scores.append(sc)
            start += n
        boxes = clip_boxes(jnp.concatenate(cand_boxes, 0), ih, iw)
        scores = jnp.concatenate(cand_scores, 0)
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        valid = (w > min_size) & (h > min_size)
        scores = jnp.where(valid, scores, -jnp.inf)
        keep, _ = nms(boxes, scores, nms_threshold, max_outputs=post_nms_topk)
        sel = jnp.clip(keep, 0, boxes.shape[0] - 1)
        ok = keep >= 0
        return (
            jnp.where(ok[:, None], boxes[sel], 0.0),
            jnp.where(ok, jax.nn.sigmoid(scores[sel]), 0.0),
        )

    return jax.vmap(per_image)(logits, deltas)
