"""ROI heads: box classification/regression + mask branch (Mask R-CNN).

Fills the reference's 4-line stub ``minddet/models/heads/roi_head.py`` with a
TPU-native two-stage head: FPN ROIAlign through the Pallas gather kernel,
static-shape proposal sampling (randomized top-k), class-specific delta
regression, and a mask branch trained on ROIAlign-cropped GT masks.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from minddet_tpu.core.registry import ROI_HEAD
from minddet_tpu.ops.anchors2d import match_anchors, sample_balanced
from minddet_tpu.ops.box import clip_boxes, decode_deltas, encode_deltas
from minddet_tpu.ops.nms import batched_nms
from minddet_tpu.ops.roi_align import multilevel_roi_align, roi_align

BBOX_REG_STDS = (0.1, 0.1, 0.2, 0.2)


@ROI_HEAD.register_module()
class BoxHead(nn.Module):
    """ROIAlign 7x7 -> 2 FC -> (C+1) cls logits + C x 4 deltas."""

    num_classes: int = 80
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, r = roi_feats.shape[:2]
        x = roi_feats.reshape(b, r, -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc2")(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="cls")(x)
        reg = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="reg")(x)
        return cls.astype(jnp.float32), reg.reshape(b, r, self.num_classes, 4).astype(jnp.float32)


@ROI_HEAD.register_module()
class MaskHead(nn.Module):
    """ROIAlign 14x14 -> 4 convs -> deconv x2 -> per-class 28x28 masks."""

    num_classes: int = 80
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        b, r, ph, pw, c = roi_feats.shape
        x = roi_feats.reshape(b * r, ph, pw, c)
        for i in range(4):
            x = nn.relu(
                nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            )
        x = nn.relu(
            nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2), dtype=self.dtype, name="up")(x)
        )
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="out")(x)
        return x.reshape(b, r, ph * 2, pw * 2, self.num_classes).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Training-time proposal sampling & targets (static shapes)
# ---------------------------------------------------------------------------

def sample_proposals(
    rng: jax.Array,
    proposals: jnp.ndarray,   # (P, 4) one image
    gt_boxes: jnp.ndarray,    # (G, 4) padded
    gt_classes: jnp.ndarray,  # (G,) 0-based
    gt_mask: jnp.ndarray,     # (G,)
    num_samples: int = 256,
    pos_fraction: float = 0.25,
    pos_iou: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """Match + subsample proposals; returns fixed-size roi training set.

    GT boxes are appended to the proposal set (standard trick ensuring
    positives exist). Output rois (num_samples, 4) with cls targets in
    [0..C] (0 = background handled by +1 shift) and delta targets.
    """
    cand = jnp.concatenate([proposals, gt_boxes], axis=0)
    labels, match = match_anchors(
        cand, gt_boxes, gt_mask, pos_iou=pos_iou, neg_iou=pos_iou, force_match=False
    )
    weights = sample_balanced(rng, labels, num_samples, pos_fraction)
    # top-num_samples chosen indices (weights are 0/1): order by weight+noise
    pri = weights + jax.random.uniform(rng, weights.shape) * 0.5
    _, sel = jax.lax.top_k(pri, num_samples)
    rois = cand[sel]
    sel_labels = labels[sel]
    sel_match = match[sel]
    pos = sel_labels == 1
    cls_target = jnp.where(pos, gt_classes[sel_match] + 1, 0)  # 0 = background
    delta_target = encode_deltas(gt_boxes[sel_match], rois, stds=BBOX_REG_STDS)
    valid = weights[sel] > 0
    return {
        "rois": rois,
        "cls_target": cls_target.astype(jnp.int32),
        "delta_target": delta_target,
        "pos_mask": (pos & valid).astype(jnp.float32),
        "valid_mask": valid.astype(jnp.float32),
        "matched_gt": sel_match,
    }


def box_head_loss(
    cls_logits: jnp.ndarray,   # (B, R, C+1)
    deltas: jnp.ndarray,       # (B, R, C, 4)
    targets: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    ct = targets["cls_target"]
    vm = targets["valid_mask"]
    pm = targets["pos_mask"]
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    cls_loss = -jnp.take_along_axis(logp, ct[..., None], axis=-1)[..., 0]
    cls_loss = jnp.sum(cls_loss * vm) / jnp.maximum(jnp.sum(vm), 1.0)

    cls_idx = jnp.maximum(ct - 1, 0)
    pd = jnp.take_along_axis(
        deltas, cls_idx[..., None, None].repeat(4, -1), axis=2
    )[:, :, 0]
    diff = jnp.abs(pd - targets["delta_target"])
    sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    reg_loss = jnp.sum(jnp.sum(sl1, -1) * pm) / jnp.maximum(jnp.sum(pm), 1.0)
    return cls_loss, reg_loss


def mask_head_loss(
    mask_logits: jnp.ndarray,   # (B, R, 2m, 2m, C)
    features_gt_masks: jnp.ndarray,  # (B, H/s, W/s, G) dense GT bitmaps
    targets: Dict[str, jnp.ndarray],
    mask_size: int = 28,
    stride: int = 1,
) -> jnp.ndarray:
    """BCE on GT-mask crops: crop each roi's matched GT bitmap with ROIAlign.

    ``stride`` is the GT bitmap downsampling factor relative to the image the
    rois live in (the data pipeline ships bitmaps at image_hw/stride)."""
    b = mask_logits.shape[0]
    rois = targets["rois"] / float(stride)
    crops = roi_align(
        features_gt_masks.astype(jnp.float32), rois,
        (mask_size, mask_size), 2,
    )
    # select the matched GT channel per roi
    mg = targets["matched_gt"]
    crops = jnp.take_along_axis(
        crops, mg[:, :, None, None, None], axis=-1
    )[..., 0]  # (B, R, m, m)
    gt = (crops > 0.5).astype(jnp.float32)
    cls_idx = jnp.maximum(targets["cls_target"] - 1, 0)
    logits = jnp.take_along_axis(
        mask_logits, cls_idx[:, :, None, None, None], axis=-1
    )[..., 0]
    bce = jnp.maximum(logits, 0) - logits * gt + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    pm = targets["pos_mask"][:, :, None, None]
    return jnp.sum(bce * pm) / jnp.maximum(jnp.sum(pm) * mask_size * mask_size, 1.0)


# ---------------------------------------------------------------------------
# Inference
# ---------------------------------------------------------------------------

def box_head_predict(
    cls_logits: jnp.ndarray,
    deltas: jnp.ndarray,
    rois: jnp.ndarray,
    image_hw: Tuple[int, int],
    score_threshold: float = 0.05,
    nms_threshold: float = 0.5,
    max_detections: int = 100,
) -> Dict[str, jnp.ndarray]:
    """Per-class decode + batched NMS -> (B, max_detections) padded results."""
    b, r, c1 = cls_logits.shape
    c = c1 - 1
    probs = jax.nn.softmax(cls_logits, axis=-1)[..., 1:]  # (B, R, C)

    def per_image(pr, dl, ro):
        scores = pr.reshape(-1)  # (R*C,)
        classes = jnp.tile(jnp.arange(c), (r,))
        roi_rep = jnp.repeat(ro, c, axis=0)
        dl_flat = dl.reshape(-1, 4)
        boxes = decode_deltas(dl_flat, roi_rep, stds=BBOX_REG_STDS)
        boxes = clip_boxes(boxes, image_hw[0], image_hw[1])
        k = min(max_detections * 4, scores.shape[0])
        top_sc, top_i = jax.lax.top_k(scores, k)
        keep, _ = batched_nms(
            boxes[top_i], top_sc, classes[top_i], nms_threshold,
            score_threshold, max_detections,
        )
        sel = jnp.clip(keep, 0, k - 1)
        ok = keep >= 0
        return (
            jnp.where(ok[:, None], boxes[top_i][sel], 0.0),
            jnp.where(ok, top_sc[sel], 0.0),
            jnp.where(ok, classes[top_i][sel], -1),
        )

    boxes, scores, classes = jax.vmap(per_image)(probs, deltas, rois)
    return {"boxes": boxes, "scores": scores, "labels": classes}
