"""Faster R-CNN and Mask R-CNN (ResNet-FPN), end-to-end static shapes.

The reference ships only stubs for this family (``minddet/models/
faster_rcnn.py:1-4``, ``heads/roi_head.py:1-4``, ``configs/faster_rcnn/``) —
its README promises them. This is the complete TPU-native two-stage detector:
ResNet+FPN backbone, RPN with on-device proposal NMS, static-shape proposal
sampling, ROIAlign through the Pallas gather kernel, class-specific box head,
and an optional mask branch. One jittable loss / predict program each.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.models.backbones.resnet import ResNet
from minddet_tpu.models.heads.roi_head import (
    BoxHead,
    MaskHead,
    box_head_loss,
    box_head_predict,
    mask_head_loss,
    sample_proposals,
)
from minddet_tpu.models.heads.rpn_head import RPNHead, generate_proposals
from minddet_tpu.models.necks.fpn import FPN
from minddet_tpu.ops.anchors2d import multilevel_anchors, rpn_targets
from minddet_tpu.ops.roi_align import multilevel_roi_align


@DETECTORS.register_module()
class FasterRCNN(nn.Module):
    num_classes: int = 80
    depth: int = 50
    image_hw: Tuple[int, int] = (512, 512)
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    anchor_scales: Sequence[float] = (8.0,)
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    rpn_pre_nms: int = 1000
    rpn_post_nms: int = 512
    roi_samples: int = 256
    with_mask: bool = False
    mask_stride: int = 4  # GT bitmap resolution = image_hw / mask_stride
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth, dtype=self.dtype)
        self.fpn = FPN(out_channels=256, extra_levels=1, dtype=self.dtype)
        self.rpn = RPNHead(
            num_anchors=len(self.anchor_scales) * len(self.anchor_ratios),
            dtype=self.dtype,
        )
        self.box_head = BoxHead(num_classes=self.num_classes, dtype=self.dtype)
        if self.with_mask:
            self.mask_head = MaskHead(num_classes=self.num_classes, dtype=self.dtype)

    # static anchor grid (numpy at trace time)
    def _anchors(self):
        a = multilevel_anchors(
            self.image_hw, self.strides, self.anchor_scales, self.anchor_ratios
        )
        sizes = []
        ih, iw = self.image_hw
        na = len(self.anchor_scales) * len(self.anchor_ratios)
        for s in self.strides:
            sizes.append((-(-ih // s)) * (-(-iw // s)) * na)
        return jnp.asarray(a), sizes

    def __call__(self, image: jnp.ndarray, train: bool = False):
        feats = self.backbone(image.astype(self.dtype), train=train)
        pyramids = self.fpn(feats, train=train)
        logits, deltas = self.rpn(pyramids)
        return pyramids, logits, deltas

    def loss(self, batch: Dict[str, jnp.ndarray], train: bool = True):
        """batch: image (B,H,W,3), gt_boxes (B,G,4), gt_classes (B,G) 0-based,
        gt_mask (B,G); with_mask also gt_bitmaps (B,H,W,G)."""
        image = batch["image"]
        b = image.shape[0]
        anchors, level_sizes = self._anchors()
        pyramids, logits, deltas = self(image, train=train)

        rng = self.make_rng("sampling")
        rngs = jax.random.split(rng, b * 2).reshape(b, 2, -1)

        # ---- RPN losses ----
        t = jax.vmap(
            lambda r, gb, gm: rpn_targets(r, anchors, gb, gm)
        )(rngs[:, 0], batch["gt_boxes"], batch["gt_mask"])
        obj = logits
        lbl = (t["labels"] == 1).astype(jnp.float32)
        bce = jnp.maximum(obj, 0) - obj * lbl + jnp.log1p(jnp.exp(-jnp.abs(obj)))
        rpn_cls = jnp.sum(bce * t["cls_weights"]) / jnp.maximum(
            jnp.sum(t["cls_weights"]), 1.0
        )
        diff = jnp.abs(deltas - t["deltas"])
        sl1 = jnp.where(diff < 1.0 / 9.0, 4.5 * diff * diff, diff - 1.0 / 18.0)
        rpn_reg = jnp.sum(jnp.sum(sl1, -1) * t["reg_weights"]) / jnp.maximum(
            jnp.sum(t["reg_weights"]), 1.0
        )

        # ---- proposals (no grad into RPN outputs) ----
        proposals, _ = generate_proposals(
            jax.lax.stop_gradient(logits),
            jax.lax.stop_gradient(deltas),
            anchors, level_sizes, self.image_hw,
            self.rpn_pre_nms, self.rpn_post_nms,
        )

        # ---- ROI sampling + box head ----
        samp = jax.vmap(
            lambda r, p, gb, gc, gm: sample_proposals(
                r, p, gb, gc, gm, self.roi_samples
            )
        )(rngs[:, 1], proposals, batch["gt_boxes"], batch["gt_classes"], batch["gt_mask"])
        roi_feats = multilevel_roi_align(
            pyramids[:4], samp["rois"], self.strides[:4], (7, 7)
        )
        cls_logits, box_deltas = self.box_head(roi_feats)
        roi_cls, roi_reg = box_head_loss(cls_logits, box_deltas, samp)

        total = rpn_cls + rpn_reg + roi_cls + roi_reg
        parts = {
            "rpn_cls": rpn_cls, "rpn_reg": rpn_reg,
            "roi_cls": roi_cls, "roi_reg": roi_reg,
        }
        if self.with_mask:
            mask_feats = multilevel_roi_align(
                pyramids[:4], samp["rois"], self.strides[:4], (14, 14)
            )
            mask_logits = self.mask_head(mask_feats)
            m_loss = mask_head_loss(mask_logits, batch["gt_bitmaps"], samp,
                                    stride=self.mask_stride)
            total = total + m_loss
            parts["mask"] = m_loss
        return total, parts

    def predict(
        self,
        image: jnp.ndarray,
        score_threshold: float = 0.05,
        nms_threshold: float = 0.5,
        max_detections: int = 100,
    ) -> Dict[str, jnp.ndarray]:
        anchors, level_sizes = self._anchors()
        pyramids, logits, deltas = self(image, train=False)
        proposals, _ = generate_proposals(
            logits, deltas, anchors, level_sizes, self.image_hw,
            self.rpn_pre_nms, self.rpn_post_nms,
        )
        roi_feats = multilevel_roi_align(
            pyramids[:4], proposals, self.strides[:4], (7, 7)
        )
        cls_logits, box_deltas = self.box_head(roi_feats)
        out = box_head_predict(
            cls_logits, box_deltas, proposals, self.image_hw,
            score_threshold, nms_threshold, max_detections,
        )
        if self.with_mask:
            mask_feats = multilevel_roi_align(
                pyramids[:4], out["boxes"], self.strides[:4], (14, 14)
            )
            mask_logits = self.mask_head(mask_feats)
            cls_idx = jnp.maximum(out["labels"], 0)
            masks = jnp.take_along_axis(
                jax.nn.sigmoid(mask_logits), cls_idx[:, :, None, None, None], axis=-1
            )[..., 0]
            out["masks"] = masks  # (B, D, 28, 28) in roi coords
        return out


@DETECTORS.register_module()
class MaskRCNN(FasterRCNN):
    """Faster R-CNN + mask branch (README-promised, reference-absent)."""

    with_mask: bool = True
