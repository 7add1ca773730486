"""YOLOv3: Darknet-53 backbone + anchor-based multi-scale head.

The classic anchor-based YOLO of the README zoo (v4/v5 differ mainly in
backbone blocks + aug — CSP variants are covered by ``yolox.py``'s
CSPDarknet). Assignment: each GT is matched to the best-IoU anchor shape at
its center cell (static one-hot scatter); noobj BCE is masked around ignored
high-IoU predictions, per the paper.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.ops.box import elementwise_iou, pairwise_iou
from minddet_tpu.ops.nms import batched_nms

YOLOV3_ANCHORS = (  # COCO anchors (w, h) pixels, per level stride 32/16/8
    ((116, 90), (156, 198), (373, 326)),
    ((30, 61), (62, 45), (59, 119)),
    ((10, 13), (16, 30), (33, 23)),
)


class _DarkConv(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), (self.strides, self.strides),
            padding=self.kernel // 2, use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="bn")(x)
        return nn.leaky_relu(x, 0.1)


class _Residual(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _DarkConv(self.features // 2, 1, dtype=self.dtype, name="c1")(x, train)
        y = _DarkConv(self.features, 3, dtype=self.dtype, name="c2")(y, train)
        return x + y


class Darknet53(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _DarkConv(32, 3, dtype=self.dtype, name="stem")(x, train)
        outs = []
        for si, (c, n) in enumerate(((64, 1), (128, 2), (256, 8), (512, 8), (1024, 4))):
            x = _DarkConv(c, 3, 2, dtype=self.dtype, name=f"down{si}")(x, train)
            for i in range(n):
                x = _Residual(c, dtype=self.dtype, name=f"res{si}_{i}")(x, train)
            outs.append(x)
        return outs[2], outs[3], outs[4]  # C3, C4, C5


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


@DETECTORS.register_module()
class YOLOv3(nn.Module):
    num_classes: int = 80
    image_hw: Tuple[int, int] = (416, 416)
    ignore_iou: float = 0.5
    dtype: Any = jnp.float32

    def _heads(self, c3, c4, c5, train):
        def block(x, c, name):
            for i in range(2):
                x = _DarkConv(c, 1, dtype=self.dtype, name=f"{name}_a{i}")(x, train)
                x = _DarkConv(c * 2, 3, dtype=self.dtype, name=f"{name}_b{i}")(x, train)
            x = _DarkConv(c, 1, dtype=self.dtype, name=f"{name}_mid")(x, train)
            out = _DarkConv(c * 2, 3, dtype=self.dtype, name=f"{name}_pre")(x, train)
            out = nn.Conv(3 * (5 + self.num_classes), (1, 1), dtype=self.dtype,
                          name=f"{name}_out")(out)
            return x, out

        x, o5 = block(c5, 512, "h5")
        x = _DarkConv(256, 1, dtype=self.dtype, name="route5")(x, train)
        x, o4 = block(jnp.concatenate([_up2(x), c4], -1), 256, "h4")
        x = _DarkConv(128, 1, dtype=self.dtype, name="route4")(x, train)
        _, o3 = block(jnp.concatenate([_up2(x), c3], -1), 128, "h3")
        return o5, o4, o3  # strides 32, 16, 8

    @nn.compact
    def __call__(self, image, train: bool = False) -> List[jnp.ndarray]:
        c3, c4, c5 = Darknet53(dtype=self.dtype, name="backbone")(
            image.astype(self.dtype), train=train
        )
        outs = self._heads(c3, c4, c5, train)
        shaped = []
        for o in outs:
            b, h, w, _ = o.shape
            shaped.append(
                o.reshape(b, h, w, 3, 5 + self.num_classes).astype(jnp.float32)
            )
        return shaped

    # -- decode one level ----------------------------------------------------
    def _decode_level(self, out, anchors, stride):
        b, h, w, na, _ = out.shape
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        aw = jnp.asarray([a[0] for a in anchors], jnp.float32)
        ah = jnp.asarray([a[1] for a in anchors], jnp.float32)
        cx = (jax.nn.sigmoid(out[..., 0]) + gx[None, :, :, None]) * stride
        cy = (jax.nn.sigmoid(out[..., 1]) + gy[None, :, :, None]) * stride
        bw = jnp.exp(jnp.clip(out[..., 2], -8, 8)) * aw
        bh = jnp.exp(jnp.clip(out[..., 3], -8, 8)) * ah
        boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
        return boxes.reshape(b, -1, 4), out[..., 4].reshape(b, -1), out[..., 5:].reshape(
            b, -1, self.num_classes
        )

    def loss(self, batch: Dict[str, jnp.ndarray], train: bool = True):
        outs = self(batch["image"], train=train)
        strides = (32, 16, 8)
        gt_boxes, gt_classes, gt_mask = (
            batch["gt_boxes"], batch["gt_classes"], batch["gt_mask"]
        )
        # best anchor shape per gt across all 9 anchors (by wh IoU)
        all_anchor_wh = jnp.asarray(
            [a for lvl in YOLOV3_ANCHORS for a in lvl], jnp.float32
        )  # (9, 2)
        gw = gt_boxes[..., 2] - gt_boxes[..., 0]
        gh = gt_boxes[..., 3] - gt_boxes[..., 1]
        inter = jnp.minimum(gw[..., None], all_anchor_wh[:, 0]) * jnp.minimum(
            gh[..., None], all_anchor_wh[:, 1]
        )
        union = gw[..., None] * gh[..., None] + all_anchor_wh[:, 0] * all_anchor_wh[:, 1] - inter
        best_anchor = jnp.argmax(inter / jnp.maximum(union, 1e-8), axis=-1)  # (B, G)

        total = 0.0
        parts = {}
        for li, (out, stride) in enumerate(zip(outs, strides)):
            b, h, w, na, _ = out.shape
            boxes, obj_logits, cls_logits = self._decode_level(
                out, YOLOV3_ANCHORS[li], stride
            )

            def level_targets(gb, gc, gm, ba):
                on_level = (ba // 3 == li) & gm
                ai = ba % 3
                cx = jnp.clip((gb[:, 0] + gb[:, 2]) / 2 / stride, 0, w - 1e-3)
                cy = jnp.clip((gb[:, 1] + gb[:, 3]) / 2 / stride, 0, h - 1e-3)
                cell = cy.astype(jnp.int32) * w * na + cx.astype(jnp.int32) * na + ai
                cell = jnp.where(on_level, cell, h * w * na)  # overflow slot
                tobj = jnp.zeros((h * w * na + 1,))
                tobj = tobj.at[cell].set(1.0, mode="drop")
                tbox = jnp.zeros((h * w * na + 1, 4))
                tbox = tbox.at[cell].set(gb, mode="drop")
                tcls = jnp.zeros((h * w * na + 1,), jnp.int32)
                tcls = tcls.at[cell].set(gc, mode="drop")
                return tobj[:-1], tbox[:-1], tcls[:-1]

            tobj, tbox, tcls = jax.vmap(level_targets)(
                gt_boxes, gt_classes, gt_mask, best_anchor
            )
            pos = tobj
            num_pos = jnp.maximum(jnp.sum(pos), 1.0)

            # ignore mask: predictions overlapping any gt above threshold
            def ignore(bx, gb, gm):
                iou = pairwise_iou(bx, gb)
                iou = jnp.where(gm[None, :], iou, 0.0)
                return jnp.max(iou, -1) > self.ignore_iou

            ign = jax.vmap(ignore)(boxes, gt_boxes, gt_mask).astype(jnp.float32)

            bce_obj = (
                jnp.maximum(obj_logits, 0) - obj_logits * pos
                + jnp.log1p(jnp.exp(-jnp.abs(obj_logits)))
            )
            obj_loss = jnp.sum(bce_obj * (pos + (1 - pos) * (1 - ign))) / num_pos

            iou = elementwise_iou(boxes, tbox)
            box_loss = jnp.sum((1.0 - iou) * pos) / num_pos

            onehot = jax.nn.one_hot(tcls, self.num_classes)
            bce_cls = (
                jnp.maximum(cls_logits, 0) - cls_logits * onehot
                + jnp.log1p(jnp.exp(-jnp.abs(cls_logits)))
            )
            cls_loss = jnp.sum(jnp.sum(bce_cls, -1) * pos) / num_pos

            total = total + obj_loss + 2.0 * box_loss + cls_loss
            parts[f"l{li}_obj"] = obj_loss
            parts[f"l{li}_box"] = box_loss
        return total, parts

    def predict(
        self, image, score_threshold: float = 0.05, nms_threshold: float = 0.45,
        max_detections: int = 100, pre_nms: int = 1000,
    ) -> Dict[str, jnp.ndarray]:
        outs = self(image, train=False)
        strides = (32, 16, 8)
        boxes_all, scores_all = [], []
        for li, (out, stride) in enumerate(zip(outs, strides)):
            boxes, obj, cls = self._decode_level(out, YOLOV3_ANCHORS[li], stride)
            boxes_all.append(boxes)
            scores_all.append(jax.nn.sigmoid(cls) * jax.nn.sigmoid(obj)[..., None])
        boxes = jnp.concatenate(boxes_all, 1)
        scores = jnp.concatenate(scores_all, 1)

        def per_image(bx, sc):
            s = jnp.max(sc, -1)
            lb = jnp.argmax(sc, -1)
            k = min(pre_nms, s.shape[0])
            top_s, top_i = jax.lax.top_k(s, k)
            keep, _ = batched_nms(
                bx[top_i], top_s, lb[top_i], nms_threshold,
                score_threshold, max_detections,
            )
            sel = jnp.clip(keep, 0, k - 1)
            ok = keep >= 0
            return (
                jnp.where(ok[:, None], bx[top_i][sel], 0.0),
                jnp.where(ok, top_s[sel], 0.0),
                jnp.where(ok, lb[top_i][sel], -1),
            )

        b, s, l = jax.vmap(per_image)(boxes, scores)
        return {"boxes": b, "scores": s, "labels": l}
