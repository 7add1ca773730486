"""YOLOX: anchor-free decoupled head with static-shape SimOTA assignment.

From the reference's promised-but-absent YOLO zoo (README) and BASELINE's
"YOLOv8-s / YOLOX-s COCO (anchor-free decoupled head, NMS-heavy)" config.
TPU notes: SimOTA's dynamic-k matching is reformulated as fixed-shape rank
arithmetic (argsort ranks vs per-GT k), so assignment jits into the train
step; decode + class-aware NMS run on device.

Cost simplification vs the paper: the classification term uses the GT class
probability only (-log sqrt(cls_p * obj_p)) instead of the full per-class BCE
matrix — same argmin in practice, O(G*A) instead of O(G*A*C) memory.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.models.backbones.csp_darknet import CSPDarknet, ConvBlock
from minddet_tpu.models.necks.pan import PAN
from minddet_tpu.ops.box import elementwise_iou, pairwise_iou
from minddet_tpu.ops.nms import batched_nms


def yolo_grid(image_hw: Tuple[int, int], strides=(8, 16, 32)):
    """Concatenated anchor-point centers (A, 2) xy pixels + strides (A,)."""
    pts, sts = [], []
    ih, iw = image_hw
    for s in strides:
        fh, fw = ih // s, iw // s
        ys, xs = np.meshgrid(np.arange(fh), np.arange(fw), indexing="ij")
        p = np.stack([(xs + 0.5) * s, (ys + 0.5) * s], -1).reshape(-1, 2)
        pts.append(p.astype(np.float32))
        sts.append(np.full((len(p),), s, np.float32))
    return np.concatenate(pts), np.concatenate(sts)


class YOLOXHead(nn.Module):
    num_classes: int = 80
    width: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        """-> (B, A, 4) raw reg, (B, A) obj logits, (B, A, C) cls logits."""
        regs, objs, clss = [], [], []
        for i, f in enumerate(feats):
            b = f.shape[0]
            x = ConvBlock(self.width, 1, dtype=self.dtype, name=f"stem{i}")(f, train)
            c = x
            for j in range(2):
                c = ConvBlock(self.width, 3, dtype=self.dtype, name=f"cls{i}_{j}")(c, train)
            r = x
            for j in range(2):
                r = ConvBlock(self.width, 3, dtype=self.dtype, name=f"reg{i}_{j}")(r, train)
            clss.append(
                nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        bias_init=nn.initializers.constant(-4.59), name=f"cls_out{i}")(c)
                .reshape(b, -1, self.num_classes)
            )
            regs.append(
                nn.Conv(4, (1, 1), dtype=self.dtype, name=f"reg_out{i}")(r).reshape(b, -1, 4)
            )
            objs.append(
                nn.Conv(1, (1, 1), dtype=self.dtype,
                        bias_init=nn.initializers.constant(-4.59), name=f"obj_out{i}")(r)
                .reshape(b, -1)
            )
        return (
            jnp.concatenate(regs, 1).astype(jnp.float32),
            jnp.concatenate(objs, 1).astype(jnp.float32),
            jnp.concatenate(clss, 1).astype(jnp.float32),
        )


def decode_yolox(reg, points, strides):
    """raw (..., 4) -> xyxy: xy = point + pred*stride, wh = exp(pred)*stride."""
    xy = points + reg[..., :2] * strides[..., None]
    wh = jnp.exp(jnp.clip(reg[..., 2:], -10, 8)) * strides[..., None]
    return jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)


def _bce(logits, target):
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def simota_assign(
    boxes: jnp.ndarray,      # (A, 4) decoded xyxy
    obj_logits: jnp.ndarray,  # (A,)
    cls_logits: jnp.ndarray,  # (A, C)
    points: jnp.ndarray,      # (A, 2)
    strides: jnp.ndarray,     # (A,)
    gt_boxes: jnp.ndarray,    # (G, 4)
    gt_classes: jnp.ndarray,  # (G,)
    gt_mask: jnp.ndarray,     # (G,)
    center_radius: float = 2.5,
    topk_ious: int = 10,
) -> Dict[str, jnp.ndarray]:
    """One image's SimOTA -> fg mask (A,), matched gt (A,), matched iou (A,)."""
    a = boxes.shape[0]
    g = gt_boxes.shape[0]
    px, py = points[:, 0], points[:, 1]

    in_box = (
        (px[None] >= gt_boxes[:, 0:1]) & (px[None] <= gt_boxes[:, 2:3])
        & (py[None] >= gt_boxes[:, 1:2]) & (py[None] <= gt_boxes[:, 3:4])
    )  # (G, A)
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    r = center_radius * strides[None]
    in_center = (
        (px[None] >= gcx[:, None] - r) & (px[None] <= gcx[:, None] + r)
        & (py[None] >= gcy[:, None] - r) & (py[None] <= gcy[:, None] + r)
    )
    cand = (in_box | in_center) & gt_mask[:, None]
    strong = in_box & in_center

    iou = pairwise_iou(gt_boxes, boxes)  # (G, A)
    iou = jnp.where(gt_mask[:, None], iou, 0.0)
    cls_p = jax.nn.sigmoid(cls_logits)  # (A, C)
    obj_p = jax.nn.sigmoid(obj_logits)  # (A,)
    gt_cls_p = cls_p[:, jnp.where(gt_mask, gt_classes, 0)].T  # (G, A)
    score = jnp.sqrt(jnp.clip(gt_cls_p * obj_p[None], 1e-8, 1.0))
    cost = (
        -jnp.log(score)
        + 3.0 * -jnp.log(jnp.clip(iou, 1e-8, 1.0))
        + 1e5 * (~cand) + 1e4 * (~strong)
    )

    # dynamic k per gt
    k_iou = jax.lax.top_k(jnp.where(cand, iou, 0.0), min(topk_ious, a))[0]
    dyn_k = jnp.clip(jnp.sum(k_iou, axis=1).astype(jnp.int32), 1, topk_ious)
    dyn_k = jnp.where(gt_mask, dyn_k, 0)

    order = jnp.argsort(cost, axis=1)
    rank = jnp.argsort(order, axis=1)  # rank of each anchor per gt
    matched = (rank < dyn_k[:, None]) & cand  # (G, A)

    # conflict resolution: anchor keeps its min-cost gt
    any_match = jnp.any(matched, axis=0)
    masked_cost = jnp.where(matched, cost, jnp.inf)
    best_gt = jnp.argmin(masked_cost, axis=0)
    return {
        "fg": any_match,
        "matched_gt": best_gt,
        "matched_iou": iou[best_gt, jnp.arange(a)],
    }


@DETECTORS.register_module()
class YOLOX(nn.Module):
    """YOLOX-s by default (depth 0.33, width 0.5)."""

    num_classes: int = 80
    image_hw: Tuple[int, int] = (640, 640)
    depth_mult: float = 0.33
    width_mult: float = 0.5
    strides: Sequence[int] = (8, 16, 32)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = CSPDarknet(
            depth_mult=self.depth_mult, width_mult=self.width_mult, dtype=self.dtype
        )
        w = max(16, int(256 * self.width_mult // 8 * 8))
        self.neck = PAN(
            out_channels=(w, w * 2, w * 4),
            depth=max(1, round(3 * self.depth_mult)), dtype=self.dtype,
        )
        self.head = YOLOXHead(self.num_classes, width=w, dtype=self.dtype)

    def _grid(self):
        pts, sts = yolo_grid(self.image_hw, tuple(self.strides))
        return jnp.asarray(pts), jnp.asarray(sts)

    def __call__(self, image: jnp.ndarray, train: bool = False):
        feats = self.backbone(image.astype(self.dtype), train=train)
        p3, p4, p5 = self.neck(feats, train=train)
        return self.head((p3, p4, p5), train=train)

    def loss(self, batch: Dict[str, jnp.ndarray], train: bool = True):
        reg, obj, cls = self(batch["image"], train=train)
        points, strides = self._grid()
        boxes = decode_yolox(reg, points[None], strides[None])

        def per_image(bx, ob, cl, gb, gc, gm):
            return simota_assign(bx, ob, cl, points, strides, gb, gc, gm)

        assign = jax.vmap(per_image)(
            boxes, obj, cls, batch["gt_boxes"], batch["gt_classes"], batch["gt_mask"]
        )
        fg = assign["fg"].astype(jnp.float32)
        num_fg = jnp.maximum(jnp.sum(fg), 1.0)

        obj_loss = jnp.sum(_bce(obj, fg)) / num_fg
        mg = assign["matched_gt"]
        tgt_cls = jax.nn.one_hot(
            jnp.take_along_axis(batch["gt_classes"], mg, axis=1), self.num_classes
        ) * assign["matched_iou"][..., None]
        cls_loss = jnp.sum(_bce(cls, tgt_cls) * fg[..., None]) / num_fg

        gt_per_anchor = jnp.take_along_axis(
            batch["gt_boxes"], mg[..., None].repeat(4, -1), axis=1
        )
        iou = elementwise_iou(boxes, gt_per_anchor)
        iou_loss = jnp.sum((1.0 - iou ** 2) * fg) / num_fg

        total = 5.0 * iou_loss + obj_loss + cls_loss
        return total, {"iou_loss": iou_loss, "obj_loss": obj_loss, "cls_loss": cls_loss}

    def predict(
        self,
        image: jnp.ndarray,
        score_threshold: float = 0.01,
        nms_threshold: float = 0.65,
        max_detections: int = 100,
        pre_nms: int = 1000,
    ) -> Dict[str, jnp.ndarray]:
        reg, obj, cls = self(image, train=False)
        points, strides = self._grid()
        boxes = decode_yolox(reg, points[None], strides[None])
        scores_all = jax.nn.sigmoid(cls) * jax.nn.sigmoid(obj)[..., None]

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

        b, s, l = jax.vmap(per_image)(boxes, scores_all)
        return {"boxes": b, "scores": s, "labels": l}
