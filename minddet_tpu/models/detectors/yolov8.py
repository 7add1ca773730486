"""YOLOv8: C2f backbone, anchor-free DFL head, task-aligned assignment.

Completes the README-promised "YOLO v3-v8" span together with
``yolov3.py``/``yolox.py``. The Distribution Focal Loss head regresses each
box side as a 16-bin distribution (softmax expectation decode); assignment is
TAL (align metric = cls_p^a * iou^b, top-k per GT) in fixed shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.models.backbones.csp_darknet import CSPDarknet, ConvBlock
from minddet_tpu.models.necks.pan import C2fPAN
from minddet_tpu.models.detectors.yolox import _bce, yolo_grid
from minddet_tpu.ops.box import elementwise_iou, pairwise_iou
from minddet_tpu.ops.nms import batched_nms

REG_MAX = 16  # DFL bins per side


class YOLOv8Head(nn.Module):
    """Decoupled DFL head with ultralytics' branch widths: the reg branch
    runs at ``max(16, P3_width/4, 4*REG_MAX)`` and the cls branch at
    ``max(P3_width, min(nc, 100))`` (ultralytics ``Detect.__init__`` c2/c3)
    — checkpoint conversion parity depends on these exact widths."""

    num_classes: int = 80
    width: int = 128  # P3 channel count
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        """-> dfl logits (B, A, 4, REG_MAX), cls logits (B, A, C)."""
        w_reg = max(16, self.width // 4, 4 * REG_MAX)
        w_cls = max(self.width, min(self.num_classes, 100))
        dfls, clss = [], []
        for i, f in enumerate(feats):
            b = f.shape[0]
            r = ConvBlock(w_reg, 3, dtype=self.dtype, name=f"reg{i}_0")(f, train)
            r = ConvBlock(w_reg, 3, dtype=self.dtype, name=f"reg{i}_1")(r, train)
            dfls.append(
                nn.Conv(4 * REG_MAX, (1, 1), dtype=self.dtype, name=f"reg_out{i}")(r)
                .reshape(b, -1, 4, REG_MAX)
            )
            c = ConvBlock(w_cls, 3, dtype=self.dtype, name=f"cls{i}_0")(f, train)
            c = ConvBlock(w_cls, 3, dtype=self.dtype, name=f"cls{i}_1")(c, train)
            clss.append(
                nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        bias_init=nn.initializers.constant(-4.59),
                        name=f"cls_out{i}")(c).reshape(b, -1, self.num_classes)
            )
        return (
            jnp.concatenate(dfls, 1).astype(jnp.float32),
            jnp.concatenate(clss, 1).astype(jnp.float32),
        )


def dfl_decode(dfl_logits, points, strides):
    """distribution -> ltrb distances -> xyxy boxes."""
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    dist = jnp.sum(jax.nn.softmax(dfl_logits, -1) * bins, -1)  # (B, A, 4) ltrb
    d = dist * strides[..., None]
    x1 = points[..., 0] - d[..., 0]
    y1 = points[..., 1] - d[..., 1]
    x2 = points[..., 0] + d[..., 2]
    y2 = points[..., 1] + d[..., 3]
    return jnp.stack([x1, y1, x2, y2], -1)


def tal_assign(
    boxes, cls_logits, points, gt_boxes, gt_classes, gt_mask,
    topk: int = 10, alpha: float = 0.5, beta: float = 6.0,
):
    """Task-aligned assignment for one image -> fg, matched_gt, align metric."""
    a = boxes.shape[0]
    px, py = points[:, 0], points[:, 1]
    in_box = (
        (px[None] >= gt_boxes[:, 0:1]) & (px[None] <= gt_boxes[:, 2:3])
        & (py[None] >= gt_boxes[:, 1:2]) & (py[None] <= gt_boxes[:, 3:4])
        & gt_mask[:, None]
    )  # (G, A)
    iou = jnp.where(gt_mask[:, None], pairwise_iou(gt_boxes, boxes), 0.0)
    cls_p = jax.nn.sigmoid(cls_logits)
    gt_p = cls_p[:, jnp.where(gt_mask, gt_classes, 0)].T  # (G, A)
    metric = jnp.power(jnp.clip(gt_p, 1e-8, 1), alpha) * jnp.power(
        jnp.clip(iou, 1e-8, 1), beta
    )
    metric = jnp.where(in_box, metric, 0.0)
    order = jnp.argsort(-metric, axis=1)
    rank = jnp.argsort(order, axis=1)
    matched = (rank < topk) & (metric > 0)
    any_match = jnp.any(matched, axis=0)
    best_gt = jnp.argmax(jnp.where(matched, metric, -1.0), axis=0)
    # normalize metric per gt (soft cls target scaling, TAL paper)
    m_max = jnp.max(metric, axis=1, keepdims=True)
    i_max = jnp.max(jnp.where(matched, iou, 0.0), axis=1, keepdims=True)
    norm = metric / jnp.maximum(m_max, 1e-8) * i_max
    return {
        "fg": any_match,
        "matched_gt": best_gt,
        "soft_target": norm[best_gt, jnp.arange(a)],
    }


@DETECTORS.register_module()
class YOLOv8(nn.Module):
    """YOLOv8-s by default."""

    num_classes: int = 80
    image_hw: Tuple[int, int] = (640, 640)
    depth_mult: float = 0.33
    width_mult: float = 0.5
    strides: Sequence[int] = (8, 16, 32)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = CSPDarknet(
            depth_mult=self.depth_mult, width_mult=self.width_mult,
            use_c2f=True, dtype=self.dtype,
        )
        w = max(16, int(256 * self.width_mult // 8 * 8))
        self.neck = C2fPAN(
            out_channels=(w, w * 2, w * 4),
            depth=max(1, round(3 * self.depth_mult)), dtype=self.dtype,
        )
        self.head = YOLOv8Head(self.num_classes, width=w, dtype=self.dtype)

    def _grid(self):
        pts, sts = yolo_grid(self.image_hw, tuple(self.strides))
        return jnp.asarray(pts), jnp.asarray(sts)

    def __call__(self, image, train: bool = False):
        feats = self.backbone(image.astype(self.dtype), train=train)
        pyr = self.neck(feats, train=train)
        return self.head(pyr, train=train)

    def loss(self, batch: Dict[str, jnp.ndarray], train: bool = True):
        dfl, cls = self(batch["image"], train=train)
        points, strides = self._grid()
        boxes = dfl_decode(dfl, points[None], strides[None])

        assign = jax.vmap(
            lambda bx, cl, gb, gc, gm: tal_assign(bx, cl, points, gb, gc, gm)
        )(boxes, cls, batch["gt_boxes"], batch["gt_classes"], batch["gt_mask"])
        fg = assign["fg"].astype(jnp.float32)
        num_fg = jnp.maximum(jnp.sum(assign["soft_target"] * fg), 1.0)

        mg = assign["matched_gt"]
        tgt_cls = jax.nn.one_hot(
            jnp.take_along_axis(batch["gt_classes"], mg, axis=1), self.num_classes
        ) * (assign["soft_target"] * fg)[..., None]
        cls_loss = jnp.sum(_bce(cls, tgt_cls)) / num_fg

        gt_boxes_pa = jnp.take_along_axis(
            batch["gt_boxes"], mg[..., None].repeat(4, -1), axis=1
        )
        iou = elementwise_iou(boxes, gt_boxes_pa)
        w = assign["soft_target"] * fg
        iou_loss = jnp.sum((1.0 - iou) * w) / num_fg

        # DFL loss: soft CE against the two integer bins around the target
        d_target = jnp.stack(
            [
                (points[None, :, 0] - gt_boxes_pa[..., 0]),
                (points[None, :, 1] - gt_boxes_pa[..., 1]),
                (gt_boxes_pa[..., 2] - points[None, :, 0]),
                (gt_boxes_pa[..., 3] - points[None, :, 1]),
            ],
            axis=-1,
        ) / strides[None, :, None]
        d_target = jnp.clip(d_target, 0, REG_MAX - 1 - 1e-3)
        lo = jnp.floor(d_target)
        hi = lo + 1
        w_hi = d_target - lo
        logp = jax.nn.log_softmax(dfl, -1)
        ce = -(
            jnp.take_along_axis(logp, lo[..., None].astype(jnp.int32), -1)[..., 0]
            * (1 - w_hi)
            + jnp.take_along_axis(logp, hi[..., None].astype(jnp.int32), -1)[..., 0]
            * w_hi
        )
        dfl_loss = jnp.sum(jnp.mean(ce, -1) * w) / num_fg

        total = 7.5 * iou_loss + 0.5 * cls_loss + 1.5 * dfl_loss
        return total, {
            "iou_loss": iou_loss, "cls_loss": cls_loss, "dfl_loss": dfl_loss,
        }

    def predict(
        self, image, score_threshold: float = 0.01, nms_threshold: float = 0.7,
        max_detections: int = 100, pre_nms: int = 1000,
    ) -> Dict[str, jnp.ndarray]:
        dfl, cls = self(image, train=False)
        points, strides = self._grid()
        boxes = dfl_decode(dfl, points[None], strides[None])
        scores_all = jax.nn.sigmoid(cls)

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
