"""YOLOv5: CSPDarknet + PAN + anchor-based head (sigmoid^2 decode, CIoU).

Fills the reference's README-advertised "yolo v5" row (``README.md:11`` —
zero code in the tree). Clean-room, TPU-first: the v5 cross-grid assignment
(each GT claims its center cell plus the two nearest neighbor cells, on every
anchor whose w/h ratio to the GT is within ``ratio_thresh``) is a static
one-hot scatter into per-level target maps — no dynamic shapes, the whole
loss jits into one program. ``_AnchorYOLO`` is the shared core for the
v4/v5/v7 family (``yolov4.py``/``yolov7.py`` pick backbones + decode flavor).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.models.backbones.csp_darknet import CSPDarknet
from minddet_tpu.models.necks.pan import PAN
from minddet_tpu.ops.box import elementwise_ciou
from minddet_tpu.ops.nms import batched_nms

# (w, h) pixel anchors per level, stride 8 / 16 / 32 (P3, P4, P5).
YOLOV5_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)


def yolov5_assign(
    gt_boxes: jnp.ndarray,      # (G, 4) xyxy pixels
    gt_classes: jnp.ndarray,    # (G,) int
    gt_mask: jnp.ndarray,       # (G,) bool
    anchors_wh: jnp.ndarray,    # (na, 2) this level's anchor shapes, pixels
    stride: float,
    hw: Tuple[int, int],
    ratio_thresh: float = 4.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """v5 assignment for one image, one level -> dense target maps.

    Returns (pos, tbox, tcls) flattened over h*w*na: pos is the {0,1}
    positive mask, tbox the matched GT box (xyxy pixels), tcls the class id.
    Each GT scatters up to 3 cells x na anchors; invalid candidates route to
    an overflow slot that is sliced off (same idiom as ``yolov3.level_targets``).
    """
    h, w = hw
    na = anchors_wh.shape[0]
    g = gt_boxes.shape[0]

    gw = gt_boxes[:, 2] - gt_boxes[:, 0]
    gh = gt_boxes[:, 3] - gt_boxes[:, 1]
    # ratio gate: max(gt/anchor, anchor/gt) over w and h below threshold
    rw = gw[:, None] / jnp.maximum(anchors_wh[None, :, 0], 1e-8)
    rh = gh[:, None] / jnp.maximum(anchors_wh[None, :, 1], 1e-8)
    ratio = jnp.maximum(
        jnp.maximum(rw, 1.0 / jnp.maximum(rw, 1e-8)),
        jnp.maximum(rh, 1.0 / jnp.maximum(rh, 1e-8)),
    )  # (G, na)
    anchor_ok = (ratio < ratio_thresh) & gt_mask[:, None]

    cx = jnp.clip((gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5 / stride, 0, w - 1e-3)
    cy = jnp.clip((gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5 / stride, 0, h - 1e-3)
    ix = cx.astype(jnp.int32)
    iy = cy.astype(jnp.int32)
    # neighbor cells: toward the nearer x and y edge of the center cell
    nx = jnp.where(cx - ix < 0.5, ix - 1, ix + 1)
    ny = jnp.where(cy - iy < 0.5, iy - 1, iy + 1)
    cand_x = jnp.stack([ix, nx, ix], -1)  # (G, 3)
    cand_y = jnp.stack([iy, iy, ny], -1)
    in_bounds = (cand_x >= 0) & (cand_x < w) & (cand_y >= 0) & (cand_y < h)

    # (G, 3 cells, na) candidate flat indices into h*w*na (+1 overflow)
    base = cand_y * (w * na) + cand_x * na  # (G, 3)
    idx = base[:, :, None] + jnp.arange(na)[None, None, :]
    valid = in_bounds[:, :, None] & anchor_ok[:, None, :]
    idx = jnp.where(valid, idx, h * w * na).reshape(-1)

    flat = h * w * na + 1
    pos = jnp.zeros((flat,)).at[idx].set(1.0, mode="drop")
    tbox = jnp.zeros((flat, 4)).at[idx].set(
        jnp.broadcast_to(gt_boxes[:, None, None, :], (g, 3, na, 4)).reshape(-1, 4),
        mode="drop",
    )
    tcls = jnp.zeros((flat,), jnp.int32).at[idx].set(
        jnp.broadcast_to(gt_classes[:, None, None], (g, 3, na)).reshape(-1),
        mode="drop",
    )
    return pos[:-1], tbox[:-1], tcls[:-1]


class _AnchorYOLO(nn.Module):
    """Shared anchor-based YOLO core (v4/v5/v7): multi-scale coupled head,
    ratio/cross-grid assignment, CIoU box loss, IoU-weighted objectness.

    Subclasses choose the backbone via ``_backbone()`` and the box decode via
    ``decode_flavor`` — "sigmoid2" (v5/v7: xy = (2s-0.5+grid)*stride,
    wh = (2s)^2*anchor) or "exp" (v4: v3-style exp wh).
    """

    num_classes: int = 80
    image_hw: Tuple[int, int] = (640, 640)
    anchors: Any = YOLOV5_ANCHORS
    decode_flavor: str = "sigmoid2"
    ratio_thresh: float = 4.0
    width_mult: float = 0.5
    depth_mult: float = 0.33
    dtype: Any = jnp.float32

    # level balance weights for the objectness BCE (P3, P4, P5)
    OBJ_BALANCE = (4.0, 1.0, 0.4)
    STRIDES = (8, 16, 32)

    def _backbone(self, image, train):
        c3, c4, c5 = CSPDarknet(
            depth_mult=self.depth_mult, width_mult=self.width_mult,
            depths=(3, 6, 9, 3), dtype=self.dtype, name="backbone",
        )(image, train=train)
        return c3, c4, c5

    def _neck_channels(self) -> Tuple[int, int, int]:
        def w(c):
            return max(16, int(c * self.width_mult // 8 * 8))

        return (w(256), w(512), w(1024))

    @nn.compact
    def __call__(self, image, train: bool = False) -> List[jnp.ndarray]:
        feats = self._backbone(image.astype(self.dtype), train)
        p3, p4, p5 = PAN(self._neck_channels(), dtype=self.dtype, name="neck")(
            feats, train=train
        )
        outs = []
        for i, f in enumerate((p3, p4, p5)):
            na = len(self.anchors[i])
            o = nn.Conv(na * (5 + self.num_classes), (1, 1), dtype=self.dtype,
                        name=f"head{i}")(f)
            b, h, w, _ = o.shape
            outs.append(
                o.reshape(b, h, w, na, 5 + self.num_classes).astype(jnp.float32)
            )
        return outs  # strides 8, 16, 32

    # -- decode one level ----------------------------------------------------
    def _decode_level(self, out, anchors, stride):
        b, h, w, na, _ = out.shape
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        aw = jnp.asarray([a[0] for a in anchors], jnp.float32)
        ah = jnp.asarray([a[1] for a in anchors], jnp.float32)
        if self.decode_flavor == "sigmoid2":
            s = jax.nn.sigmoid(out[..., :4])
            cx = (2.0 * s[..., 0] - 0.5 + gx[None, :, :, None]) * stride
            cy = (2.0 * s[..., 1] - 0.5 + gy[None, :, :, None]) * stride
            bw = (2.0 * s[..., 2]) ** 2 * aw
            bh = (2.0 * s[..., 3]) ** 2 * ah
        else:  # "exp": classic v3/v4 decode
            cx = (jax.nn.sigmoid(out[..., 0]) + gx[None, :, :, None]) * stride
            cy = (jax.nn.sigmoid(out[..., 1]) + gy[None, :, :, None]) * stride
            bw = jnp.exp(jnp.clip(out[..., 2], -8, 8)) * aw
            bh = jnp.exp(jnp.clip(out[..., 3], -8, 8)) * ah
        boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
        return (
            boxes.reshape(b, -1, 4),
            out[..., 4].reshape(b, -1),
            out[..., 5:].reshape(b, -1, self.num_classes),
        )

    def loss(self, batch: Dict[str, jnp.ndarray], train: bool = True):
        outs = self(batch["image"], train=train)
        gt_boxes, gt_classes, gt_mask = (
            batch["gt_boxes"], batch["gt_classes"], batch["gt_mask"]
        )

        def bce(logits, target):
            return (
                jnp.maximum(logits, 0) - logits * target
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )

        total = 0.0
        parts: Dict[str, jnp.ndarray] = {}
        box_l = obj_l = cls_l = 0.0
        for li, (out, stride) in enumerate(zip(outs, self.STRIDES)):
            b, h, w, na, _ = out.shape
            anchors_wh = jnp.asarray(self.anchors[li], jnp.float32)
            boxes, obj_logits, cls_logits = self._decode_level(
                out, self.anchors[li], stride
            )

            pos, tbox, tcls = jax.vmap(
                lambda gb, gc, gm: yolov5_assign(
                    gb, gc, gm, anchors_wh, stride, (h, w), self.ratio_thresh
                )
            )(gt_boxes, gt_classes, gt_mask)
            num_pos = jnp.maximum(jnp.sum(pos), 1.0)

            ciou = elementwise_ciou(boxes, tbox)
            box_loss = jnp.sum((1.0 - ciou) * pos) / num_pos

            # v5 objectness target: the (detached) prediction quality at positives
            tobj = pos * jax.lax.stop_gradient(jnp.clip(ciou, 0.0, 1.0))
            obj_loss = jnp.mean(bce(obj_logits, tobj)) * self.OBJ_BALANCE[li]

            onehot = jax.nn.one_hot(tcls, self.num_classes)
            cls_loss = (
                jnp.sum(jnp.sum(bce(cls_logits, onehot), -1) * pos) / num_pos
            )

            box_l = box_l + box_loss
            obj_l = obj_l + obj_loss
            cls_l = cls_l + cls_loss
        total = 0.05 * box_l + 1.0 * obj_l + 0.5 * cls_l
        parts = {"box_loss": box_l, "obj_loss": obj_l, "cls_loss": cls_l}
        return total, parts

    def predict(
        self, image, score_threshold: float = 0.05, nms_threshold: float = 0.45,
        max_detections: int = 100, pre_nms: int = 1000,
    ) -> Dict[str, jnp.ndarray]:
        outs = self(image, train=False)
        boxes_all, scores_all = [], []
        for li, (out, stride) in enumerate(zip(outs, self.STRIDES)):
            boxes, obj, cls = self._decode_level(out, self.anchors[li], stride)
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


@DETECTORS.register_module()
class YOLOv5(_AnchorYOLO):
    """CSPDarknet(3,6,9,3) + PAN + sigmoid^2 anchor head — the v5 recipe."""
