"""SSD-300 MobileNetV2: multibox anchors, hard-negative-mined loss, NMS.

The reference advertises SSD in its README zoo but ships no code; BASELINE
names "SSD-300 MobileNetV2 COCO (anchor-dense single-stage, multibox
encode/decode)". TPU notes: hard negative mining is the classic dynamic-shape
trap — here it's a static double-sort rank trick (rank of each negative's
loss vs 3x positive count), so the whole loss is one fused program.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.models.backbones.mobilenet import MobileNetV2
from minddet_tpu.ops.anchors2d import match_anchors
from minddet_tpu.ops.box import clip_boxes, decode_deltas, encode_deltas
from minddet_tpu.ops.nms import batched_nms

SSD_REG_STDS = (0.1, 0.1, 0.2, 0.2)


def ssd_anchors(
    image_size: int = 300,
    feature_sizes: Sequence[int] = (19, 10, 5, 3, 2, 1),
    min_scale: float = 0.2,
    max_scale: float = 0.95,
    ratios: Sequence[float] = (1.0, 2.0, 0.5, 3.0, 1.0 / 3.0),
) -> Tuple[np.ndarray, List[int]]:
    """Classic SSD multibox anchors -> ((A, 4) xyxy pixels, per-level counts).

    Per level k: scale s_k linear in [min, max]; ratios + the extra
    sqrt(s_k*s_{k+1}) unit box (SSD paper sec 2.2).
    """
    m = len(feature_sizes)
    scales = [min_scale + (max_scale - min_scale) * k / (m - 1) for k in range(m)]
    scales.append(1.0)
    all_anchors, counts = [], []
    for k, f in enumerate(feature_sizes):
        boxes = []
        s = scales[k]
        for r in ratios:
            w, h = s * np.sqrt(r), s / np.sqrt(r)
            boxes.append((w, h))
        boxes.append((np.sqrt(scales[k] * scales[k + 1]),) * 2)
        boxes = np.asarray(boxes, np.float32)
        ys, xs = np.meshgrid(
            (np.arange(f) + 0.5) / f, (np.arange(f) + 0.5) / f, indexing="ij"
        )
        cxy = np.stack([xs, ys], -1).reshape(-1, 1, 2)
        wh = boxes[None]
        a = np.concatenate(
            [cxy - wh / 2, cxy + wh / 2], axis=-1
        ).reshape(-1, 4) * image_size
        all_anchors.append(a.astype(np.float32))
        counts.append(len(a))
    return np.concatenate(all_anchors, 0), counts


class _MultiboxLayer(nn.Module):
    num_anchors: int
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        cls = nn.Conv(
            self.num_anchors * (self.num_classes + 1), (3, 3), padding=1,
            dtype=self.dtype, name="cls",
        )(x)
        reg = nn.Conv(self.num_anchors * 4, (3, 3), padding=1, dtype=self.dtype, name="reg")(x)
        return (
            cls.reshape(b, -1, self.num_classes + 1).astype(jnp.float32),
            reg.reshape(b, -1, 4).astype(jnp.float32),
        )


@DETECTORS.register_module()
class SSD(nn.Module):
    num_classes: int = 80
    image_size: int = 300
    extra_channels: Sequence[int] = (512, 256, 256, 128)
    num_anchors_per_loc: int = 6
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = MobileNetV2(dtype=self.dtype)
        self.extras = [
            ExtraBlock(c, dtype=self.dtype, name=f"extra{i}")
            for i, c in enumerate(self.extra_channels)
        ]
        self.heads = [
            _MultiboxLayer(
                self.num_anchors_per_loc, self.num_classes, dtype=self.dtype,
                name=f"multibox{i}",
            )
            for i in range(2 + len(self.extra_channels))
        ]

    def _feature_sizes(self) -> List[int]:
        s = self.image_size
        sizes = [-(-s // 16), -(-s // 32)]
        for _ in self.extra_channels:
            sizes.append(-(-sizes[-1] // 2))
        return sizes

    def anchors(self) -> Tuple[np.ndarray, List[int]]:
        return ssd_anchors(self.image_size, tuple(self._feature_sizes()))

    def __call__(self, image: jnp.ndarray, train: bool = False):
        c4, c5 = self.backbone(image.astype(self.dtype), train=train)
        feats = [c4, c5]
        x = c5
        for blk in self.extras:
            x = blk(x, train=train)
            feats.append(x)
        cls_all, reg_all = [], []
        for f, head in zip(feats, self.heads):
            cls, reg = head(f)
            cls_all.append(cls)
            reg_all.append(reg)
        return jnp.concatenate(cls_all, 1), jnp.concatenate(reg_all, 1)

    def loss(self, batch: Dict[str, jnp.ndarray], train: bool = True):
        """Multibox loss with 3:1 hard negative mining (static ranks)."""
        cls_logits, reg_preds = self(batch["image"], train=train)
        anchors = jnp.asarray(self.anchors()[0])

        def per_image(gb, gc, gm):
            labels, match = match_anchors(
                anchors, gb, gm, pos_iou=0.5, neg_iou=0.5
            )
            cls_t = jnp.where(labels == 1, gc[match] + 1, 0)
            reg_t = encode_deltas(gb[match], anchors, stds=SSD_REG_STDS)
            return labels, cls_t, reg_t

        labels, cls_t, reg_t = jax.vmap(per_image)(
            batch["gt_boxes"], batch["gt_classes"], batch["gt_mask"]
        )
        pos = (labels == 1).astype(jnp.float32)
        n_pos = jnp.sum(pos, axis=1, keepdims=True)

        logp = jax.nn.log_softmax(cls_logits, axis=-1)
        ce = -jnp.take_along_axis(logp, cls_t[..., None], axis=-1)[..., 0]

        # hard negative mining, static: rank negatives by loss, keep 3x pos
        neg_ce = jnp.where(labels == 0, ce, -jnp.inf)
        order = jnp.argsort(-neg_ce, axis=1)
        rank = jnp.argsort(order, axis=1).astype(jnp.float32)
        neg_keep = (rank < 3.0 * n_pos) & (labels == 0)

        cls_loss = jnp.sum(ce * (pos + neg_keep.astype(jnp.float32))) / jnp.maximum(
            jnp.sum(n_pos), 1.0
        )
        diff = jnp.abs(reg_preds - reg_t)
        sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
        reg_loss = jnp.sum(jnp.sum(sl1, -1) * pos) / jnp.maximum(jnp.sum(n_pos), 1.0)
        return cls_loss + reg_loss, {"cls_loss": cls_loss, "reg_loss": reg_loss}

    def predict(
        self,
        image: jnp.ndarray,
        score_threshold: float = 0.05,
        nms_threshold: float = 0.45,
        max_detections: int = 100,
        pre_nms: int = 400,
    ) -> Dict[str, jnp.ndarray]:
        cls_logits, reg_preds = self(image, train=False)
        anchors = jnp.asarray(self.anchors()[0])
        probs = jax.nn.softmax(cls_logits, axis=-1)[..., 1:]

        def per_image(pr, rg):
            boxes = decode_deltas(rg, anchors, stds=SSD_REG_STDS)
            boxes = clip_boxes(boxes, self.image_size, self.image_size)
            sc = jnp.max(pr, -1)
            lb = jnp.argmax(pr, -1)
            k = min(pre_nms, sc.shape[0])
            top_sc, top_i = jax.lax.top_k(sc, k)
            keep, _ = batched_nms(
                boxes[top_i], top_sc, lb[top_i], nms_threshold,
                score_threshold, max_detections,
            )
            sel = jnp.clip(keep, 0, k - 1)
            ok = keep >= 0
            return (
                jnp.where(ok[:, None], boxes[top_i][sel], 0.0),
                jnp.where(ok, top_sc[sel], 0.0),
                jnp.where(ok, lb[top_i][sel], -1),
            )

        boxes, scores, labels = jax.vmap(per_image)(probs, reg_preds)
        return {"boxes": boxes, "scores": scores, "labels": labels}


class ExtraBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features // 2, (1, 1), use_bias=False, dtype=self.dtype, name="c1")(x)
        x = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="bn1")(x)
        x = nn.relu6(x)
        x = nn.Conv(
            self.features, (3, 3), (2, 2), padding=1, use_bias=False,
            dtype=self.dtype, name="c2",
        )(x)
        x = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="bn2")(x)
        return nn.relu6(x)
