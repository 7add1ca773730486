"""Semantic segmentation models: DeepLabV3 / V3+ (ASPP) and UNet, plus losses/mIoU.

Completes the README-promised segmentation zoo (reference advertises
"deeplab v3", "deeplab v3 plus" and "unet" at ``README.md:17-19`` but ships
none). NHWC Flax; dilated convolutions map directly onto XLA's
``rhs_dilation`` and fuse fine on the MXU. DeepLabV3 is the decoder-less
variant (ASPP head straight to logits); V3+ adds the low-level-feature
decoder.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.models.backbones.resnet import ResNet


def _resize(x, hw):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="bilinear")


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling: 1x1 + three dilated 3x3 + image pool."""

    features: int = 256
    rates: Sequence[int] = (6, 12, 18)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        branches = [
            nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="b0")(x)
        ]
        for i, r in enumerate(self.rates):
            branches.append(
                nn.Conv(
                    self.features, (3, 3), padding=r, kernel_dilation=(r, r),
                    use_bias=False, dtype=self.dtype, name=f"b{i + 1}",
                )(x)
            )
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="pool")(pooled)
        branches.append(jnp.broadcast_to(pooled, (x.shape[0], h, w, self.features)))
        y = jnp.concatenate(branches, -1)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="proj")(y)
        y = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="proj_bn")(y)
        return nn.relu(y)


@DETECTORS.register_module()
class DeepLabV3Plus(nn.Module):
    num_classes: int = 21
    depth: int = 101
    aspp_features: int = 256
    output_stride: int = 16  # dilated backbone (ASPP sees /16 features)
    use_decoder: bool = True  # False -> plain DeepLabV3 (no low-level decoder)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ih, iw = image.shape[1:3]
        c2, _, _, c5 = ResNet(
            depth=self.depth, output_stride=self.output_stride,
            dtype=self.dtype, name="backbone",
        )(image.astype(self.dtype), train=train)
        x = ASPP(self.aspp_features, dtype=self.dtype, name="aspp")(c5, train=train)
        if self.use_decoder:
            x = _resize(x, c2.shape[1:3])
            low = nn.Conv(48, (1, 1), use_bias=False, dtype=self.dtype, name="low_proj")(c2)
            low = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="low_bn")(low)
            x = jnp.concatenate([x, nn.relu(low)], -1)
            for i in range(2):
                x = nn.Conv(256, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                            name=f"dec{i}")(x)
                x = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name=f"dec{i}_bn")(x)
                x = nn.relu(x)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="out")(x)
        return _resize(logits.astype(jnp.float32), (ih, iw))

    def loss(self, batch: Dict[str, jnp.ndarray], train: bool = True):
        return segmentation_loss(self(batch["image"], train=train), batch["mask"],
                                 batch.get("valid"))

    def predict(self, image: jnp.ndarray) -> jnp.ndarray:
        return jnp.argmax(self(image, train=False), axis=-1)


@DETECTORS.register_module()
class DeepLabV3(DeepLabV3Plus):
    """Decoder-less DeepLab v3 (ASPP head straight to logits) — the
    reference README's separate "deeplab v3" row (``README.md:17``)."""

    use_decoder: bool = False


@DETECTORS.register_module()
class UNet(nn.Module):
    num_classes: int = 2
    widths: Sequence[int] = (64, 128, 256, 512, 1024)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def double_conv(x, c, name):
            for i in range(2):
                x = nn.Conv(c, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                            name=f"{name}_c{i}")(x)
                x = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype,
                                 name=f"{name}_bn{i}")(x)
                x = nn.relu(x)
            return x

        x = image.astype(self.dtype)
        skips = []
        for i, c in enumerate(self.widths[:-1]):
            x = double_conv(x, c, f"down{i}")
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = double_conv(x, self.widths[-1], "bottom")
        for i, c in enumerate(reversed(self.widths[:-1])):
            x = nn.ConvTranspose(c, (2, 2), strides=(2, 2), dtype=self.dtype,
                                 name=f"up{i}")(x)
            x = jnp.concatenate([x, skips[-(i + 1)]], -1)
            x = double_conv(x, c, f"dec{i}")
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="out")(
            x
        ).astype(jnp.float32)

    def loss(self, batch: Dict[str, jnp.ndarray], train: bool = True):
        return segmentation_loss(self(batch["image"], train=train), batch["mask"],
                                 batch.get("valid"))

    def predict(self, image: jnp.ndarray) -> jnp.ndarray:
        return jnp.argmax(self(image, train=False), axis=-1)


def segmentation_loss(logits, mask, valid=None, dice_weight: float = 0.0):
    """Pixel CE (+ optional dice) with an ignore mask."""
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, -1)
    onehot = jax.nn.one_hot(mask, num_classes)
    ce = -jnp.sum(onehot * logp, -1)
    if valid is None:
        valid = jnp.ones_like(ce)
    valid = valid.astype(jnp.float32)
    ce_loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    parts = {"ce": ce_loss}
    total = ce_loss
    if dice_weight > 0:
        p = jax.nn.softmax(logits, -1)
        inter = jnp.sum(p * onehot * valid[..., None], axis=(1, 2))
        denom = jnp.sum((p + onehot) * valid[..., None], axis=(1, 2))
        dice = 1.0 - jnp.mean(2 * inter / jnp.maximum(denom, 1e-6))
        total = total + dice_weight * dice
        parts["dice"] = dice
    return total, parts


def miou(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int, valid=None):
    """Mean intersection-over-union across classes (confusion-matrix based)."""
    if valid is None:
        valid = jnp.ones_like(target, bool)
    p = jnp.where(valid, pred, num_classes)
    t = jnp.where(valid, target, num_classes)
    idx = t * (num_classes + 1) + p
    cm = jnp.bincount(idx.reshape(-1), length=(num_classes + 1) ** 2).reshape(
        num_classes + 1, num_classes + 1
    )[:num_classes, :num_classes]
    inter = jnp.diag(cm)
    union = jnp.sum(cm, 0) + jnp.sum(cm, 1) - inter
    present = union > 0
    iou = jnp.where(present, inter / jnp.maximum(union, 1), 0.0)
    return jnp.sum(iou) / jnp.maximum(jnp.sum(present), 1)
