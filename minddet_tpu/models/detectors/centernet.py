"""CenterNet detector: ResNet(-DCN) -> deconv neck -> hm/wh/reg heads.

One Flax module covering the reference's GatherDetectionFeatureCell +
CenterNetLossCell + DetectionDecode trio (``centernet/src/centernet_det.py:
79-239``, ``decode.py:123-196``): ``__call__`` returns raw heads, ``loss``
computes the training objective against device-generated targets, ``predict``
runs the fused decode. The loss/decode are pure functions of the heads, so the
whole train step jits into a single XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.models.backbones.resnet import ResNet
from minddet_tpu.models.heads.centernet_head import CenterNetHead
from minddet_tpu.models.losses import centernet_focal_loss, gather_reg_loss
from minddet_tpu.models.necks.ct_deconv import CenterNetDeconvNeck
from minddet_tpu.ops.decode import centernet_decode


@DETECTORS.register_module()
class CenterNet(nn.Module):
    num_classes: int = 80
    depth: int = 18
    dcn: bool = True
    head_conv: int = 64
    reg_offset: bool = True
    hm_weight: float = 1.0
    wh_weight: float = 0.1
    off_weight: float = 1.0
    reg_loss: str = "l1"
    dtype: Any = jnp.float32

    def setup(self):
        dcn_stages = (False, self.dcn, self.dcn, self.dcn)
        self.backbone = ResNet(depth=self.depth, dcn_stages=dcn_stages, dtype=self.dtype)
        self.neck = CenterNetDeconvNeck(dtype=self.dtype)
        self.head = CenterNetHead(
            num_classes=self.num_classes,
            head_conv=self.head_conv,
            reg_offset=self.reg_offset,
            dtype=self.dtype,
        )

    def __call__(self, image: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        """image (B, H, W, 3) -> dict of NHWC heads at stride 4."""
        feats = self.backbone(image.astype(self.dtype), train=train)
        x = self.neck(feats, train=train)
        return self.head(x, train=train)

    def loss(
        self, image: jnp.ndarray, targets: Dict[str, jnp.ndarray], train: bool = True
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Training objective. ``targets`` holds hm (B,H,W,C), wh (B,O,2),
        reg (B,O,2), ind (B,O), reg_mask (B,O) — the columns of
        ``ops.targets.centernet_targets_batch``.
        """
        outputs = self(image, train=train)
        hm_loss = centernet_focal_loss(outputs["hm"], targets["hm"])
        wh_loss = gather_reg_loss(
            outputs["wh"], targets["reg_mask"], targets["ind"], targets["wh"],
            mode=self.reg_loss,
        )
        off_loss = jnp.zeros(())
        if self.reg_offset and self.off_weight > 0:
            off_loss = gather_reg_loss(
                outputs["reg"], targets["reg_mask"], targets["ind"], targets["reg"],
                mode=self.reg_loss,
            )
        total = (
            self.hm_weight * hm_loss
            + self.wh_weight * wh_loss
            + self.off_weight * off_loss
        )
        return total, {"hm_loss": hm_loss, "wh_loss": wh_loss, "off_loss": off_loss}

    def loss_from_gt(
        self, batch: Dict[str, jnp.ndarray], train: bool = True
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Uniform-zoo interface: batch {image, gt_boxes (B,O,4 input px),
        gt_classes, gt_mask} -> targets generated on device at stride 4."""
        from minddet_tpu.ops.targets import centernet_targets_batch

        b, h, w = batch["image"].shape[:3]
        targets = centernet_targets_batch(
            batch["gt_boxes"] / 4.0,
            batch["gt_classes"],
            batch["gt_mask"],
            h // 4,
            w // 4,
            self.num_classes,
            0.7,
        )
        return self.loss(batch["image"], targets, train=train)

    def predict(self, image: jnp.ndarray, k: int = 100) -> jnp.ndarray:
        """Fused forward + decode -> (B, K, 6) [x1,y1,x2,y2,score,class] at
        output stride. No host round trips (cf. reference eval.py:110-162)."""
        outputs = self(image, train=False)
        return centernet_decode(outputs, k=k)
