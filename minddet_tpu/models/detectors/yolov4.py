"""YOLOv4: CSPDarknet53 (Mish) + PAN + classic exp-wh anchor head, CIoU loss.

Fills the reference's README-advertised "yolo v4" row (``README.md:10`` — no
code in the tree). Shares the anchor-family core with v5/v7
(``yolov5._AnchorYOLO``): same static cross-grid assignment and losses, with
the v3/v4 exp box decode and the v4 paper's 512-input anchor set.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.models.backbones.csp_darknet import CSPDarknet53
from minddet_tpu.models.detectors.yolov5 import _AnchorYOLO

# v4 paper anchors (512 input), stride 8 / 16 / 32
YOLOV4_ANCHORS = (
    ((12, 16), (19, 36), (40, 28)),
    ((36, 75), (76, 55), (72, 146)),
    ((142, 110), (192, 243), (459, 401)),
)


@DETECTORS.register_module()
class YOLOv4(_AnchorYOLO):
    anchors: Any = YOLOV4_ANCHORS
    decode_flavor: str = "exp"

    def _backbone(self, image, train):
        return CSPDarknet53(
            width_mult=self.width_mult, dtype=self.dtype, name="backbone"
        )(image, train=train)

    def _neck_channels(self):
        def w(c):
            return max(16, int(c * self.width_mult // 8 * 8))

        return (w(256), w(512), w(1024))
