"""YOLOv7: E-ELAN backbone + PAN + sigmoid^2 anchor head.

Fills the reference's README-advertised "yolo v7" row (``README.md:12`` — no
code in the tree). Shares the anchor-family core with v4/v5
(``yolov5._AnchorYOLO``); v7's extras (RepConv head convs, YOLOR implicit
knowledge, auxiliary heads) are train-time reparameterization tricks that
fold into plain convs at deploy time, so the deploy-form topology here is a
plain coupled head over the ELAN/PAN features.
"""

from __future__ import annotations

from typing import Any

from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.models.backbones.elan import ELANNet
from minddet_tpu.models.detectors.yolov5 import _AnchorYOLO

# v7 anchors (640 input), stride 8 / 16 / 32
YOLOV7_ANCHORS = (
    ((12, 16), (19, 36), (40, 28)),
    ((36, 75), (76, 55), (72, 146)),
    ((142, 110), (192, 243), (459, 401)),
)


@DETECTORS.register_module()
class YOLOv7(_AnchorYOLO):
    anchors: Any = YOLOV7_ANCHORS

    def _backbone(self, image, train):
        return ELANNet(
            width_mult=self.width_mult, dtype=self.dtype, name="backbone"
        )(image, train=train)

    def _neck_channels(self):
        def w(c):
            return max(16, int(c * self.width_mult // 8 * 8))

        # ELANNet emits C3/C4/C5 = 512/1024/1024 (pre-mult)
        return (w(256), w(512), w(1024))
