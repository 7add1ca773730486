"""PAN (path-aggregation) neck for the YOLO family: top-down FPN + bottom-up.

NHWC Flax; CSP fusion blocks, SiLU. Input (C3, C4, C5) -> (P3, P4, P5).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from minddet_tpu.core.registry import NECKS
from minddet_tpu.models.backbones.csp_darknet import C2f, CSPLayer, ConvBlock


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


@NECKS.register_module()
class PAN(nn.Module):
    out_channels: Sequence[int] = (128, 256, 512)
    depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        c3, c4, c5 = feats
        w3, w4, w5 = self.out_channels

        p5 = ConvBlock(w4, 1, dtype=self.dtype, name="reduce5")(c5, train)
        m4 = CSPLayer(w4, self.depth, False, dtype=self.dtype, name="td4")(
            jnp.concatenate([_up2(p5), c4], -1), train
        )
        p4 = ConvBlock(w3, 1, dtype=self.dtype, name="reduce4")(m4, train)
        p3 = CSPLayer(w3, self.depth, False, dtype=self.dtype, name="td3")(
            jnp.concatenate([_up2(p4), c3], -1), train
        )
        # bottom-up
        n3 = p3
        d3 = ConvBlock(w3, 3, 2, dtype=self.dtype, name="down3")(n3, train)
        n4 = CSPLayer(w4, self.depth, False, dtype=self.dtype, name="bu4")(
            jnp.concatenate([d3, p4], -1), train
        )
        d4 = ConvBlock(w4, 3, 2, dtype=self.dtype, name="down4")(n4, train)
        n5 = CSPLayer(w5, self.depth, False, dtype=self.dtype, name="bu5")(
            jnp.concatenate([d4, p5], -1), train
        )
        return n3, n4, n5


@NECKS.register_module()
class C2fPAN(nn.Module):
    """Ultralytics YOLOv8's neck: PAN with C2f fusion blocks and NO lateral
    reduce convs — the raw backbone maps concat straight into each C2f
    (ultralytics yolov8.yaml head layers 10-21). Scope names mirror ``PAN``
    (td4/td3/down3/bu4/down4/bu5) so the checkpoint rename table stays one
    row per module; checkpoint conversion parity depends on this exact
    topology (``utils/convert.py:YOLOV8_RULES``)."""

    out_channels: Sequence[int] = (128, 256, 512)
    depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        c3, c4, c5 = feats
        w3, w4, w5 = self.out_channels

        m4 = C2f(w4, self.depth, False, dtype=self.dtype, name="td4")(
            jnp.concatenate([_up2(c5), c4], -1), train
        )
        n3 = C2f(w3, self.depth, False, dtype=self.dtype, name="td3")(
            jnp.concatenate([_up2(m4), c3], -1), train
        )
        d3 = ConvBlock(w3, 3, 2, dtype=self.dtype, name="down3")(n3, train)
        n4 = C2f(w4, self.depth, False, dtype=self.dtype, name="bu4")(
            jnp.concatenate([d3, m4], -1), train
        )
        d4 = ConvBlock(w4, 3, 2, dtype=self.dtype, name="down4")(n4, train)
        n5 = C2f(w5, self.depth, False, dtype=self.dtype, name="bu5")(
            jnp.concatenate([d4, c5], -1), train
        )
        return n3, n4, n5
