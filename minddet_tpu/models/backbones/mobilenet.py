"""MobileNetV2 backbone (NHWC Flax) with multi-scale feature taps.

Backs the SSD-MobileNetV2 config from the reference's promised zoo
(``minddet`` README; BASELINE.json configs). Returns the stride-16 expansion
feature (C4, the classic SSD tap) and the final stride-32 feature.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from minddet_tpu.core.registry import BACKBONES


class InvertedResidual(nn.Module):
    features: int
    strides: int = 1
    expand: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(y)
            y = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="expand_bn")(y)
            y = nn.relu6(y)
        y = nn.Conv(
            hidden, (3, 3), (self.strides, self.strides), padding=1,
            feature_group_count=hidden, use_bias=False, dtype=self.dtype, name="dw",
        )(y)
        y = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="dw_bn")(y)
        y = nn.relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="project")(y)
        y = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="project_bn")(y)
        if self.strides == 1 and cin == self.features:
            y = y + x
        return y


# (expand, channels, repeats, stride)
_MBV2_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


@BACKBONES.register_module()
class MobileNetV2(nn.Module):
    width_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        def ch(c):
            return max(8, int(c * self.width_mult + 4) // 8 * 8)

        x = nn.Conv(ch(32), (3, 3), (2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu6(x)
        c4 = None
        block = 0
        for bi, (t, c, n, s) in enumerate(_MBV2_CFG):
            for i in range(n):
                stride = s if i == 0 else 1
                if bi == 5 and i == 0:
                    # SSD taps the stride-16 feature right before this
                    # downsample (the "expansion of block 13" tap)
                    c4 = x
                x = InvertedResidual(
                    ch(c), strides=stride, expand=t, dtype=self.dtype,
                    name=f"block{block}",
                )(x, train=train)
                block += 1
        x = nn.Conv(ch(1280), (1, 1), use_bias=False, dtype=self.dtype, name="head")(x)
        x = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="head_bn")(x)
        x = nn.relu6(x)
        return c4, x
