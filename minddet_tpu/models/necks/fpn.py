"""Feature Pyramid Network neck (P2-P6 / P3-P7 variants), NHWC Flax."""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from minddet_tpu.core.registry import NECKS


def _upsample2x(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


@NECKS.register_module()
class FPN(nn.Module):
    """Lateral 1x1 + top-down nearest upsample + 3x3 smooth.

    ``extra_levels`` adds P6(/P7) via stride-2 maxpool (faster-rcnn style) or
    stride-2 conv on the last output (retinanet style when
    ``extra_convs=True``).
    """

    out_channels: int = 256
    extra_levels: int = 1
    extra_convs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(len(laterals) - 2, -1, -1):
            laterals[i] = laterals[i] + _upsample2x(laterals[i + 1])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name=f"smooth{i}")(l)
            for i, l in enumerate(laterals)
        ]
        last = outs[-1]
        for e in range(self.extra_levels):
            if self.extra_convs:
                src = last if e == 0 else nn.relu(last)
                last = nn.Conv(
                    self.out_channels, (3, 3), (2, 2), padding=1,
                    dtype=self.dtype, name=f"extra{e}",
                )(src)
            else:
                last = nn.max_pool(last, (1, 1), strides=(2, 2))
            outs.append(last)
        return outs
