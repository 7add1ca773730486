"""CenterNet deconvolution neck: C5 -> stride-4 feature map.

Three stages of (DCNv2 -> BN -> ReLU -> ConvTranspose 4x4 s2 -> BN -> ReLU)
with filters [256, 128, 64], upsampling 16x16 C5 to 128x128 (input 512).
Reference: ``centernet/src/centernet_det.py:_make_deconv_layer:123-161``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from minddet_tpu.core.registry import NECKS
from minddet_tpu.models.layers import DeconvBlock


@NECKS.register_module()
class CenterNetDeconvNeck(nn.Module):
    num_filters: Sequence[int] = (256, 128, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (tuple, list)):
            x = x[-1]  # take C5
        for i, f in enumerate(self.num_filters):
            x = DeconvBlock(f, dtype=self.dtype, name=f"deconv{i}")(x, train=train)
        return x
