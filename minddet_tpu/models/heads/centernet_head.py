"""CenterNet detection head: hm / wh / reg branches over the stride-4 map.

Each branch is Conv3x3 -> ReLU -> Conv1x1; the heatmap branch's final bias is
initialized to -2.19 (prior prob ~0.1). Reference:
``centernet/src/centernet_det.py:_generate_feature:29-77`` and the head dict
{"hm": C, "wh": 2, "reg": 2} at :92-117.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from minddet_tpu.core.registry import HEADS
from minddet_tpu.models.losses import sigmoid_clip


class _Branch(nn.Module):
    out_features: int
    head_conv: int = 64
    final_bias: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.head_conv, (3, 3), padding=1, use_bias=True, dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_features, (1, 1), use_bias=True, dtype=self.dtype,
            bias_init=nn.initializers.constant(self.final_bias), name="out",
        )(x)
        return x


@HEADS.register_module()
class CenterNetHead(nn.Module):
    num_classes: int = 80
    head_conv: int = 64
    reg_offset: bool = True
    hm_bias: float = -2.19
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        out = {
            "hm": sigmoid_clip(
                _Branch(
                    self.num_classes, self.head_conv, self.hm_bias,
                    dtype=self.dtype, name="hm",
                )(x).astype(jnp.float32)
            ),
            "wh": _Branch(2, self.head_conv, dtype=self.dtype, name="wh")(x),
        }
        if self.reg_offset:
            out["reg"] = _Branch(2, self.head_conv, dtype=self.dtype, name="reg")(x)
        return out
