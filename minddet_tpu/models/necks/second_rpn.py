"""SECOND-style RPN: N down-blocks + N transposed-conv up-blocks, concat.

Shared by PointPillars (``pointpillars/src/pointpillars.py:367-654``: blocks
[3,5,5] convs at strides [2,2,2], upsample strides [1,2,4]) and CenterPoint
(``det3d_ms/models/necks/rpn.py:10-163``). NHWC Flax with eps=1e-3 BN to
match SECOND's convention.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from minddet_tpu.core.registry import NECKS


def _conv_bn_relu(x, features, stride, train, dtype, name):
    x = nn.Conv(
        features, (3, 3), (stride, stride), padding=1, use_bias=False,
        dtype=dtype, name=f"{name}_conv",
    )(x)
    x = nn.BatchNorm(
        use_running_average=not train, momentum=0.99, epsilon=1e-3,
        dtype=dtype, name=f"{name}_bn",
    )(x)
    return nn.relu(x)


@NECKS.register_module()
class SECONDRPN(nn.Module):
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    num_filters: Sequence[int] = (64, 128, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    num_upsample_filters: Sequence[int] = (128, 128, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ups = []
        for bi, (n, s, f, us, uf) in enumerate(
            zip(
                self.layer_nums, self.layer_strides, self.num_filters,
                self.upsample_strides, self.num_upsample_filters,
            )
        ):
            x = _conv_bn_relu(x, f, s, train, self.dtype, f"block{bi}_down")
            for li in range(n):
                x = _conv_bn_relu(x, f, 1, train, self.dtype, f"block{bi}_{li}")
            if us >= 1:
                us_i = int(us)
                u = nn.ConvTranspose(
                    uf, (us_i, us_i), strides=(us_i, us_i), use_bias=False,
                    dtype=self.dtype, name=f"up{bi}_deconv",
                )(x)
            else:
                # fractional "upsample" stride (CenterPoint's us=0.5,
                # det3d_ms/models/necks/rpn.py:_make_layer) = stride-2 conv
                ds = int(round(1.0 / us))
                u = nn.Conv(
                    uf, (ds, ds), (ds, ds), use_bias=False,
                    dtype=self.dtype, name=f"up{bi}_downconv",
                )(x)
            u = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, name=f"up{bi}_bn",
            )(u)
            ups.append(nn.relu(u))
        return jnp.concatenate(ups, axis=-1)
