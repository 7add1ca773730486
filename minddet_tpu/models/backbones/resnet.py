"""ResNet backbone family (NHWC, optional DCNv2 stages).

Re-design of ``centernet/src/resnet.py:24-253`` (ResNet18/50 with
ModulatedDeformConv2d in stages 2-4) as Flax modules — and fills the
reference's empty shared-backbone stub (``minddet/models/backbones/resnet.py``,
"copy resnet backbone from mindcv"). bf16 compute on the MXU, f32 params.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from minddet_tpu.core.registry import BACKBONES
from minddet_tpu.models.layers import ModulatedDeformConv

Dtype = Any


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dcn: bool = False
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        d = self.dilation
        y = nn.Conv(
            self.features, (3, 3), (self.strides, self.strides), padding=d,
            kernel_dilation=(d, d), use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.he_normal(), name="conv1",
        )(x)
        y = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        if self.dcn:
            y = ModulatedDeformConv(self.features, dtype=self.dtype, name="conv2")(y)
        else:
            y = nn.Conv(
                self.features, (3, 3), padding=d, kernel_dilation=(d, d),
                use_bias=False, dtype=self.dtype,
                kernel_init=nn.initializers.he_normal(), name="conv2",
            )(y)
        y = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), (self.strides, self.strides), use_bias=False,
                dtype=self.dtype, kernel_init=nn.initializers.he_normal(),
                name="downsample_conv",
            )(x)
            residual = nn.BatchNorm(
                not train, momentum=0.9, dtype=self.dtype, name="downsample_bn"
            )(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    dcn: bool = False
    dilation: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        if self.dcn:
            y = ModulatedDeformConv(
                self.features, stride=self.strides, dtype=self.dtype, name="conv2"
            )(y)
        else:
            d = self.dilation
            y = nn.Conv(
                self.features, (3, 3), (self.strides, self.strides), padding=d,
                kernel_dilation=(d, d), use_bias=False, dtype=self.dtype,
                name="conv2",
            )(y)
        y = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features * self.expansion, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv3",
        )(y)
        y = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features * self.expansion, (1, 1), (self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = nn.BatchNorm(
                not train, momentum=0.9, dtype=self.dtype, name="downsample_bn"
            )(residual)
        return nn.relu(y + residual)


_ARCH = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@BACKBONES.register_module()
class ResNet(nn.Module):
    """Multi-scale ResNet; returns (C2, C3, C4, C5) feature maps.

    ``dcn_stages`` marks which of the four stages use deformable convs —
    the reference enables stages 2-4 for CenterNet-DCN (resnet.py:204-206).
    """

    depth: int = 18
    dcn_stages: Sequence[bool] = (False, False, False, False)
    output_stride: int = 32  # 16 or 8 dilate the last stage(s) (DeepLab)
    dtype: Dtype = jnp.float32
    stem_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        block_cls, layers = _ARCH[self.depth]
        x = nn.Conv(
            self.stem_width, (7, 7), (2, 2), padding=3, use_bias=False,
            dtype=self.dtype, kernel_init=nn.initializers.he_normal(), name="conv1",
        )(x)
        x = nn.BatchNorm(not train, momentum=0.9, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outputs = []
        widths = (64, 128, 256, 512)
        # stages whose stride-2 is replaced by dilation (DeepLab-style)
        n_dilated = {32: 0, 16: 1, 8: 2}[self.output_stride]
        dilation = 1
        for stage, (width, n_blocks) in enumerate(zip(widths, layers)):
            dilate = stage >= 4 - n_dilated and stage > 0
            if dilate:
                dilation *= 2
            for i in range(n_blocks):
                strides = 2 if (stage > 0 and i == 0 and not dilate) else 1
                x = block_cls(
                    width,
                    strides=strides,
                    dcn=self.dcn_stages[stage],
                    dilation=dilation,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train=train)
            outputs.append(x)
        return tuple(outputs)

    @property
    def out_channels(self) -> Tuple[int, ...]:
        block_cls, _ = _ARCH[self.depth]
        mult = 4 if block_cls is Bottleneck else 1
        return tuple(w * mult for w in (64, 128, 256, 512))
