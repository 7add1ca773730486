"""Shared Flax building blocks (NHWC, bf16-friendly)."""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from minddet_tpu.ops.dcn import deform_conv2d

Dtype = Any


class ConvBN(nn.Module):
    """Conv -> BatchNorm -> optional activation (NHWC)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = False
    act: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.he_normal(),
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ModulatedDeformConv(nn.Module):
    """DCNv2 layer: zero-init offset/mask conv + deformable sampling conv.

    Mirrors the reference's ``ModulatedDeformConv2d`` (centernet/src/resnet.py:
    24-106): ``conv_offset`` starts at zero so training begins as a plain conv
    with 0.5 modulation. Offset channel layout is (K, (dy, dx)) + K mask
    channels, kept distinct from the reference's Ascend packing — checkpoint
    converters handle the remap.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size * self.kernel_size
        off_mask = nn.Conv(
            3 * k,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=True,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv_offset",
        )(x)
        b, ho, wo, _ = off_mask.shape
        offsets = off_mask[..., : 2 * k].reshape(b, ho, wo, k, 2)
        mask = nn.sigmoid(off_mask[..., 2 * k :])
        weights = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return deform_conv2d(
            x,
            offsets,
            mask,
            weights.astype(self.dtype),
            bias=None if bias is None else bias.astype(self.dtype),
            stride=self.stride,
            padding=self.padding,
        )


class DeconvBlock(nn.Module):
    """DCN 3x3 -> BN -> ReLU -> ConvTranspose k4 s2 -> BN -> ReLU.

    One stage of CenterNet's deconv neck (``centernet_det.py:_make_deconv_layer``).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ModulatedDeformConv(self.features, dtype=self.dtype, name="dcn")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(
            self.features,
            (4, 4),
            strides=(2, 2),
            padding="SAME",
            use_bias=True,
            dtype=self.dtype,
            name="up",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        x = nn.relu(x)
        return x
