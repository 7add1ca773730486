"""CSPDarknet backbone family (YOLOv5/YOLOX style) + C2f variant (YOLOv8).

Backs the README-promised YOLO zoo (reference ships none of it). NHWC Flax,
SiLU activations, SPP(F) bottleneck on C5. Returns (C3, C4, C5) at strides
8/16/32.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from minddet_tpu.core.registry import BACKBONES


class ConvBlock(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            (self.strides, self.strides), padding=self.kernel // 2,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(not train, momentum=0.97, epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    """(1x1, 3x3) for CSP/C3 blocks; C2f passes (3, 3) — ultralytics v8's
    C2f bottleneck uses two 3x3 convs (k=((3,3),(3,3))), which checkpoint
    conversion parity depends on."""

    features: int
    shortcut: bool = True
    kernels: Tuple[int, int] = (1, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k1, k2 = self.kernels
        y = ConvBlock(self.features, k1, dtype=self.dtype, name="c1")(x, train)
        y = ConvBlock(self.features, k2, dtype=self.dtype, name="c2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class CSPLayer(nn.Module):
    """Cross-stage partial block (C3 in YOLOv5 naming)."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.features // 2
        a = ConvBlock(h, 1, dtype=self.dtype, name="main")(x, train)
        b = ConvBlock(h, 1, dtype=self.dtype, name="skip")(x, train)
        for i in range(self.n):
            a = Bottleneck(h, self.shortcut, dtype=self.dtype, name=f"b{i}")(a, train)
        return ConvBlock(self.features, 1, dtype=self.dtype, name="out")(
            jnp.concatenate([a, b], -1), train
        )


class C2f(nn.Module):
    """YOLOv8's C2f: split then dense concat of bottleneck outputs."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.features // 2
        y = ConvBlock(2 * h, 1, dtype=self.dtype, name="in")(x, train)
        parts = [y[..., :h], y[..., h:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(h, self.shortcut, kernels=(3, 3),
                           dtype=self.dtype, name=f"b{i}")(parts[-1], train)
            )
        return ConvBlock(self.features, 1, dtype=self.dtype, name="out")(
            jnp.concatenate(parts, -1), train
        )


class SPPF(nn.Module):
    features: int
    pool: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.features // 2
        x = ConvBlock(h, 1, dtype=self.dtype, name="in")(x, train)
        p = self.pool
        y1 = nn.max_pool(x, (p, p), (1, 1), padding=[(p // 2, p // 2)] * 2)
        y2 = nn.max_pool(y1, (p, p), (1, 1), padding=[(p // 2, p // 2)] * 2)
        y3 = nn.max_pool(y2, (p, p), (1, 1), padding=[(p // 2, p // 2)] * 2)
        return ConvBlock(self.features, 1, dtype=self.dtype, name="out")(
            jnp.concatenate([x, y1, y2, y3], -1), train
        )


@BACKBONES.register_module()
class CSPDarknet(nn.Module):
    """depth/width multipliers: s = (0.33, 0.5), m = (0.67, 0.75), l = (1, 1).

    ``depths`` overrides the four stage block counts before the depth
    multiplier (YOLOv5 uses (3, 6, 9, 3); the default None keeps the
    YOLOX/YOLOv8 counts this backbone shipped with).
    """

    depth_mult: float = 0.33
    width_mult: float = 0.5
    use_c2f: bool = False  # YOLOv8 flavor
    depths: Any = None  # optional (n1, n2, n3, n4) stage override
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        def w(c):
            return max(16, int(c * self.width_mult // 8 * 8))

        def d(n):
            return max(1, round(n * self.depth_mult))

        deep = 6 if self.use_c2f else 9
        n1, n2, n3, n4 = self.depths or (3, deep, deep, 3)
        Block = C2f if self.use_c2f else CSPLayer
        x = ConvBlock(w(64), 3, 2, dtype=self.dtype, name="stem")(x, train)  # /2
        x = ConvBlock(w(128), 3, 2, dtype=self.dtype, name="down1")(x, train)  # /4
        x = Block(w(128), d(n1), dtype=self.dtype, name="stage1")(x, train)
        x = ConvBlock(w(256), 3, 2, dtype=self.dtype, name="down2")(x, train)  # /8
        c3 = Block(w(256), d(n2), dtype=self.dtype, name="stage2")(x, train)
        x = ConvBlock(w(512), 3, 2, dtype=self.dtype, name="down3")(c3, train)  # /16
        c4 = Block(w(512), d(n3), dtype=self.dtype, name="stage3")(x, train)
        x = ConvBlock(w(1024), 3, 2, dtype=self.dtype, name="down4")(c4, train)  # /32
        x = Block(w(1024), d(n4), dtype=self.dtype, name="stage4")(x, train)
        c5 = SPPF(w(1024), dtype=self.dtype, name="sppf")(x, train)
        return c3, c4, c5


def mish(x):
    return x * jnp.tanh(nn.softplus(x))


class MishConv(nn.Module):
    """conv + BN + Mish — YOLOv4's activation (CSPDarknet53 stages)."""

    features: int
    kernel: int = 3
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            (self.strides, self.strides), padding=self.kernel // 2,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(not train, momentum=0.97, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return mish(x)


class _CSP53Stage(nn.Module):
    """One CSPDarknet53 stage: split, n residual (1x1, 3x3) bottlenecks on
    the main path, concat, 1x1 transition — Mish throughout."""

    features: int
    n: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.features // 2 if self.n > 1 else self.features
        a = MishConv(h, 1, dtype=self.dtype, name="main")(x, train)
        b = MishConv(h, 1, dtype=self.dtype, name="skip")(x, train)
        for i in range(self.n):
            y = MishConv(h // 2 if self.n > 1 else h, 1,
                         dtype=self.dtype, name=f"b{i}_c1")(a, train)
            y = MishConv(h, 3, dtype=self.dtype, name=f"b{i}_c2")(y, train)
            a = a + y
        a = MishConv(h, 1, dtype=self.dtype, name="post")(a, train)
        return MishConv(self.features, 1, dtype=self.dtype, name="out")(
            jnp.concatenate([a, b], -1), train
        )


@BACKBONES.register_module()
class CSPDarknet53(nn.Module):
    """YOLOv4's backbone: Darknet-53 residual counts (1, 2, 8, 8, 4) with
    cross-stage-partial stages and Mish activations. README-advertised only
    in the reference (``README.md:10`` "yolo v4", no code). Returns
    (C3, C4, C5) at strides 8/16/32.
    """

    width_mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        def w(c):
            return max(16, int(c * self.width_mult // 8 * 8))

        x = MishConv(w(32), 3, dtype=self.dtype, name="stem")(x, train)
        outs = []
        for si, (c, n) in enumerate(((64, 1), (128, 2), (256, 8), (512, 8), (1024, 4))):
            x = MishConv(w(c), 3, 2, dtype=self.dtype, name=f"down{si}")(x, train)
            x = _CSP53Stage(w(c), n, dtype=self.dtype, name=f"stage{si}")(x, train)
            outs.append(x)
        return outs[2], outs[3], outs[4]
