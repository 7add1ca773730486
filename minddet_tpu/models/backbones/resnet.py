"""ResNet backbone family (NHWC, optional DCNv2 stages).

Re-design of ``centernet/src/resnet.py:24-253`` (ResNet18/50 with
ModulatedDeformConv2d in stages 2-4) as Flax modules — and fills the
reference's empty shared-backbone stub (``minddet/models/backbones/resnet.py``,
"copy resnet backbone from mindcv"). bf16 compute on the MXU, f32 params.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
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

_BN_EPS = 1e-5  # flax BatchNorm default, used by every block BN here


@BACKBONES.register_module()
class ResNet(nn.Module):
    """Multi-scale ResNet; returns (C2, C3, C4, C5) feature maps.

    ``dcn_stages`` marks which of the four stages use deformable convs —
    the reference enables stages 2-4 for CenterNet-DCN (resnet.py:204-206).

    TPU executable-size note: in eval mode, the identical inner Bottleneck
    blocks of each stage (blocks 1..n-1: stride 1, no downsample branch) run
    as ONE ``lax.scan`` over their stacked variables, so XLA compiles each
    stage body once instead of n-1 times — this is what keeps the big
    R50-FPN inference programs loadable over the device tunnel (~10 s/MB,
    docs/STATUS.md). The parameter tree is unchanged (per-block
    ``layer{s}_{i}`` names stay the checkpoint-converter contract); train
    mode and DCN stages keep the per-block path.
    """

    depth: int = 18
    dcn_stages: Sequence[bool] = (False, False, False, False)
    output_stride: int = 32  # 16 or 8 dilate the last stage(s) (DeepLab)
    dtype: Dtype = jnp.float32
    stem_width: int = 64

    def setup(self):
        block_cls, layers = _ARCH[self.depth]
        self._block_cls = block_cls
        widths = (64, 128, 256, 512)
        n_dilated = {32: 0, 16: 1, 8: 2}[self.output_stride]
        dilation = 1
        stages = []
        dilations = []
        for stage, (width, n_blocks) in enumerate(zip(widths, layers)):
            dilate = stage >= 4 - n_dilated and stage > 0
            if dilate:
                dilation *= 2
            dilations.append(dilation)
            blocks = []
            for i in range(n_blocks):
                strides = 2 if (stage > 0 and i == 0 and not dilate) else 1
                blocks.append(block_cls(
                    width,
                    strides=strides,
                    dcn=self.dcn_stages[stage],
                    dilation=dilation,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                ))
            stages.append(tuple(blocks))
        self._dilations = tuple(dilations)
        self.stages = tuple(stages)
        self.stem_conv = nn.Conv(
            self.stem_width, (7, 7), (2, 2), padding=3, use_bias=False,
            dtype=self.dtype, kernel_init=nn.initializers.he_normal(),
            name="conv1")
        self.stem_bn = nn.BatchNorm(momentum=0.9, dtype=self.dtype,
                                    name="bn1")

    def _scan_bottlenecks(self, x, blocks, dilation: int):
        """Eval-mode scan over identical stride-1 Bottlenecks.

        Reproduces Bottleneck exactly: three conv+BN(running stats) with
        ReLU after the first two, residual add, final ReLU. Parameters and
        running stats are stacked (L, ...) at trace time from the unchanged
        per-block variables (the fused-head idiom,
        ``detectors/pointpillars.py:_preds_from_canvas``).
        """
        names = ("conv1", "bn1", "conv2", "bn2", "conv3", "bn3")

        def stack(path, leaf, col="params"):
            return jnp.stack(
                [b.variables[col][path][leaf] for b in blocks])

        ks = [stack(c, "kernel").astype(self.dtype)
              for c in ("conv1", "conv2", "conv3")]
        bn = []
        for b_name in ("bn1", "bn2", "bn3"):
            bn.append((
                stack(b_name, "scale"), stack(b_name, "bias"),
                stack(b_name, "mean", "batch_stats"),
                stack(b_name, "var", "batch_stats"),
            ))
        _ = names
        d = dilation

        def bn_eval(y, params):
            sc, bi, mu, va = (p.astype(self.dtype) for p in params)
            return (y - mu) * jax.lax.rsqrt(
                va + jnp.asarray(_BN_EPS, va.dtype)) * sc + bi

        def body(h, layer):
            k1, k2, k3, bn1, bn2, bn3 = layer
            y = jax.lax.conv_general_dilated(
                h, k1, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = nn.relu(bn_eval(y, bn1))
            y = jax.lax.conv_general_dilated(
                y, k2, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = nn.relu(bn_eval(y, bn2))
            y = jax.lax.conv_general_dilated(
                y, k3, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = bn_eval(y, bn3)
            return nn.relu(y + h), ()

        x = x.astype(self.dtype)
        x, _ = jax.lax.scan(
            body, x, (ks[0], ks[1], ks[2], bn[0], bn[1], bn[2]))
        return x

    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        x = self.stem_conv(x)
        x = nn.relu(self.stem_bn(x, use_running_average=not train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outputs = []
        for stage, blocks in enumerate(self.stages):
            x = blocks[0](x, train=train)
            rest = blocks[1:]
            scan_ok = (
                not train and not self.is_initializing()
                and len(rest) >= 2
                and self._block_cls is Bottleneck
                and not self.dcn_stages[stage]
            )
            if scan_ok:
                x = self._scan_bottlenecks(x, rest, self._dilations[stage])
            else:
                for blk in rest:
                    x = blk(x, train=train)
            outputs.append(x)
        return tuple(outputs)

    @property
    def out_channels(self) -> Tuple[int, ...]:
        block_cls, _ = _ARCH[self.depth]
        mult = 4 if block_cls is Bottleneck else 1
        return tuple(w * mult for w in (64, 128, 256, 512))
