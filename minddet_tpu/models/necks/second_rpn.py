"""SECOND-style RPN: N down-blocks + N transposed-conv up-blocks, concat.

Shared by PointPillars (``pointpillars/src/pointpillars.py:367-654``: blocks
[3,5,5] convs at strides [2,2,2], upsample strides [1,2,4]) and CenterPoint
(``det3d_ms/models/necks/rpn.py:10-163``). NHWC Flax with eps=1e-3 BN to
match SECOND's convention.

TPU executable-size note: the n same-shape inner conv+BN+ReLU layers of each
block run as ONE ``lax.scan`` over stacked per-layer parameters, so XLA
compiles the block body once instead of n times. At KITTI scale this cuts the
serialized PointPillars train-step executable (whose tunnel load costs
~10 s/MB, docs/STATUS.md) without touching the parameter tree: params/BN
stats keep their per-layer ``block{i}_{j}_conv`` / ``block{i}_{j}_bn`` names
(the checkpoint-converter contract, ``utils/convert.py``) — the stacking
happens at trace time from the unchanged per-layer variables, mirroring the
fused-head trick in ``detectors/pointpillars.py:_preds_from_canvas``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from minddet_tpu.core.registry import NECKS

_BN_MOMENTUM = 0.99
_BN_EPS = 1e-3


@NECKS.register_module()
class SECONDRPN(nn.Module):
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    num_filters: Sequence[int] = (64, 128, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    num_upsample_filters: Sequence[int] = (128, 128, 128)
    dtype: Any = jnp.float32

    def setup(self):
        def bn(name):
            return nn.BatchNorm(momentum=_BN_MOMENTUM, epsilon=_BN_EPS,
                                dtype=self.dtype, name=name)

        down_convs, down_bns, inner, up_convs, up_bns = [], [], [], [], []
        for bi, (n, s, f, us, uf) in enumerate(
            zip(self.layer_nums, self.layer_strides, self.num_filters,
                self.upsample_strides, self.num_upsample_filters)
        ):
            down_convs.append(nn.Conv(
                f, (3, 3), (s, s), padding=1, use_bias=False,
                dtype=self.dtype, name=f"block{bi}_down_conv"))
            down_bns.append(bn(f"block{bi}_down_bn"))
            inner.append(tuple(
                (nn.Conv(f, (3, 3), (1, 1), padding=1, use_bias=False,
                         dtype=self.dtype, name=f"block{bi}_{li}_conv"),
                 bn(f"block{bi}_{li}_bn"))
                for li in range(n)
            ))
            if us >= 1:
                us_i = int(us)
                up_convs.append(nn.ConvTranspose(
                    uf, (us_i, us_i), strides=(us_i, us_i), use_bias=False,
                    dtype=self.dtype, name=f"up{bi}_deconv"))
            else:
                # fractional "upsample" stride (CenterPoint's us=0.5,
                # det3d_ms/models/necks/rpn.py:_make_layer) = stride-2 conv
                ds = int(round(1.0 / us))
                up_convs.append(nn.Conv(
                    uf, (ds, ds), (ds, ds), use_bias=False,
                    dtype=self.dtype, name=f"up{bi}_downconv"))
            up_bns.append(bn(f"up{bi}_bn"))
        self.down_convs = down_convs
        self.down_bns = down_bns
        self.inner = inner
        self.up_convs = up_convs
        self.up_bns = up_bns

    def _inner_block(self, x, layers, train: bool):
        """n x (3x3 conv s1 + BN + ReLU) via ONE scanned body.

        Init (and n == 1) runs the real submodules so the parameter tree
        materializes under the standard per-layer names; the scan path
        reproduces flax BatchNorm's numerics (f32 batch statistics, biased
        variance, normalization in ``dtype``) and writes running-stat
        updates back into each layer's own ``batch_stats`` scope.
        """
        if self.is_initializing() or len(layers) == 1:
            for conv, bnm in layers:
                x = nn.relu(bnm(conv(x), use_running_average=not train))
            return x

        kernels = jnp.stack(
            [c.variables["params"]["kernel"] for c, _ in layers]
        ).astype(self.dtype)
        scale = jnp.stack([b.variables["params"]["scale"] for _, b in layers])
        bias = jnp.stack([b.variables["params"]["bias"] for _, b in layers])
        r_mean = jnp.stack(
            [b.variables["batch_stats"]["mean"] for _, b in layers])
        r_var = jnp.stack(
            [b.variables["batch_stats"]["var"] for _, b in layers])

        def body(h, layer):
            k, sc, bi, mu, va = layer
            y = jax.lax.conv_general_dilated(
                h, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if train:
                yf = y.astype(jnp.float32)
                bm = jnp.mean(yf, axis=(0, 1, 2))
                bv = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(bm)
                stats = (bm, bv)
            else:
                bm, bv = mu, va
                stats = (mu, va)
            m = bm.astype(self.dtype)
            v = bv.astype(self.dtype)
            yn = (y - m) * jax.lax.rsqrt(v + jnp.asarray(_BN_EPS, v.dtype))
            yn = yn * sc.astype(self.dtype) + bi.astype(self.dtype)
            return nn.relu(yn), stats

        x, (batch_means, batch_vars) = jax.lax.scan(
            body, x, (kernels, scale, bias, r_mean, r_var))
        if train:
            new_mean = _BN_MOMENTUM * r_mean + (1 - _BN_MOMENTUM) * batch_means
            new_var = _BN_MOMENTUM * r_var + (1 - _BN_MOMENTUM) * batch_vars
            for li, (_, bnm) in enumerate(layers):
                bnm.put_variable("batch_stats", "mean", new_mean[li])
                bnm.put_variable("batch_stats", "var", new_var[li])
        return x

    def __call__(self, x, train: bool = False):
        ups = []
        for bi in range(len(self.layer_nums)):
            x = self.down_convs[bi](x)
            x = nn.relu(self.down_bns[bi](x, use_running_average=not train))
            x = self._inner_block(x, self.inner[bi], train)
            u = self.up_convs[bi](x)
            u = nn.relu(self.up_bns[bi](u, use_running_average=not train))
            ups.append(u)
        return jnp.concatenate(ups, axis=-1)
