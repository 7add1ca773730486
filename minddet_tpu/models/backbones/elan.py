"""E-ELAN backbone (YOLOv7): dense-tap aggregation blocks + MP downsamples.

The reference README advertises "yolo v7" (``README.md:12``) but ships no
code; this is a clean-room TPU-side implementation. ELAN blocks chain 3x3
convs on one branch and concatenate intermediate taps — all same-shape convs
XLA fuses well on the MXU; MP downsampling runs maxpool and strided-conv
branches in parallel and concatenates. SiLU throughout (shared ``ConvBlock``).
Returns (C3, C4, C5) at strides 8/16/32.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from minddet_tpu.core.registry import BACKBONES
from minddet_tpu.models.backbones.csp_darknet import ConvBlock


class ELANBlock(nn.Module):
    """Two 1x1 entry branches; one runs ``taps`` pairs of 3x3 convs, tapping
    the output of each pair; concat(entry_a, entry_b, *taps) -> 1x1 out."""

    features: int          # output channels
    hidden: int            # per-branch width
    taps: int = 2          # number of tapped 3x3 conv pairs
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = ConvBlock(self.hidden, 1, dtype=self.dtype, name="in_a")(x, train)
        b = ConvBlock(self.hidden, 1, dtype=self.dtype, name="in_b")(x, train)
        parts = [a, b]
        y = b
        for t in range(self.taps):
            y = ConvBlock(self.hidden, 3, dtype=self.dtype, name=f"t{t}_0")(y, train)
            y = ConvBlock(self.hidden, 3, dtype=self.dtype, name=f"t{t}_1")(y, train)
            parts.append(y)
        return ConvBlock(self.features, 1, dtype=self.dtype, name="out")(
            jnp.concatenate(parts, -1), train
        )


class MPDown(nn.Module):
    """YOLOv7 downsample: maxpool2+1x1 || 1x1+3x3(s2), concatenated."""

    features: int  # output channels (split evenly across branches)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.features // 2
        p = nn.max_pool(x, (2, 2), (2, 2))
        p = ConvBlock(h, 1, dtype=self.dtype, name="pool_proj")(p, train)
        q = ConvBlock(h, 1, dtype=self.dtype, name="pre")(x, train)
        q = ConvBlock(h, 3, 2, dtype=self.dtype, name="down")(q, train)
        return jnp.concatenate([p, q], -1)


@BACKBONES.register_module()
class ELANNet(nn.Module):
    """YOLOv7 backbone skeleton: conv stem to /4, then ELAN stages with MP
    downsamples. ``width_mult`` scales the v7-l channel plan
    (C3/C4/C5 = 512/1024/1024)."""

    width_mult: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        def w(c):
            return max(16, int(c * self.width_mult // 8 * 8))

        x = ConvBlock(w(32), 3, dtype=self.dtype, name="stem0")(x, train)
        x = ConvBlock(w(64), 3, 2, dtype=self.dtype, name="stem1")(x, train)   # /2
        x = ConvBlock(w(64), 3, dtype=self.dtype, name="stem2")(x, train)
        x = ConvBlock(w(128), 3, 2, dtype=self.dtype, name="down1")(x, train)  # /4
        x = ELANBlock(w(256), w(64), dtype=self.dtype, name="stage1")(x, train)
        x = MPDown(w(256), dtype=self.dtype, name="mp2")(x, train)             # /8
        c3 = ELANBlock(w(512), w(128), dtype=self.dtype, name="stage2")(x, train)
        x = MPDown(w(512), dtype=self.dtype, name="mp3")(c3, train)            # /16
        c4 = ELANBlock(w(1024), w(256), dtype=self.dtype, name="stage3")(x, train)
        x = MPDown(w(1024), dtype=self.dtype, name="mp4")(c4, train)           # /32
        c5 = ELANBlock(w(1024), w(256), dtype=self.dtype, name="stage4")(x, train)
        return c3, c4, c5
