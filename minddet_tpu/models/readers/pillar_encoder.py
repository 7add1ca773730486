"""Pillar Feature Network + pseudo-image scatter (NHWC, masked, static-shape).

Rebuilds the reference's two PFN variants — PointPillars'
(``pointpillars/src/pointpillars.py:180-320``: Dense -> BN over channels ->
ReLU -> max over points) and CenterPoint's masked-BatchNorm flavor
(``det3d_ms/models/readers/pillar_encoder.py:18-199``, ``custom_bn.py:8``,
where BN statistics run over valid pillars only) — plus the ScatterNd
pseudo-image (``PointPillarsScatter``, pillar_encoder.py:203-230) as a single
`.at[].set` scatter into an NHWC canvas.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from minddet_tpu.core.registry import READERS


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose statistics cover only valid (masked) positions.

    The reference's ``BatchNorm2dMasked`` (centerpoint custom_bn.py:8): padded
    pillar slots would otherwise drag the batch statistics toward zero.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        # x: (..., C); mask broadcastable to x[..., 0]
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            # Single pass, f32 ACCUMULATION only: sum(x), sum(x^2) with a
            # float32 reduction dtype — never materializing an f32 copy of
            # the (B, V, P, C) tensor. The two-pass (x - mean)^2 formulation
            # read the canvas-sized activation twice in f32 and was the
            # HBM wall the round-2 xplane trace blamed (STATUS.md gap #3).
            m = mask[..., None].astype(x.dtype)
            red = tuple(range(x.ndim - 1))
            denom = jnp.maximum(
                jnp.sum(mask, dtype=jnp.float32), 1.0)
            xm = x * m
            mean = jnp.sum(xm, axis=red, dtype=jnp.float32) / denom
            # square in f32 (ADVICE r3): the cast fuses into the reduction,
            # so no f32 copy materializes, but E[x^2] keeps f32 mantissas —
            # the bf16-squared form loses them before accumulation and makes
            # the E[x^2] - mean^2 cancellation worse for high-mean channels
            xf = xm.astype(jnp.float32)
            sq = jnp.sum(xf * xf, axis=red, dtype=jnp.float32) / denom
            var = jnp.maximum(sq - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        # fold (mean, var, scale, bias) into one fused multiply-add in the
        # compute dtype: y = x * a + b
        a = (scale / jnp.sqrt(var + self.epsilon)).astype(x.dtype)
        b = (bias - mean * scale / jnp.sqrt(var + self.epsilon)).astype(x.dtype)
        return x * a + b


class PFNLayer(nn.Module):
    """Dense -> (masked) BN -> ReLU -> max over points.

    Reference: ``PFNLayer`` (pointpillars.py:180-224). Non-last layers emit
    half width and concat the pillar max back onto each point.
    """

    out_features: int
    last_layer: bool = True
    masked_bn: bool = True
    dtype: Any = jnp.float32

    @property
    def units(self):
        return self.out_features if self.last_layer else self.out_features // 2

    def setup(self):
        self.linear = nn.Dense(self.units, use_bias=False, dtype=self.dtype)
        if self.masked_bn:
            self.norm = MaskedBatchNorm(dtype=self.dtype)
        else:
            self.norm = nn.BatchNorm(momentum=0.99, epsilon=1e-3,
                                     dtype=self.dtype)

    def _dense_bn_relu(self, x, valid, train):
        x = self.linear(x)
        if self.masked_bn:
            x = self.norm(x, valid, train=train)
        else:
            x = self.norm(x, use_running_average=not train)
        x = nn.relu(x)
        return x * valid[..., None].astype(x.dtype)

    def __call__(self, x, point_mask, train: bool = False):
        x = self._dense_bn_relu(x, point_mask, train)
        x_max = jnp.max(x, axis=2, keepdims=True)  # (B, V, 1, U)
        if self.last_layer:
            return x_max
        rep = jnp.broadcast_to(
            x_max, x.shape[:2] + (x.shape[2], self.units))
        return jnp.concatenate([x, rep], axis=-1)

    def stream(self, x, keep, first, last, train: bool = False,
               bound: int | None = None):
        """Sorted point stream (B, N, Cin) + keep/segment-head/last-kept
        flags -> per-point running features; at each segment's last KEPT row
        the value is the pillar feature (same math as the padded path: the
        BN statistics cover exactly the kept points, the max covers the same
        set). ``bound`` (the voxelizer's per-pillar point cap) switches the
        segmented ops to distance-bounded shift levels."""
        from minddet_tpu.ops.seg_pallas import seg_full_max_bounded
        from minddet_tpu.ops.voxelize import _seg_bcast_bounded, seg_running_max

        x = self._dense_bn_relu(x, keep, train)
        if bound is not None:
            if self.last_layer:
                # consumers read only each segment's last kept row, where
                # the running max already IS the full max — skip the
                # broadcast-back pass entirely
                return seg_running_max(first, x, axis=1, bound=bound)
            # running-max + broadcast-back through one entry point
            # (ops/seg_pallas.py). Default is the XLA shift-level form; the
            # single-pass Pallas kernel is a measured negative on v5e
            # (113 ms vs 12 ms standalone fwd — see its docstring) and
            # stays opt-in.
            full = seg_full_max_bounded(first, last, x, bound)
        else:
            m = seg_running_max(first, x, axis=1, bound=bound)
            if self.last_layer:
                return m
            # non-last layers concat each pillar's FULL max back to every
            # kept point: broadcast the last-kept-row value backward
            ends = jnp.concatenate(
                [first[:, 1:], jnp.ones_like(first[:, :1])], axis=1)
            # flags stay (B, N, 1): broadcasting to m's channel width
            # doubles the scanned bytes at every level
            filled = _ffill_scan(jnp.flip(ends[..., None], 1),
                                 jnp.flip(m, 1))
            full = jnp.flip(filled, 1)
        return jnp.concatenate([x, full], axis=-1)


def _ffill_scan(flags, vals):
    import jax

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)

    _, out = jax.lax.associative_scan(comb, (flags, vals), axis=1)
    return out


@READERS.register_module()
class PillarFeatureNet(nn.Module):
    """Decorated pillar points (B, V, P, 10) -> pillar features (B, V, C).

    Feature decoration (cluster/center offsets) happens in
    ``ops.voxelize.decorate_pillar_features`` so it can fuse with the
    voxelizer; this module is the learned part only.
    """

    num_filters: Sequence[int] = (64,)
    masked_bn: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.layers = [
            PFNLayer(
                nf, last_layer=i == len(self.num_filters) - 1,
                masked_bn=self.masked_bn, dtype=self.dtype, name=f"pfn{i}",
            )
            for i, nf in enumerate(self.num_filters)
        ]

    def __call__(self, features, num_points, train: bool = False):
        b, v, p, _ = features.shape
        point_mask = (
            jnp.arange(p)[None, None, :] < num_points[..., None]
        )
        x = features.astype(self.dtype)
        for layer in self.layers:
            x = layer(x, point_mask, train=train)
        return x.squeeze(axis=2)  # (B, V, C)

    def stream(self, feats, keep, first, last, train: bool = False,
               bound: int | None = None):
        """Decorated point stream (B, N, Cin) -> running pillar features
        (B, N, C); consumers scatter the last-KEPT rows (StreamVoxels.
        canvas_idx) onto the canvas. Requires masked_bn (the padded path's
        plain BN would see a different zero population)."""
        assert self.masked_bn, "stream PFN requires masked batch norm"
        x = feats.astype(self.dtype)
        for layer in self.layers:
            x = layer.stream(x, keep, first, last, train=train, bound=bound)
        return x


@READERS.register_module()
class PointPillarsScatter(nn.Module):
    """Pillar features (B, V, C) + coords (B, V, 3)[gz,gy,gx] -> (B, ny, nx, C).

    One `.at[].set` scatter replaces the reference's ScatterNd + slice dance
    (pillar_encoder.py:223-230, pointpillars.py:356-364). Empty slots
    (coords < 0) are dropped via index clamping + mode="drop".
    """

    ny: int
    nx: int

    @nn.compact
    def __call__(self, pillar_features, coords):
        b, v, c = pillar_features.shape
        gy = coords[..., 1]
        gx = coords[..., 2]
        valid = coords[..., 0] >= 0
        gy = jnp.where(valid, gy, self.ny)  # out-of-range -> dropped
        gx = jnp.where(valid, gx, self.nx)
        canvas = jnp.zeros((b, self.ny, self.nx, c), pillar_features.dtype)
        bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, v))
        # One pillar per cell -> unique indices (duplicates only among the
        # dropped OOB rows), which spares XLA the packed compare-exchange
        # lowering for last-write-wins (~15 ms/step at KITTI scale).
        # NOTE: `voxelize` orders slots by FIRST APPEARANCE (round 3, the
        # reference's overflow contract), so the cell indices are NOT sorted
        # anymore — the sorted hint would be undefined behavior.
        canvas = canvas.at[bidx, gy, gx].set(
            pillar_features, mode="drop", unique_indices=True,
        )
        return canvas
