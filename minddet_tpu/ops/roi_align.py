"""ROIAlign on TPU via the Pallas bilinear-gather primitive.

The reference never shipped its ROI head (``minddet/models/heads/roi_head.py``
is a 4-line stub); CUDA ROIAlign is what torch-based det stacks use. Here each
ROI bin's sampling points become rows of one big `bilinear_sample_2d` call —
the same VMEM one-hot gather kernel that powers DCN — so ROI feature
extraction is a couple of MXU matmuls instead of a scalar CUDA loop.

Boxes are [x1, y1, x2, y2] in feature-map coordinates (callers apply the
spatial_scale). Static shapes: R rois per image, zero-area rois yield zeros.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from minddet_tpu.ops.bilinear import bilinear_sample_2d


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "implementation"))
def roi_align(
    features: jnp.ndarray,   # (B, H, W, C)
    boxes: jnp.ndarray,      # (B, R, 4) xyxy feature coords
    output_size: Tuple[int, int] = (7, 7),
    sampling_ratio: int = 2,
    implementation: str = "auto",
) -> jnp.ndarray:
    """-> (B, R, ph, pw, C), torchvision-aligned=False convention."""
    b, r = boxes.shape[:2]
    ph, pw = output_size
    s = sampling_ratio

    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    rw = jnp.maximum(x2 - x1, 1.0)[..., None]  # (B, R, 1)
    rh = jnp.maximum(y2 - y1, 1.0)[..., None]
    bin_w = rw / pw
    bin_h = rh / ph

    # sample grid inside each bin: (s*ph) x (s*pw) points per roi
    gy = (jnp.arange(ph * s, dtype=jnp.float32) + 0.5) / s  # bin units
    gx = (jnp.arange(pw * s, dtype=jnp.float32) + 0.5) / s
    ys = y1[..., None] + bin_h * gy  # (B, R, ph*s)
    xs = x1[..., None] + bin_w * gx  # (B, R, pw*s)

    yy = jnp.broadcast_to(ys[..., :, None], (b, r, ph * s, pw * s))
    xx = jnp.broadcast_to(xs[..., None, :], (b, r, ph * s, pw * s))
    pts_y = yy.reshape(b, -1)
    pts_x = xx.reshape(b, -1)

    samples = bilinear_sample_2d(features, pts_y, pts_x, implementation)
    c = features.shape[-1]
    samples = samples.reshape(b, r, ph, s, pw, s, c)
    return jnp.mean(samples, axis=(3, 5))


def multilevel_roi_align(
    features: Sequence[jnp.ndarray],   # list of (B, Hi, Wi, C), strides aligned
    boxes: jnp.ndarray,                # (B, R, 4) xyxy IMAGE coords
    strides: Sequence[int],            # e.g. (4, 8, 16, 32)
    output_size: Tuple[int, int] = (7, 7),
    canonical_scale: float = 224.0,
    canonical_level: int = 2,          # k0 index into `strides` for scale 224
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """FPN-style ROIAlign: assign each ROI to a pyramid level by its scale
    (FPN paper eq. 1), sample every level, select per-roi. The select costs
    len(levels) x the gather but keeps everything static-shape (no dynamic
    partitions — the XLA-friendly formulation).
    """
    area = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0.0
    )
    k = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(area) / canonical_scale + 1e-8))
    k = jnp.clip(k, 0, len(features) - 1).astype(jnp.int32)  # (B, R)

    outs = []
    for li, (feat, stride) in enumerate(zip(features, strides)):
        scaled = boxes / stride
        outs.append(roi_align(feat, scaled, output_size, sampling_ratio))
    stacked = jnp.stack(outs, axis=0)  # (L, B, R, ph, pw, C)
    sel = jax.nn.one_hot(k, len(features), axis=0)  # (L, B, R)
    return jnp.einsum("lbr,lbrhwc->brhwc", sel, stacked)
