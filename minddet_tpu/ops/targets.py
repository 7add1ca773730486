"""Device-side detection target generation (Gaussian heatmaps, gather indices).

The reference draws Gaussian heatmap targets on the host with numpy, per image
and per object (``centernet/src/image.py:94-147`` ``gaussian_radius`` /
``draw_umich_gaussian``; CenterPoint's ``AssignLabel`` pipeline,
``det3d_ms/datasets/pipelines/preprocess.py``). Here the same math runs as one
batched XLA program on device: each object renders a full-plane truncated
Gaussian, and a scatter-max folds objects into their class channel — no python
loops, no host<->device copies in the input pipeline's hot path.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def gaussian_radius(det_size: Tuple[jnp.ndarray, jnp.ndarray], min_overlap: float = 0.7):
    """Minimum Gaussian radius keeping IoU >= min_overlap under corner shifts.

    Identical three-case quadratic to ``image.py:gaussian_radius:94-115``
    (including its unconventional un-normalized /2 roots, for parity).
    """
    height, width = det_size
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.maximum(b1 * b1 - 4 * c1, 0.0))) / 2

    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + jnp.sqrt(jnp.maximum(b2 * b2 - 16 * c2, 0.0))) / 2

    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3 * b3 - 16 * min_overlap * c3, 0.0))) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_gaussians(
    centers: jnp.ndarray,
    radii: jnp.ndarray,
    classes: jnp.ndarray,
    mask: jnp.ndarray,
    height: int,
    width: int,
    num_classes: int,
) -> jnp.ndarray:
    """Render per-object truncated Gaussians into a (H, W, C) heatmap.

    centers: (O, 2) float [x, y] in output-grid units; radii: (O,) float;
    classes: (O,) int; mask: (O,) bool validity. Matches
    ``draw_umich_gaussian`` (sigma = (2r+1)/6, truncation at radius, max-merge).
    """
    cx = jnp.floor(centers[:, 0]).astype(jnp.float32)
    cy = jnp.floor(centers[:, 1]).astype(jnp.float32)
    r = jnp.maximum(jnp.floor(radii), 0.0)
    diameter = 2.0 * r + 1.0
    sigma = diameter / 6.0

    ys = jnp.arange(height, dtype=jnp.float32)[None, :, None]  # (1, H, 1)
    xs = jnp.arange(width, dtype=jnp.float32)[None, None, :]  # (1, 1, W)
    dy = ys - cy[:, None, None]
    dx = xs - cx[:, None, None]
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma[:, None, None] ** 2))
    inside = (jnp.abs(dx) <= r[:, None, None]) & (jnp.abs(dy) <= r[:, None, None])
    g = jnp.where(inside & mask[:, None, None], g, 0.0)  # (O, H, W)

    heat = jnp.zeros((num_classes, height, width), dtype=jnp.float32)
    cls = jnp.where(mask, classes, 0).astype(jnp.int32)
    heat = heat.at[cls].max(g, mode="drop")
    return jnp.transpose(heat, (1, 2, 0))  # (H, W, C)


def centernet_targets(
    boxes: jnp.ndarray,
    classes: jnp.ndarray,
    mask: jnp.ndarray,
    height: int,
    width: int,
    num_classes: int,
    min_overlap: float = 0.7,
) -> Dict[str, jnp.ndarray]:
    """Build all CenterNet training targets for one image, on device.

    boxes: (O, 4) xyxy in output-grid units; classes: (O,) int; mask: (O,)
    validity. Returns hm (H, W, C), wh (O, 2), reg (O, 2), ind (O,), and the
    (possibly degeneracy-tightened) reg_mask (O,) — the exact columns the
    reference materializes per record (``dataset.py:preprocess_fn:272-384``).
    """
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    w = jnp.clip(x2 - x1, 0.0, None)
    h = jnp.clip(y2 - y1, 0.0, None)
    valid = mask & (w > 0) & (h > 0)

    radius = jnp.maximum(gaussian_radius((h, w), min_overlap), 0.0)
    radius = jnp.floor(radius)
    cx = (x1 + x2) / 2.0
    cy = (y1 + y2) / 2.0
    cx = jnp.clip(cx, 0.0, width - 1.0)
    cy = jnp.clip(cy, 0.0, height - 1.0)
    centers = jnp.stack([cx, cy], axis=-1)

    hm = draw_gaussians(centers, radius, classes, valid, height, width, num_classes)

    cxi = jnp.floor(cx)
    cyi = jnp.floor(cy)
    ind = (cyi * width + cxi).astype(jnp.int32)
    ind = jnp.where(valid, ind, 0)
    wh = jnp.stack([w, h], axis=-1) * valid[:, None]
    reg = jnp.stack([cx - cxi, cy - cyi], axis=-1) * valid[:, None]
    return {
        "hm": hm,
        "wh": wh,
        "reg": reg,
        "ind": ind,
        "reg_mask": valid.astype(jnp.float32),
    }


centernet_targets_batch = jax.vmap(
    centernet_targets, in_axes=(0, 0, 0, None, None, None, None), out_axes=0
)


# ---------------------------------------------------------------------------
# CenterPoint multi-task targets (nuScenes/Waymo)
# ---------------------------------------------------------------------------

def centerpoint_targets(
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    feature_size: Tuple[int, int],
    num_classes: int,
    pc_range: Tuple[float, ...],
    voxel_size: Tuple[float, ...],
    out_size_factor: int = 4,
    gaussian_overlap: float = 0.1,
    min_radius: float = 2.0,
    max_objs: int = 500,
) -> Dict[str, jnp.ndarray]:
    """Targets for ONE CenterHead task group, on device.

    gt_boxes: (O, 9) [x, y, z, w, l, h, vx, vy, rot] world units, padded;
    gt_classes: (O,) int within-task class ids (0-based); gt_mask validity.
    Returns hm (H, W, C), anno_box (O, 10) [dx, dy, z, log dims, vx, vy,
    sin r, cos r], ind (O,), mask (O,), cat (O,) — the exact example columns of
    the reference's AssignLabel pipeline
    (``det3d_ms/datasets/pipelines/preprocess.py:286-481``).
    """
    h, w = feature_size
    vx_sz = voxel_size[0] * out_size_factor
    vy_sz = voxel_size[1] * out_size_factor

    x, y, z = gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2]
    dx, dy_, dz = gt_boxes[:, 3], gt_boxes[:, 4], gt_boxes[:, 5]
    vel_x, vel_y = gt_boxes[:, 6], gt_boxes[:, 7]
    rot = gt_boxes[:, 8]

    gw = dx / vx_sz  # footprint in feature-map cells
    gl = dy_ / vy_sz
    valid = gt_mask & (gw > 0) & (gl > 0)

    radius = gaussian_radius((gl, gw), gaussian_overlap)
    radius = jnp.maximum(jnp.floor(radius), min_radius)

    cx = (x - pc_range[0]) / vx_sz
    cy = (y - pc_range[1]) / vy_sz
    inb = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
    valid = valid & inb
    cx = jnp.clip(cx, 0.0, w - 1e-3)
    cy = jnp.clip(cy, 0.0, h - 1e-3)

    hm = draw_gaussians(
        jnp.stack([cx, cy], -1), radius, gt_classes, valid, h, w, num_classes
    )

    cxi = jnp.floor(cx)
    cyi = jnp.floor(cy)
    ind = jnp.where(valid, (cyi * w + cxi).astype(jnp.int32), 0)
    anno_box = jnp.stack(
        [
            cx - cxi,
            cy - cyi,
            z,
            jnp.log(jnp.maximum(dx, 1e-6)),
            jnp.log(jnp.maximum(dy_, 1e-6)),
            jnp.log(jnp.maximum(dz, 1e-6)),
            vel_x,
            vel_y,
            jnp.sin(rot),
            jnp.cos(rot),
        ],
        axis=-1,
    ) * valid[:, None]
    return {
        "hm": hm,
        "anno_box": anno_box,
        "ind": ind,
        "mask": valid.astype(jnp.float32),
        "cat": jnp.where(valid, gt_classes, 0).astype(jnp.int32),
    }


centerpoint_targets_batch = jax.vmap(
    centerpoint_targets,
    in_axes=(0, 0, 0) + (None,) * 8,
    out_axes=0,
)
