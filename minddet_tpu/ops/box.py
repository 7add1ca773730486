"""Box geometry ops in pure JAX (vectorized, static-shape, jit/vmap friendly).

Re-implements the behavior of the reference's numpy/numba geometry libraries
(``pointpillars/src/core/box_np_ops.py`` 812 LoC, ``box_ops.py`` 668 LoC,
``box_coders.py``, ``region_similarity.py``) as batched XLA ops. 2D boxes are
``[x1, y1, x2, y2]``; BEV rotated boxes are ``[x, y, w, l, yaw]``; 3D boxes are
``[x, y, z, w, l, h, yaw]`` (SECOND/KITTI convention: z is box bottom center,
w along x before rotation, l along y).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Axis-aligned 2D boxes
# --------------------------------------------------------------------------

def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [..., 4] corner boxes."""
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """IoU matrix between (N,4) and (M,4) corner boxes -> (N,M).

    Mirrors ``box_np_ops.iou_jit`` (pointpillars/src/core/box_np_ops.py) but as
    one broadcasted XLA expression instead of a numba double loop.
    """
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:4], boxes2[..., None, :, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(boxes1)[..., :, None] + area(boxes2)[..., None, :] - inter
    return inter / jnp.maximum(union, eps)


def elementwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """IoU between boxes of identical leading shape -> [...]."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(boxes1) + area(boxes2) - inter
    return inter / jnp.maximum(union, eps)


def elementwise_ciou(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Complete IoU between corner boxes of identical leading shape -> [...].

    CIoU = IoU - center_dist^2 / enclosing_diag^2 - alpha * v, where v measures
    aspect-ratio mismatch (Zheng et al. 2020). The YOLO v4/v5/v7 box-loss term
    the reference only advertises (its zoo README rows ship no code).
    """
    iou = elementwise_iou(boxes1, boxes2, eps)
    c1 = (boxes1[..., :2] + boxes1[..., 2:4]) * 0.5
    c2 = (boxes2[..., :2] + boxes2[..., 2:4]) * 0.5
    rho2 = jnp.sum((c1 - c2) ** 2, -1)
    enc_lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    enc_rb = jnp.maximum(boxes1[..., 2:4], boxes2[..., 2:4])
    diag2 = jnp.sum((enc_rb - enc_lt) ** 2, -1)
    w1 = jnp.maximum(boxes1[..., 2] - boxes1[..., 0], eps)
    h1 = jnp.maximum(boxes1[..., 3] - boxes1[..., 1], eps)
    w2 = jnp.maximum(boxes2[..., 2] - boxes2[..., 0], eps)
    h2 = jnp.maximum(boxes2[..., 3] - boxes2[..., 1], eps)
    v = (4.0 / jnp.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = jax.lax.stop_gradient(v / jnp.maximum(1.0 - iou + v, eps))
    return iou - rho2 / jnp.maximum(diag2, eps) - alpha * v


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def clip_boxes(boxes: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


# --------------------------------------------------------------------------
# Rotation helpers
# --------------------------------------------------------------------------

def rotation_2d(points: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., N, 2) point sets counterclockwise.

    ``angles`` must broadcast against ``points[..., 0]`` (i.e. shape (..., 1)
    for per-set angles or (..., N) for per-point). Equivalent to
    ``box_np_ops.rotation_2d`` / ``box_ops.rotation_2d`` without einsum.
    """
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    x, y = points[..., 0], points[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def rotation_3d_in_axis(points: jnp.ndarray, angles: jnp.ndarray, axis: int = 2) -> jnp.ndarray:
    """Rotate (..., N, 3) points around the given axis.

    ``angles`` must broadcast against ``points[..., 0]`` (see rotation_2d).
    """
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    if axis == 2:  # around z
        return jnp.stack([c * x - s * y, s * x + c * y, z], axis=-1)
    if axis == 1:  # around y
        return jnp.stack([c * x + s * z, y, -s * x + c * z], axis=-1)
    if axis == 0:  # around x
        return jnp.stack([x, c * y - s * z, s * y + c * z], axis=-1)
    raise ValueError(f"axis must be 0/1/2, got {axis}")


# --------------------------------------------------------------------------
# Corner computation
# --------------------------------------------------------------------------

# numpy, not jnp: a module-level jnp.array would initialize the backend at
# import time (and hang any process whose device tunnel is unreachable)
_CORNER_SIGNS_2D = np.array(
    [[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]], dtype=np.float32
)


def center_to_corner_box2d(
    centers: jnp.ndarray, dims: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """(..., 2) centers, (..., 2) dims, (...,) yaw -> (..., 4, 2) corners.

    Corner order matches ``box_np_ops.center_to_corner_box2d`` (counter-
    clockwise starting at (-w/2, -l/2) in the box frame).
    """
    corners = dims[..., None, :] * _CORNER_SIGNS_2D  # (..., 4, 2)
    corners = rotation_2d(corners, angles[..., None])
    return corners + centers[..., None, :]


def center_to_corner_box3d(
    centers: jnp.ndarray,
    dims: jnp.ndarray,
    angles: jnp.ndarray,
    origin=(0.5, 0.5, 0.0),
) -> jnp.ndarray:
    """(..., 3) centers, (..., 3) dims, (...,) yaw -> (..., 8, 3) corners.

    ``origin`` follows the reference convention (z at the box bottom).
    """
    signs = jnp.stack(
        jnp.meshgrid(
            jnp.array([0.0, 1.0]), jnp.array([0.0, 1.0]), jnp.array([0.0, 1.0]), indexing="ij"
        ),
        axis=-1,
    ).reshape(8, 3)
    offs = (signs - jnp.asarray(origin)) * dims[..., None, :]
    offs = rotation_3d_in_axis(offs, angles[..., None], axis=2)
    return offs + centers[..., None, :]


def rbbox_to_near_bbox(rboxes: jnp.ndarray) -> jnp.ndarray:
    """Rotated BEV [x,y,w,l,yaw] -> nearest axis-aligned [x1,y1,x2,y2].

    Swaps w/l when the box is closer to a 90-degree pose, the trick behind the
    reference's ``NearestIouSimilarity`` (region_similarity.py:39,
    box_np_ops.rbbox2d_to_near_bbox).
    """
    x, y, w, l, yaw = (rboxes[..., i] for i in range(5))
    # swap w/l when |yaw mod pi| is closer to 90 than to 0 degrees
    # (reference: box_np_ops.rbbox2d_to_near_bbox:180-192 via limit_period)
    swap = jnp.abs(limit_period(yaw, 0.5, jnp.pi)) > jnp.pi / 4
    we = jnp.where(swap, l, w)
    le = jnp.where(swap, w, l)
    return jnp.stack([x - we / 2, y - le / 2, x + we / 2, y + le / 2], axis=-1)


# --------------------------------------------------------------------------
# SECOND residual box coder (3D) — reference: box_coders.GroundBox3dCoder,
# box_np_ops.second_box_encode/decode, box_ops.second_box_encode/decode
# --------------------------------------------------------------------------

def second_box_encode(
    boxes: jnp.ndarray, anchors: jnp.ndarray, smooth_dim: bool = False, eps: float = 1e-8
) -> jnp.ndarray:
    """Encode target boxes (..., 7) against anchors (..., 7) -> (..., 7)."""
    xa, ya, za, wa, la, ha, ra = (anchors[..., i] for i in range(7))
    xg, yg, zg, wg, lg, hg, rg = (boxes[..., i] for i in range(7))
    diag = jnp.sqrt(wa * wa + la * la)
    zg = zg + hg / 2
    za = za + ha / 2
    xt = (xg - xa) / jnp.maximum(diag, eps)
    yt = (yg - ya) / jnp.maximum(diag, eps)
    zt = (zg - za) / jnp.maximum(ha, eps)
    if smooth_dim:
        wt = wg / jnp.maximum(wa, eps) - 1
        lt = lg / jnp.maximum(la, eps) - 1
        ht = hg / jnp.maximum(ha, eps) - 1
    else:
        wt = jnp.log(jnp.maximum(wg, eps) / jnp.maximum(wa, eps))
        lt = jnp.log(jnp.maximum(lg, eps) / jnp.maximum(la, eps))
        ht = jnp.log(jnp.maximum(hg, eps) / jnp.maximum(ha, eps))
    rt = rg - ra
    return jnp.stack([xt, yt, zt, wt, lt, ht, rt], axis=-1)


def second_box_decode(
    encodings: jnp.ndarray, anchors: jnp.ndarray, smooth_dim: bool = False
) -> jnp.ndarray:
    """Decode (..., 7) residuals against anchors (..., 7) -> boxes (..., 7)."""
    xa, ya, za, wa, la, ha, ra = (anchors[..., i] for i in range(7))
    xt, yt, zt, wt, lt, ht, rt = (encodings[..., i] for i in range(7))
    diag = jnp.sqrt(wa * wa + la * la)
    za = za + ha / 2
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * ha + za
    if smooth_dim:
        wg = (wt + 1) * wa
        lg = (lt + 1) * la
        hg = (ht + 1) * ha
    else:
        wg = jnp.exp(wt) * wa
        lg = jnp.exp(lt) * la
        hg = jnp.exp(ht) * ha
    rg = rt + ra
    zg = zg - hg / 2
    return jnp.stack([xg, yg, zg, wg, lg, hg, rg], axis=-1)


def limit_period(val: jnp.ndarray, offset: float = 0.5, period: float = jnp.pi) -> jnp.ndarray:
    """Wrap angles into [-offset*period, (1-offset)*period).

    Reference: ``box_np_ops.limit_period``.
    """
    return val - jnp.floor(val / period + offset) * period


# --------------------------------------------------------------------------
# 2D delta box coder (R-CNN/SSD family)
# --------------------------------------------------------------------------

def encode_deltas(
    boxes: jnp.ndarray,
    anchors: jnp.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
    eps: float = 1e-6,
) -> jnp.ndarray:
    """xyxy boxes vs xyxy anchors -> normalized (dx, dy, dw, dh) deltas.

    The standard R-CNN coder (fills the reference's empty Faster R-CNN stack,
    ``minddet/models/faster_rcnn.py``).
    """
    aw = jnp.maximum(anchors[..., 2] - anchors[..., 0], eps)
    ah = jnp.maximum(anchors[..., 3] - anchors[..., 1], eps)
    ax = (anchors[..., 0] + anchors[..., 2]) / 2
    ay = (anchors[..., 1] + anchors[..., 3]) / 2
    gw = jnp.maximum(boxes[..., 2] - boxes[..., 0], eps)
    gh = jnp.maximum(boxes[..., 3] - boxes[..., 1], eps)
    gx = (boxes[..., 0] + boxes[..., 2]) / 2
    gy = (boxes[..., 1] + boxes[..., 3]) / 2
    d = jnp.stack(
        [(gx - ax) / aw, (gy - ay) / ah, jnp.log(gw / aw), jnp.log(gh / ah)],
        axis=-1,
    )
    return (d - jnp.asarray(means)) / jnp.asarray(stds)


def decode_deltas(
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
    max_wh_ratio: float = 16.0,
) -> jnp.ndarray:
    """Inverse of :func:`encode_deltas` with dw/dh clamping."""
    d = deltas * jnp.asarray(stds) + jnp.asarray(means)
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = (anchors[..., 0] + anchors[..., 2]) / 2
    ay = (anchors[..., 1] + anchors[..., 3]) / 2
    limit = jnp.log(max_wh_ratio)
    gx = ax + d[..., 0] * aw
    gy = ay + d[..., 1] * ah
    gw = aw * jnp.exp(jnp.clip(d[..., 2], -limit, limit))
    gh = ah * jnp.exp(jnp.clip(d[..., 3], -limit, limit))
    return jnp.stack(
        [gx - gw / 2, gy - gh / 2, gx + gw / 2, gy + gh / 2], axis=-1
    )
