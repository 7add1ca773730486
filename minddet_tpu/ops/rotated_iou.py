"""Rotated-box IoU, fully vectorized for the VPU (no sequential clipping).

Replaces the reference's four native rotated-overlap engines — numba-CUDA
``rotate_iou_gpu_eval`` (``pointpillars/eval_gpu/rotate_iou.py:264-340``), the
C++ ``nms_fast.so`` (``centerpoint/det3d_ms/ops/iou-bev-nms-org.cpp``), the TIK
``RotatedOverlapsUB`` engine (``det3d_ms/ops/utils.py:48-1249``), and the CUDA
``iou3d_nms_kernel.cu`` — with one branch-free formulation:

intersection(rect A, rect B) vertices are a subset of
  {corners of A inside B} ∪ {corners of B inside A} ∪ {edge-edge crossings}
(≤ 24 candidates). We compute all candidates with validity masks, recover the
boundary chain by selecting each valid point's angular successor with an
O(24²) elementwise min + one-hot contraction (no sort, no gather — both are
slow on TPU), and take the cyclic cross-product area. Every step is a
fixed-shape arithmetic op on the VPU with zero host round trips.

Box layout: [x, y, w, l, yaw] — center, extents, rotation (radians, CCW).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
# Inclusion tests compare cross products whose FP rounding error scales with
# coordinate magnitude (~1e-4 at KITTI ranges). Being inclusive is safe: a
# borderline point is a near-duplicate of a true clip vertex, contributing
# ~zero area — while a false exclusion can drop the whole intersection for
# touching/identical boxes.
_EPS_INCLUDE = 1e-4


def rect_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) rotated boxes -> (..., 4, 2) corners in CCW order."""
    x, y, w, l, r = (boxes[..., i] for i in range(5))
    dx = jnp.stack([w, -w, -w, w], axis=-1) * 0.5
    dy = jnp.stack([l, l, -l, -l], axis=-1) * 0.5
    c, s = jnp.cos(r)[..., None], jnp.sin(r)[..., None]
    cx = c * dx - s * dy + x[..., None]
    cy = s * dx + c * dy + y[..., None]
    return jnp.stack([cx, cy], axis=-1)


def _cross(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _points_in_quad(pts: jnp.ndarray, quad: jnp.ndarray) -> jnp.ndarray:
    """pts (P, 2) inside CCW convex quad (4, 2) -> (P,) bool."""
    nxt = jnp.roll(quad, -1, axis=0)
    # cross((q1-q0), (p-q0)) >= 0 for all edges
    d = _cross(quad[None, :, :], nxt[None, :, :], pts[:, None, :])
    return jnp.all(d >= -_EPS_INCLUDE, axis=-1)


def _segment_intersections(ca: jnp.ndarray, cb: jnp.ndarray):
    """All 16 edge-edge crossing points between two quads.

    Returns (16, 2) points and (16,) validity.
    """
    a0 = jnp.repeat(ca, 4, axis=0)  # (16, 2)
    a1 = jnp.repeat(jnp.roll(ca, -1, axis=0), 4, axis=0)
    b0 = jnp.tile(cb, (4, 1))
    b1 = jnp.tile(jnp.roll(cb, -1, axis=0), (4, 1))
    r = a1 - a0
    s = b1 - b0
    denom = r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]
    qp = b0 - a0
    t = (qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom
    )
    u = (qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]) / jnp.where(
        jnp.abs(denom) < _EPS, 1.0, denom
    )
    tol = 1e-6
    valid = (
        (jnp.abs(denom) >= _EPS)
        & (t >= -tol) & (t <= 1 + tol)
        & (u >= -tol) & (u <= 1 + tol)
    )
    pts = a0 + t[:, None] * r
    return pts, valid


def _pair_intersection_area(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two [x,y,w,l,yaw] boxes (scalar)."""
    ca = rect_corners(box_a)  # (4, 2)
    cb = rect_corners(box_b)
    in_b = _points_in_quad(ca, cb)  # (4,)
    in_a = _points_in_quad(cb, ca)
    xpts, xvalid = _segment_intersections(ca, cb)  # (16, 2), (16,)

    pts = jnp.concatenate([ca, cb, xpts], axis=0)  # (24, 2)
    valid = jnp.concatenate([in_b, in_a, xvalid], axis=0)  # (24,)
    n_valid = jnp.sum(valid)

    vf = valid.astype(pts.dtype)[:, None]
    center = jnp.sum(pts * vf, axis=0) / jnp.maximum(n_valid, 1).astype(pts.dtype)
    rel = pts - center
    ang = jnp.arctan2(rel[:, 1], rel[:, 0])
    key = jnp.where(valid, ang, 1e9)  # invalid points sort to the end
    order = jnp.argsort(key)
    sp = pts[order]  # valid points first, CCW by angle

    # triangle fan from the first valid point
    p0 = sp[0]
    v1 = sp[1:-1] - p0  # (22, 2)
    v2 = sp[2:] - p0
    tris = 0.5 * (v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0])
    idx = jnp.arange(2, pts.shape[0])
    area = jnp.sum(jnp.where(idx < n_valid, tris, 0.0))
    return jnp.where(n_valid >= 3, jnp.maximum(area, 0.0), 0.0)


_pair_area_nm_ref = jax.vmap(jax.vmap(_pair_intersection_area, (None, 0)), (0, None))


# ---------------------------------------------------------------------------
# Fast batched path. XLA's argsort+gather over the 24-candidate axis dominated
# the op (~390 of ~400 ms for a 1024x1024 IoU matrix on v5e). Since a
# rect-rect intersection has at most 8 vertices, the boundary chain is
# recovered WITHOUT sorting: each valid point's angular successor is selected
# by an O(24^2) elementwise min + one-hot contraction, and the area is the
# cyclic cross-product sum. 9x faster than the sort formulation on v5e.
# ---------------------------------------------------------------------------

def _intersection_areas_batched(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, 5) x (M, 5) -> (N, M) intersection areas, no vmap, no gathers."""
    n, m = boxes1.shape[0], boxes2.shape[0]
    ca = rect_corners(boxes1)  # (N, 4, 2)
    cb = rect_corners(boxes2)  # (M, 4, 2)

    # corners of A in B / corners of B in A ------------------------------
    def quad_edges(c):
        nxt = jnp.roll(c, -1, axis=1)
        return c, nxt

    qb, qb_n = quad_edges(cb)  # (M, 4, 2)
    # cross((q1-q0), (p-q0)) for every (pair, cornerA, edgeB)
    pa = ca[:, None, :, None, :]  # (N, 1, 4, 1, 2)
    e0 = qb[None, :, None, :, :]  # (1, M, 1, 4, 2)
    e1 = qb_n[None, :, None, :, :]
    d = (e1[..., 0] - e0[..., 0]) * (pa[..., 1] - e0[..., 1]) - (
        e1[..., 1] - e0[..., 1]
    ) * (pa[..., 0] - e0[..., 0])
    in_b = jnp.all(d >= -_EPS_INCLUDE, axis=-1)  # (N, M, 4)

    qa, qa_n = quad_edges(ca)
    pb = cb[None, :, None, :, :]  # (1, M, 1, 4, 2) points of B
    f0 = qa[:, None, :, None, :]  # (N, 1, 4, 1, 2) edges of A
    f1 = qa_n[:, None, :, None, :]
    d2 = (f1[..., 0] - f0[..., 0]) * (pb[..., 1] - f0[..., 1]) - (
        f1[..., 1] - f0[..., 1]
    ) * (pb[..., 0] - f0[..., 0])
    in_a = jnp.all(d2 >= -_EPS_INCLUDE, axis=-2)  # (N, M, 4) all over A-edges

    # edge-edge intersections (N, M, 4, 4) ------------------------------
    a0 = qa[:, None, :, None, :]
    a1 = qa_n[:, None, :, None, :]
    b0 = qb[None, :, None, :, :]
    b1 = qb_n[None, :, None, :, :]
    r = a1 - a0
    s = b1 - b0
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qp = b0 - a0
    safe = jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
    t = (qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]) / safe
    u = (qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]) / safe
    tol = 1e-6
    xvalid = (
        (jnp.abs(denom) >= _EPS)
        & (t >= -tol) & (t <= 1 + tol) & (u >= -tol) & (u <= 1 + tol)
    )
    xpt = a0 + t[..., None] * r  # (N, M, 4, 4, 2)

    # candidate set (N, M, 24) ------------------------------------------
    pts_a = jnp.broadcast_to(ca[:, None], (n, m, 4, 2))
    pts_b = jnp.broadcast_to(cb[None, :], (n, m, 4, 2))
    px = jnp.concatenate(
        [pts_a[..., 0], pts_b[..., 0], xpt[..., 0].reshape(n, m, 16)], axis=-1
    )
    py = jnp.concatenate(
        [pts_a[..., 1], pts_b[..., 1], xpt[..., 1].reshape(n, m, 16)], axis=-1
    )
    valid = jnp.concatenate([in_b, in_a, xvalid.reshape(n, m, 16)], axis=-1)

    vf = valid.astype(px.dtype)
    n_valid = jnp.sum(vf, axis=-1)
    denom_c = jnp.maximum(n_valid, 1.0)
    cx = jnp.sum(px * vf, axis=-1) / denom_c
    cy = jnp.sum(py * vf, axis=-1) / denom_c
    ang = jnp.arctan2(py - cy[..., None], px - cx[..., None])
    # deterministic tie-break so duplicate candidate points chain correctly
    ang = ang + jnp.arange(24, dtype=px.dtype) * 1e-6

    # Angular SUCCESSOR of each valid point via a one-hot contraction —
    # no sorting at all. The boundary is the cyclic chain of valid points in
    # angle order; area = 1/2 sum_i cross(p_i - c, succ(p_i) - c).
    delta = jnp.mod(ang[..., None, :] - ang[..., :, None], 2 * jnp.pi)
    pair_ok = valid[..., None, :] & valid[..., :, None]
    eye = jnp.eye(24, dtype=bool)
    delta = jnp.where(pair_ok & ~eye, delta, 1e9)
    succ_min = jnp.min(delta, axis=-1, keepdims=True)
    onehot = (delta == succ_min) & (succ_min < 1e8)
    of = onehot.astype(px.dtype)
    sx = jnp.einsum("...ij,...j->...i", of, px)
    sy = jnp.einsum("...ij,...j->...i", of, py)

    rx = px - cx[..., None]
    ry = py - cy[..., None]
    ex = sx - cx[..., None]
    ey = sy - cy[..., None]
    tris = 0.5 * (rx * ey - ry * ex) * vf
    area = jnp.sum(tris, axis=-1)
    return jnp.where(n_valid >= 3, jnp.maximum(area, 0.0), 0.0)


_pair_area_nm = _intersection_areas_batched


def _on_tpu() -> bool:
    # honor an explicit jax.default_device(cpu) context (eager CPU init
    # while the TPU backend exists): Pallas only lowers for TPU
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", None) not in ("tpu", "axon"):
        return False
    return any(d.platform in ("tpu", "axon") for d in jax.devices())


def rotated_intersection_bev(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection areas (N, 5) x (M, 5) -> (N, M).

    On TPU this dispatches to the Pallas Sutherland–Hodgman kernel
    (``ops/rotated_iou_pallas.py``: pair axes on the vector lanes, vertex
    loops unrolled in registers); the XLA angular-successor formulation
    below is the CPU/test fallback and the numerical reference.
    """
    if _on_tpu():
        from minddet_tpu.ops.rotated_iou_pallas import (
            rotated_intersection_bev_pallas,
        )

        return rotated_intersection_bev_pallas(boxes1, boxes2)
    return _pair_area_nm(boxes1, boxes2)


def rotated_iou_bev(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    criterion: int = -1,
    row_chunk: int = 256,
) -> jnp.ndarray:
    """Pairwise rotated IoU (N, 5) x (M, 5) -> (N, M).

    ``criterion`` matches the reference's KITTI evaluator
    (``rotate_iou.py:devRotateIoUEval``): -1 = IoU (union), 0 = intersection
    over area(box1), 1 = intersection over area(box2).

    Rows are processed in chunks of ``row_chunk`` via ``lax.map`` to bound the
    (N, M, 24)-candidate intermediate memory for large N*M.
    """
    n, m = boxes1.shape[0], boxes2.shape[0]
    area1 = boxes1[:, 2] * boxes1[:, 3]
    area2 = boxes2[:, 2] * boxes2[:, 3]

    if _on_tpu() or n * m <= row_chunk * 1024:
        # Pallas kernel streams (TILE_N, TILE_M) pair tiles: no blow-up to
        # chunk; the XLA path's (N, M, 24) intermediate only fits small N*M
        inter = rotated_intersection_bev(boxes1, boxes2)
    else:
        pad = (-n) % row_chunk
        b1 = jnp.pad(boxes1, ((0, pad), (0, 0)), constant_values=1.0)
        chunks = b1.reshape(-1, row_chunk, 5)
        inter = jax.lax.map(lambda c: _pair_area_nm(c, boxes2), chunks)
        inter = inter.reshape(-1, m)[:n]

    if criterion == -1:
        denom = area1[:, None] + area2[None, :] - inter
    elif criterion == 0:
        denom = area1[:, None] * jnp.ones_like(area2)[None, :]
    elif criterion == 1:
        denom = jnp.ones_like(area1)[:, None] * area2[None, :]
    else:
        raise ValueError(f"criterion must be -1/0/1, got {criterion}")
    return inter / jnp.maximum(denom, _EPS)


def rotated_iou_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3D IoU of (N, 7) x (M, 7) [x,y,z,w,l,h,yaw] boxes -> (N, M).

    BEV rotated intersection x vertical overlap, SECOND/KITTI convention
    (z = bottom center). Reference: ``d3_box_overlap`` in
    ``pointpillars/src/core/eval_utils.py`` and ``iou3d_nms_kernel.cu``.
    """
    bev1 = boxes1[:, [0, 1, 3, 4, 6]]
    bev2 = boxes2[:, [0, 1, 3, 4, 6]]
    inter_bev = rotated_intersection_bev(bev1, bev2)
    zmin1, zmax1 = boxes1[:, 2], boxes1[:, 2] + boxes1[:, 5]
    zmin2, zmax2 = boxes2[:, 2], boxes2[:, 2] + boxes2[:, 5]
    zo = jnp.maximum(
        jnp.minimum(zmax1[:, None], zmax2[None, :])
        - jnp.maximum(zmin1[:, None], zmin2[None, :]),
        0.0,
    )
    inter3d = inter_bev * zo
    vol1 = boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5]
    vol2 = boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5]
    return inter3d / jnp.maximum(vol1[:, None] + vol2[None, :] - inter3d, _EPS)
