"""Rotated IoU vs. an independent shapely-free numpy reference (polygon clip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from minddet_tpu.ops.rotated_iou import (
    rect_corners,
    rotated_intersection_bev,
    rotated_iou_3d,
    rotated_iou_bev,
)


def _np_rect_corners(box):
    x, y, w, l, r = box
    pts = np.array(
        [[w / 2, l / 2], [-w / 2, l / 2], [-w / 2, -l / 2], [w / 2, -l / 2]]
    )
    rot = np.array([[np.cos(r), -np.sin(r)], [np.sin(r), np.cos(r)]])
    return pts @ rot.T + np.array([x, y])


def _np_clip_polygon(poly, a, b):
    """Sutherland-Hodgman: clip poly against half-plane left of a->b."""
    out = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        cur_in = np.cross(b - a, cur - a) >= 0
        nxt_in = np.cross(b - a, nxt - a) >= 0
        if cur_in:
            out.append(cur)
        if cur_in != nxt_in:
            d = nxt - cur
            denom = np.cross(b - a, d)
            t = np.cross(b - a, a - cur) / denom
            out.append(cur + t * d)
    return out


def _np_rotated_inter(b1, b2):
    poly = list(_np_rect_corners(b1))
    clip = _np_rect_corners(b2)
    for i in range(4):
        if not poly:
            return 0.0
        poly = _np_clip_polygon(np.array(poly), clip[i], clip[(i + 1) % 4])
    if len(poly) < 3:
        return 0.0
    p = np.array(poly)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _np_rotated_iou(b1, b2):
    inter = _np_rotated_inter(b1, b2)
    union = b1[2] * b1[3] + b2[2] * b2[3] - inter
    return inter / max(union, 1e-8)


def test_identical_boxes():
    b = jnp.array([[1.0, 2.0, 3.0, 4.0, 0.7]])
    iou = rotated_iou_bev(b, b)
    np.testing.assert_allclose(np.asarray(iou), [[1.0]], atol=1e-5)


def test_disjoint_boxes():
    b1 = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.3]])
    b2 = jnp.array([[100.0, 100.0, 2.0, 2.0, 1.0]])
    np.testing.assert_allclose(np.asarray(rotated_iou_bev(b1, b2)), [[0.0]], atol=1e-7)


def test_axis_aligned_matches_simple_iou():
    b1 = jnp.array([[0.0, 0.0, 4.0, 4.0, 0.0]])
    b2 = jnp.array([[2.0, 0.0, 4.0, 4.0, 0.0]])
    # inter = 2*4 = 8, union = 16+16-8 = 24
    np.testing.assert_allclose(
        np.asarray(rotated_iou_bev(b1, b2)), [[8.0 / 24.0]], atol=1e-5
    )


def test_contained_box():
    b1 = jnp.array([[0.0, 0.0, 10.0, 10.0, 0.5]])
    b2 = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.9]])
    np.testing.assert_allclose(
        np.asarray(rotated_iou_bev(b1, b2)), [[4.0 / 100.0]], atol=1e-5
    )
    # intersection-over-area criteria
    np.testing.assert_allclose(
        np.asarray(rotated_iou_bev(b1, b2, criterion=1)), [[1.0]], atol=1e-5
    )


def test_45_degree_cross():
    b1 = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b2 = jnp.array([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
    expect = _np_rotated_iou(np.asarray(b1[0]), np.asarray(b2[0]))
    np.testing.assert_allclose(np.asarray(rotated_iou_bev(b1, b2)), [[expect]], atol=1e-4)


def test_random_vs_numpy_reference():
    rng = np.random.RandomState(42)
    n, m = 12, 9
    b1 = np.stack(
        [
            rng.uniform(-5, 5, n),
            rng.uniform(-5, 5, n),
            rng.uniform(0.5, 4, n),
            rng.uniform(0.5, 4, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=-1,
    ).astype(np.float32)
    b2 = np.stack(
        [
            rng.uniform(-5, 5, m),
            rng.uniform(-5, 5, m),
            rng.uniform(0.5, 4, m),
            rng.uniform(0.5, 4, m),
            rng.uniform(-np.pi, np.pi, m),
        ],
        axis=-1,
    ).astype(np.float32)
    got = np.asarray(rotated_iou_bev(jnp.asarray(b1), jnp.asarray(b2)))
    expect = np.array([[_np_rotated_iou(a, b) for b in b2] for a in b1])
    np.testing.assert_allclose(got, expect, atol=2e-3)


def test_corners_shape_and_ccw():
    b = jnp.array([[0.0, 0.0, 2.0, 4.0, 0.0]])
    c = np.asarray(rect_corners(b)[0])
    assert c.shape == (4, 2)
    # CCW: signed area positive
    x, y = c[:, 0], c[:, 1]
    signed = 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    assert signed > 0


def test_rotated_iou_3d():
    b1 = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b2 = jnp.array([[0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.0]])  # half z-overlap
    # inter = 4 * 1 = 4; union = 8 + 8 - 4 = 12
    np.testing.assert_allclose(
        np.asarray(rotated_iou_3d(b1, b2)), [[4.0 / 12.0]], atol=1e-5
    )


@pytest.mark.parametrize("n", [300])
def test_chunked_path_matches_direct(n):
    rng = np.random.RandomState(7)
    b = np.stack(
        [
            rng.uniform(-20, 20, n),
            rng.uniform(-20, 20, n),
            rng.uniform(0.5, 4, n),
            rng.uniform(0.5, 4, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=-1,
    ).astype(np.float32)
    bj = jnp.asarray(b)
    direct = np.asarray(rotated_iou_bev(bj, bj, row_chunk=1024))
    chunked = np.asarray(rotated_iou_bev(bj, bj, row_chunk=64))
    np.testing.assert_allclose(direct, chunked, atol=1e-5)


# ---------------------------------------------------------------------------
# Pallas Sutherland–Hodgman kernel (interpret mode on CPU) vs the XLA path
# and the native C++ golden
# ---------------------------------------------------------------------------

def test_pallas_kernel_matches_xla_and_golden():
    from minddet_tpu.ops.rotated_iou_pallas import (
        rotated_intersection_bev_pallas,
    )

    rng = np.random.RandomState(7)
    n, m = 37, 201  # deliberately unaligned to the (8, 128) tile
    b1 = np.stack([rng.uniform(-30, 30, n), rng.uniform(-30, 30, n),
                   rng.uniform(0.4, 5, n), rng.uniform(0.4, 7, n),
                   rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
    b2 = np.stack([rng.uniform(-30, 30, m), rng.uniform(-30, 30, m),
                   rng.uniform(0.4, 5, m), rng.uniform(0.4, 7, m),
                   rng.uniform(-np.pi, np.pi, m)], -1).astype(np.float32)
    ref = np.asarray(rotated_intersection_bev(jnp.asarray(b1), jnp.asarray(b2)))
    got = np.asarray(rotated_intersection_bev_pallas(
        jnp.asarray(b1), jnp.asarray(b2), interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4)

    from minddet_tpu.ops import host_ops

    if host_ops.available():
        golden = host_ops.rotated_iou_matrix(b1[:8], b2[:64])
        area1 = b1[:8, 2] * b1[:8, 3]
        area2 = b2[:64, 2] * b2[:64, 3]
        union = area1[:, None] + area2[None, :] - got[:8, :64]
        np.testing.assert_allclose(
            got[:8, :64] / np.maximum(union, 1e-8), golden, atol=1e-3
        )


def test_pallas_kernel_exact_cases():
    from minddet_tpu.ops.rotated_iou_pallas import (
        rotated_intersection_bev_pallas,
    )

    boxes = np.array([
        [0.0, 0.0, 2.0, 4.0, 0.0],
        [0.0, 0.0, 2.0, 4.0, np.pi / 2],   # same box rotated 90deg
        [10.0, 10.0, 2.0, 2.0, 0.3],       # disjoint
        [0.0, 0.0, 1.0, 1.0, 0.0],         # nested inside box 0
    ], np.float32)
    a = np.asarray(rotated_intersection_bev_pallas(
        jnp.asarray(boxes), jnp.asarray(boxes), interpret=True))
    np.testing.assert_allclose(np.diag(a), [8.0, 8.0, 4.0, 1.0], atol=1e-4)
    assert abs(a[0, 1] - 4.0) < 1e-4     # cross-shaped overlap = 2x2
    assert a[0, 2] == 0.0                # disjoint
    np.testing.assert_allclose(a[0, 3], 1.0, atol=1e-5)  # containment
