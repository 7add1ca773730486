"""Golden tests for box geometry vs. independent numpy references."""

import jax.numpy as jnp
import numpy as np
import pytest

from minddet_tpu.ops import box


def _np_iou(b1, b2):
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    return inter / np.maximum(a1[:, None] + a2[None, :] - inter, 1e-8)


def test_pairwise_iou_matches_numpy():
    rng = np.random.RandomState(0)
    xy = rng.uniform(0, 100, size=(20, 2))
    wh = rng.uniform(1, 50, size=(20, 2))
    b1 = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    xy = rng.uniform(0, 100, size=(30, 2))
    wh = rng.uniform(1, 50, size=(30, 2))
    b2 = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    got = np.asarray(box.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, _np_iou(b1, b2), rtol=1e-5, atol=1e-6)


def test_iou_identity_is_one():
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 7.0, 9.0]])
    iou = box.pairwise_iou(b, b)
    np.testing.assert_allclose(np.diag(np.asarray(iou)), [1.0, 1.0], atol=1e-6)


def test_cxcywh_roundtrip():
    rng = np.random.RandomState(1)
    b = rng.uniform(0, 100, size=(15, 4)).astype(np.float32)
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:])  # valid xyxy
    out = box.cxcywh_to_xyxy(box.xyxy_to_cxcywh(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(out), b, rtol=1e-5, atol=1e-4)


def test_rotation_2d_quarter_turn():
    pts = jnp.array([[[1.0, 0.0], [0.0, 1.0]]])
    out = box.rotation_2d(pts, jnp.array([np.pi / 2]))
    np.testing.assert_allclose(
        np.asarray(out[0]), [[0.0, 1.0], [-1.0, 0.0]], atol=1e-6
    )


def test_second_box_encode_decode_roundtrip():
    rng = np.random.RandomState(2)
    anchors = np.stack(
        [
            rng.uniform(-10, 10, 50),
            rng.uniform(-10, 10, 50),
            rng.uniform(-3, 1, 50),
            rng.uniform(0.5, 3, 50),
            rng.uniform(0.5, 5, 50),
            rng.uniform(0.5, 3, 50),
            rng.uniform(-np.pi, np.pi, 50),
        ],
        axis=-1,
    ).astype(np.float32)
    gt = anchors + rng.uniform(-0.2, 0.2, anchors.shape).astype(np.float32)
    gt[:, 3:6] = np.abs(gt[:, 3:6]) + 0.2
    enc = box.second_box_encode(jnp.asarray(gt), jnp.asarray(anchors))
    dec = box.second_box_decode(enc, jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(dec), gt, rtol=1e-4, atol=1e-4)


def test_second_box_encode_decode_smooth_dim_roundtrip():
    anchors = jnp.array([[0.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.0]])
    gt = jnp.array([[1.0, -2.0, -0.5, 1.8, 4.2, 1.7, 0.3]])
    enc = box.second_box_encode(gt, anchors, smooth_dim=True)
    dec = box.second_box_decode(enc, anchors, smooth_dim=True)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gt), rtol=1e-5, atol=1e-5)


def test_center_to_corner_box2d_axis_aligned():
    corners = box.center_to_corner_box2d(
        jnp.array([[5.0, 5.0]]), jnp.array([[2.0, 4.0]]), jnp.array([0.0])
    )
    got = np.sort(np.asarray(corners[0]), axis=0)
    expect = np.sort(
        np.array([[4.0, 3.0], [4.0, 7.0], [6.0, 7.0], [6.0, 3.0]]), axis=0
    )
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_rbbox_to_near_bbox_swaps_at_90deg():
    r = jnp.array(
        [[0.0, 0.0, 2.0, 6.0, 0.0], [0.0, 0.0, 2.0, 6.0, np.pi / 2]]
    )
    out = np.asarray(box.rbbox_to_near_bbox(r))
    np.testing.assert_allclose(out[0], [-1.0, -3.0, 1.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [-3.0, -1.0, 3.0, 1.0], atol=1e-6)


def test_limit_period():
    v = jnp.array([0.0, np.pi, -np.pi, 3 * np.pi / 2])
    out = np.asarray(box.limit_period(v, 0.5, np.pi))
    assert np.all(out >= -np.pi / 2 - 1e-6) and np.all(out < np.pi / 2 + 1e-6)
    np.testing.assert_allclose(out[0], 0.0, atol=1e-6)


@pytest.mark.parametrize("angle", [0.0, 0.3, np.pi / 3])
def test_corner_box3d_volume_preserved(angle):
    c = box.center_to_corner_box3d(
        jnp.array([[0.0, 0.0, 0.0]]),
        jnp.array([[2.0, 3.0, 4.0]]),
        jnp.array([angle]),
    )
    c = np.asarray(c[0])
    # axis-aligned bounding extent of z never changes under z-rotation
    assert c[:, 2].max() - c[:, 2].min() == pytest.approx(4.0)
    # all corners at distance sqrt((w/2)^2+(l/2)^2+... from center pairs
    assert c.shape == (8, 3)
