"""Native C++ host ops: correctness + cross-validation against device kernels."""

import jax.numpy as jnp
import numpy as np
import pytest

from minddet_tpu.ops import host_ops

pytestmark = pytest.mark.skipif(
    not host_ops.available(), reason="native host ops not built"
)


def _rand_rboxes(rng, n, span=30):
    return np.stack(
        [
            rng.uniform(-span, span, n), rng.uniform(-span, span, n),
            rng.uniform(0.5, 5, n), rng.uniform(0.5, 5, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=-1,
    ).astype(np.float32)


def test_native_matches_device_rotated_iou():
    """The C++ Sutherland-Hodgman and the XLA masked-candidate formulation are
    independent implementations — they must agree."""
    from minddet_tpu.ops.rotated_iou import rotated_iou_bev

    rng = np.random.RandomState(0)
    b1 = _rand_rboxes(rng, 40)
    b2 = _rand_rboxes(rng, 25)
    native = host_ops.rotated_iou_matrix(b1, b2)
    device = np.asarray(rotated_iou_bev(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(native, device, atol=2e-3)


def test_native_iou_criteria():
    big = np.array([[0, 0, 10, 10, 0.3]], np.float32)
    small = np.array([[0, 0, 2, 2, 0.9]], np.float32)
    np.testing.assert_allclose(
        host_ops.rotated_iou_matrix(big, small, criterion=1), [[1.0]], atol=1e-5
    )
    np.testing.assert_allclose(
        host_ops.rotated_iou_matrix(big, small, criterion=0), [[0.04]], atol=1e-5
    )


def test_native_rotated_nms_matches_device():
    from minddet_tpu.ops.nms import rotated_nms as device_nms

    rng = np.random.RandomState(1)
    boxes = _rand_rboxes(rng, 128)
    scores = rng.uniform(0, 1, 128).astype(np.float32)
    native_keep = set(host_ops.rotated_nms(boxes, scores, 0.2).tolist())
    idx, n = device_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.2)
    device_keep = set(int(i) for i in np.asarray(idx) if i >= 0)
    assert native_keep == device_keep


def test_native_nms2d_matches_device():
    from minddet_tpu.ops.nms import nms as device_nms

    rng = np.random.RandomState(2)
    xy = rng.uniform(0, 100, (96, 2))
    wh = rng.uniform(5, 30, (96, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.uniform(0, 1, 96).astype(np.float32)
    native_keep = set(host_ops.nms_2d(boxes, scores, 0.5).tolist())
    idx, n = device_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    device_keep = set(int(i) for i in np.asarray(idx) if i >= 0)
    assert native_keep == device_keep


def test_points_in_rboxes():
    boxes = np.array([[0, 0, 4, 2, 0], [10, 10, 2, 2, np.pi / 4]], np.float32)
    pts = np.array(
        [[0, 0], [1.9, 0.9], [2.1, 0], [10, 11.3], [10, 11.5]], np.float32
    )
    m = host_ops.points_in_rboxes(pts, boxes)
    assert m[0, 0] and m[1, 0] and not m[2, 0]
    # rotated box: diagonal half-extent sqrt(2) ~ 1.414
    assert m[3, 1] and not m[4, 1]
    assert not m[0, 1]
