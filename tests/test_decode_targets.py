"""CenterNet decode + device-side target generation round-trip tests."""

import jax.numpy as jnp
import numpy as np

from minddet_tpu.ops.decode import (
    centernet_decode,
    gather_feature,
    heatmap_peaks,
    simple_topk,
    topk_heatmap,
)
from minddet_tpu.ops.targets import centernet_targets, gaussian_radius


def test_heatmap_peaks_keeps_only_local_maxima():
    hm = np.zeros((1, 8, 8, 1), np.float32)
    hm[0, 3, 3, 0] = 1.0
    hm[0, 3, 4, 0] = 0.8  # neighbor of the peak -> zeroed
    hm[0, 7, 0, 0] = 0.5  # isolated corner peak -> kept
    out = np.asarray(heatmap_peaks(jnp.asarray(hm)))
    assert out[0, 3, 3, 0] == 1.0
    assert out[0, 3, 4, 0] == 0.0
    assert out[0, 7, 0, 0] == 0.5


def test_topk_heatmap_finds_planted_peaks():
    hm = np.zeros((2, 16, 16, 3), np.float32)
    hm[0, 5, 7, 1] = 0.9
    hm[0, 10, 2, 0] = 0.7
    hm[1, 0, 0, 2] = 0.6
    scores, inds, classes, ys, xs = topk_heatmap(jnp.asarray(hm), k=4)
    scores, classes = np.asarray(scores), np.asarray(classes)
    ys, xs = np.asarray(ys), np.asarray(xs)
    assert scores[0, 0] == 0.9 and classes[0, 0] == 1
    assert (ys[0, 0], xs[0, 0]) == (5, 7)
    assert scores[0, 1] == 0.7 and classes[0, 1] == 0
    assert (ys[0, 1], xs[0, 1]) == (10, 2)
    assert scores[1, 0] == 0.6 and classes[1, 0] == 2


def test_simple_topk_agrees_with_two_stage_on_sparse_maps():
    rng = np.random.RandomState(0)
    hm = np.zeros((1, 32, 32, 5), np.float32)
    for _ in range(10):
        hm[0, rng.randint(32), rng.randint(32), rng.randint(5)] = rng.uniform(0.1, 1)
    s1, _, c1, y1, x1 = topk_heatmap(jnp.asarray(hm), k=5)
    s2, _, c2, y2, x2 = simple_topk(jnp.asarray(hm), k=5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_gather_feature():
    feat = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    inds = jnp.array([[0, 5], [15, 1]])
    out = np.asarray(gather_feature(jnp.asarray(feat), inds))
    np.testing.assert_allclose(out[0, 0], feat[0].reshape(16, 3)[0])
    np.testing.assert_allclose(out[0, 1], feat[0].reshape(16, 3)[5])
    np.testing.assert_allclose(out[1, 0], feat[1].reshape(16, 3)[15])


def test_target_decode_roundtrip():
    """Targets drawn on device must decode back to the input boxes."""
    h = w = 32
    num_classes = 4
    boxes = jnp.array(
        [[4.0, 6.0, 12.0, 18.0], [20.0, 20.0, 30.0, 28.0], [0.0, 0.0, 0.0, 0.0]]
    )
    classes = jnp.array([2, 0, 0])
    mask = jnp.array([True, True, False])
    t = centernet_targets(boxes, classes, mask, h, w, num_classes, 0.7)

    assert t["hm"].shape == (h, w, num_classes)
    np.testing.assert_allclose(float(jnp.max(t["hm"])), 1.0, atol=1e-6)

    outputs = {
        "hm": t["hm"][None],
        "wh": jnp.zeros((1, h, w, 2)).at[:].set(0.0),
        "reg": jnp.zeros((1, h, w, 2)),
    }
    # plant wh/reg at the object centers so decode can reconstruct
    ind = np.asarray(t["ind"])
    wh_map = np.zeros((1, h, w, 2), np.float32)
    reg_map = np.zeros((1, h, w, 2), np.float32)
    for o in range(2):
        y, x = divmod(int(ind[o]), w)
        wh_map[0, y, x] = np.asarray(t["wh"])[o]
        reg_map[0, y, x] = np.asarray(t["reg"])[o]
    outputs["wh"] = jnp.asarray(wh_map)
    outputs["reg"] = jnp.asarray(reg_map)

    det = np.asarray(centernet_decode(outputs, k=4))
    # top-2 detections must reproduce the two valid boxes
    got = {tuple(np.round(det[0, i, :4], 2)) for i in range(2)}
    expect = {(4.0, 6.0, 12.0, 18.0), (20.0, 20.0, 30.0, 28.0)}
    assert got == expect
    got_cls = {int(det[0, i, 5]) for i in range(2)}
    assert got_cls == {2, 0}


def test_gaussian_radius_positive_and_monotone():
    r_small = float(gaussian_radius((jnp.array(4.0), jnp.array(4.0))))
    r_big = float(gaussian_radius((jnp.array(40.0), jnp.array(40.0))))
    assert 0 < r_small < r_big


def test_invalid_objects_leave_heatmap_empty():
    t = centernet_targets(
        jnp.zeros((5, 4)), jnp.zeros(5, jnp.int32), jnp.zeros(5, bool), 16, 16, 3, 0.7
    )
    assert float(jnp.sum(t["hm"])) == 0.0
    assert float(jnp.sum(t["reg_mask"])) == 0.0
