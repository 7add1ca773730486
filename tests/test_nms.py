"""NMS suite vs. an independent numpy greedy reference."""

import jax.numpy as jnp
import numpy as np

from minddet_tpu.ops.nms import batched_nms, circle_nms, nms, rotated_nms, soft_nms


def _np_greedy_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        iou = inter / np.maximum(a + ai - inter, 1e-8)
        suppressed |= iou > thresh
    return keep  # in selection (descending score) order


def _rand_boxes(rng, n, span=100, size=30):
    xy = rng.uniform(0, span, size=(n, 2))
    wh = rng.uniform(5, size, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_nms_matches_numpy_greedy():
    rng = np.random.RandomState(0)
    for trial in range(5):
        boxes = _rand_boxes(rng, 64)
        scores = rng.uniform(0.01, 1, 64).astype(np.float32)
        idx, n_keep = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
        got = sorted(int(i) for i in np.asarray(idx) if i >= 0)
        expect = sorted(_np_greedy_nms(boxes, scores, 0.5))
        assert got == expect, f"trial {trial}"
        assert int(n_keep) == len(expect)


def test_nms_keeps_best_of_overlapping_pair():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    idx, n = nms(boxes, scores, 0.5)
    kept = set(int(i) for i in np.asarray(idx) if i >= 0)
    assert kept == {0, 2}
    assert int(n) == 2


def test_batched_nms_classes_dont_suppress():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    # same class: one suppressed
    _, n_same = batched_nms(boxes, scores, jnp.array([0, 0]), 0.5)
    # different class: both kept
    _, n_diff = batched_nms(boxes, scores, jnp.array([0, 1]), 0.5)
    assert int(n_same) == 1 and int(n_diff) == 2


def test_soft_nms_decays_overlaps():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    new_scores, order = soft_nms(boxes, scores, sigma=0.5)
    new_scores = np.asarray(new_scores)
    assert new_scores[0] == 0.9  # best box untouched
    assert 0 < new_scores[1] < 0.8  # overlapping box decayed, not removed
    assert new_scores[2] == 0.7  # disjoint box untouched
    assert set(int(i) for i in np.asarray(order)) == {0, 1, 2}


def test_soft_nms_threshold_zeroes():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.array([0.9, 0.0005])
    new_scores, _ = soft_nms(boxes, scores, score_threshold=0.001)
    assert np.asarray(new_scores)[1] == 0.0


def test_rotated_nms_suppresses_same_pose():
    boxes = jnp.array(
        [
            [0.0, 0.0, 4.0, 2.0, 0.3],
            [0.1, 0.0, 4.0, 2.0, 0.3],  # nearly identical -> suppressed
            [20.0, 20.0, 4.0, 2.0, 1.0],
        ]
    )
    scores = jnp.array([0.9, 0.8, 0.5])
    idx, n = rotated_nms(boxes, scores, iou_threshold=0.5)
    kept = set(int(i) for i in np.asarray(idx) if i >= 0)
    assert kept == {0, 2}
    assert int(n) == 2


def test_circle_nms():
    centers = jnp.array([[0.0, 0.0], [0.5, 0.0], [10.0, 0.0]])
    scores = jnp.array([0.9, 0.8, 0.7])
    idx, n = circle_nms(centers, scores, radius=1.0)
    kept = set(int(i) for i in np.asarray(idx) if i >= 0)
    assert kept == {0, 2}


def test_nms_score_threshold():
    boxes = jnp.array([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.array([0.9, 0.05])
    idx, n = nms(boxes, scores, 0.5, score_threshold=0.1)
    assert int(n) == 1


def test_nms_jit_and_large():
    import jax

    rng = np.random.RandomState(3)
    boxes = _rand_boxes(rng, 512, span=400)
    scores = rng.uniform(0, 1, 512).astype(np.float32)
    jitted = jax.jit(lambda b, s: nms(b, s, 0.5, max_outputs=100))
    idx, n = jitted(jnp.asarray(boxes), jnp.asarray(scores))
    got = sorted(int(i) for i in np.asarray(idx) if i >= 0)
    expect = _np_greedy_nms(boxes, scores, 0.5)[:100]
    assert got == sorted(expect)
