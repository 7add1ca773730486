"""COCO evaluator sanity + protocol-behavior tests."""

import numpy as np

from minddet_tpu.data.coco_eval import COCOEvaluator


def _boxes(rng, n, span=400, size=60):
    xy = rng.uniform(0, span, (n, 2))
    wh = rng.uniform(20, size, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1)


def test_perfect_detections():
    rng = np.random.RandomState(0)
    ev = COCOEvaluator([1, 2])
    for _ in range(8):
        for c in (1, 2):
            gt = _boxes(rng, 5)
            ev.add(c, gt, rng.uniform(0.5, 1, 5), gt)
    stats = ev.summarize()
    assert stats["AP"] > 0.99
    assert stats["AP50"] > 0.99
    assert stats["AR@100"] > 0.99


def test_jittered_detections_degrade_gracefully():
    rng = np.random.RandomState(1)
    ev = COCOEvaluator([1])
    for _ in range(8):
        gt = _boxes(rng, 6)
        dt = gt + rng.uniform(-6, 6, gt.shape)  # mild jitter
        ev.add(1, dt, rng.uniform(0.5, 1, 6), gt)
    stats = ev.summarize()
    assert stats["AP50"] > 0.9  # jitter survives IoU 0.5
    assert stats["AP"] < stats["AP50"]  # but not the high thresholds


def test_false_positives_reduce_ap():
    rng = np.random.RandomState(2)
    ev = COCOEvaluator([1])
    for _ in range(8):
        gt = _boxes(rng, 4)
        fp = _boxes(rng, 4, span=2000) + 3000
        dt = np.vstack([gt, fp])
        scores = np.concatenate([rng.uniform(0.3, 0.6, 4), rng.uniform(0.8, 1.0, 4)])
        ev.add(1, dt, scores, gt)
    stats = ev.summarize()
    assert 0.2 < stats["AP"] < 0.8


def test_crowd_gt_not_fp():
    rng = np.random.RandomState(3)
    ev = COCOEvaluator([1])
    for _ in range(4):
        gt = _boxes(rng, 3)
        crowd_box = np.array([[1000, 1000, 1300, 1300.0]])
        all_gt = np.vstack([gt, crowd_box])
        iscrowd = np.array([False] * 3 + [True])
        # detection inside the crowd region must be ignored, not counted FP
        dt = np.vstack([gt, [[1050, 1050, 1200, 1200.0]]])
        ev.add(1, dt, np.array([0.9, 0.9, 0.9, 0.95]), all_gt, iscrowd)
    stats = ev.summarize()
    assert stats["AP"] > 0.99


def test_area_breakdown():
    rng = np.random.RandomState(4)
    ev = COCOEvaluator([1])
    for _ in range(6):
        small = np.array([[10, 10, 26, 26.0]])  # 16x16 = small
        large = np.array([[100, 100, 300, 300.0]])  # large
        gt = np.vstack([small, large])
        ev.add(1, gt, np.array([0.9, 0.9]), gt)
    stats = ev.summarize()
    assert stats["AP_small"] > 0.99
    assert stats["AP_large"] > 0.99
    assert stats["AP_medium"] == -1.0  # no medium GT -> excluded


def test_missing_class_excluded():
    ev = COCOEvaluator([1, 2])
    gt = np.array([[0, 0, 50, 50.0]])
    ev.add(1, gt, np.array([0.9]), gt)
    stats = ev.summarize()  # class 2 has no GT; must not drag AP to 0
    assert stats["AP"] > 0.99
