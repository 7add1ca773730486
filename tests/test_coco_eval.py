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


# ---------------------------------------------------------------------------
# segm mode (mask AP) — the pycocotools iouType='segm' protocol
# ---------------------------------------------------------------------------

def _disk_mask(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


def test_segm_mode_perfect_masks():
    from minddet_tpu.data.coco_eval import COCOEvaluator

    ev = COCOEvaluator([0])
    gt = np.stack([_disk_mask(64, 64, 20, 20, 9), _disk_mask(64, 64, 45, 45, 12)])
    boxes = np.array([[11, 11, 29, 29], [33, 33, 57, 57]], np.float64)
    ev.add(0, boxes, np.array([0.9, 0.8]), boxes, dt_masks=gt, gt_masks=gt)
    stats = ev.summarize()
    assert abs(stats["AP"] - 1.0) < 1e-6


def test_segm_mode_uses_mask_iou_not_box_iou():
    from minddet_tpu.data.coco_eval import COCOEvaluator

    # same bounding box, disjoint masks: box IoU = 1 but mask IoU = 0
    gt_mask = np.zeros((1, 32, 32), bool)
    gt_mask[0, :, :16] = True           # left half
    dt_mask = np.zeros((1, 32, 32), bool)
    dt_mask[0, :, 16:] = True           # right half
    box = np.array([[0, 0, 32, 32]], np.float64)

    ev = COCOEvaluator([0])
    ev.add(0, box, np.array([0.9]), box, dt_masks=dt_mask, gt_masks=gt_mask)
    assert ev.summarize()["AP"] == 0.0

    ev2 = COCOEvaluator([0])  # bbox mode on the same boxes is perfect
    ev2.add(0, box, np.array([0.9]), box)
    assert abs(ev2.summarize()["AP"] - 1.0) < 1e-6


def test_segm_mode_area_ranges_from_masks():
    from minddet_tpu.data.coco_eval import COCOEvaluator

    # a small mask (area < 32^2) inside a huge box: must count as "small"
    mask = np.zeros((1, 200, 200), bool)
    mask[0, 50:60, 50:60] = True  # area 100
    box = np.array([[0, 0, 200, 200]], np.float64)
    ev = COCOEvaluator([0])
    ev.add(0, box, np.array([0.9]), box, dt_masks=mask, gt_masks=mask)
    stats = ev.summarize()
    assert abs(stats["AP_small"] - 1.0) < 1e-6
    assert stats["AP_large"] == -1.0  # no large GT -> undefined


# ---------------------------------------------------------------------------
# Analytic golden fixture: every number below is hand-derived from the COCO
# protocol definition (101-point right-max interpolation, score-ranked
# matching, maxDets truncation) — NOT from running this implementation.
# A protocol off-by-one (interpolation edge, maxDets handling) breaks these.
# ---------------------------------------------------------------------------

def test_analytic_golden_segm_crowd_area():
    """Hand-derived golden for the segm x crowd x area interaction:

    GT: G1 = 12x12 mask (area 144, "small"), G2 = 40x40 CROWD mask
    (area 1600, "medium"). DT: D1 covers exactly G1 (mask IoU 1.0, score .9);
    D2 = 20x20 mask fully inside the crowd G2 (score .8) — crowd IoU uses
    the DT area as denominator, so IoU(D2, G2) = 400/400 = 1.0 and D2 is
    IGNORED (not FP) at every threshold.

    AP_all: only G1 counts (crowd is ignored). Ranked dets after dropping
    the ignored D2: [TP]. recall 1, precision 1 at all 10 thresholds -> 1.0.
    AP_small: same (G1 small, D1 matched). AP_medium: only the crowd lives
    there -> no non-ignored GT -> undefined (-1).
    """
    from minddet_tpu.data.coco_eval import COCOEvaluator

    H = W = 100
    g1 = np.zeros((H, W), bool)
    g1[10:22, 10:22] = True
    g2 = np.zeros((H, W), bool)
    g2[50:90, 50:90] = True
    d1 = g1.copy()
    d2 = np.zeros((H, W), bool)
    d2[60:80, 60:80] = True

    gt_boxes = np.array([[10, 10, 22, 22], [50, 50, 90, 90]], np.float64)
    dt_boxes = np.array([[10, 10, 22, 22], [60, 60, 80, 80]], np.float64)
    ev = COCOEvaluator([0])
    ev.add(0, dt_boxes, np.array([0.9, 0.8]), gt_boxes,
           gt_iscrowd=np.array([False, True]),
           dt_masks=np.stack([d1, d2]), gt_masks=np.stack([g1, g2]))
    stats = ev.summarize()
    np.testing.assert_allclose(stats["AP"], 1.0, atol=1e-9)
    np.testing.assert_allclose(stats["AP_small"], 1.0, atol=1e-9)
    assert stats["AP_medium"] == -1.0
    np.testing.assert_allclose(stats["AR@100"], 1.0, atol=1e-9)
    # maxDets=1: only D1 (highest score) survives; it matches G1 -> AR@1 = 1
    np.testing.assert_allclose(stats["AR@1"], 1.0, atol=1e-9)


def test_analytic_golden_segm_partial_iou():
    """Segm golden with a fractional mask IoU crossing thresholds mid-sweep:
    D covers 75 of G's 100 pixels plus 0 extra -> IoU = 75/100 = 0.75
    exactly. With the protocol's min(thr, 1-1e-10) epsilon, the match holds
    for t in {.5,...,.75} (6 thresholds) and fails above.
    AP = (6*1 + 4*0)/10 = 0.6 (single GT, single TP det)."""
    from minddet_tpu.data.coco_eval import COCOEvaluator

    g = np.zeros((50, 50), bool)
    g[10:20, 10:20] = True          # 100 px
    d = np.zeros((50, 50), bool)
    d[10:20, 10:17] = True  # 10x7 = 70 px
    d[10:15, 17] = True     # +5 -> 75 px, all inside G
    box = np.array([[10, 10, 20, 20]], np.float64)
    ev = COCOEvaluator([0])
    ev.add(0, box, np.array([0.9]), box,
           dt_masks=d[None], gt_masks=g[None])
    stats = ev.summarize()
    np.testing.assert_allclose(stats["AP50"], 1.0, atol=1e-9)
    np.testing.assert_allclose(stats["AP75"], 1.0, atol=1e-9)
    np.testing.assert_allclose(stats["AP"], 0.6, atol=1e-9)


def test_analytic_golden_ap():
    from minddet_tpu.data.coco_eval import COCOEvaluator

    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float64)
    # D1: perfect match of G1 (IoU 1.0), D2: far FP, D3: inside G2 with
    # IoU = 82/100 = 0.82 (safely between the 0.80 and 0.85 thresholds)
    dt = np.array([[0, 0, 10, 10], [100, 100, 110, 110], [20, 20, 28.2, 30]])
    scores = np.array([0.9, 0.8, 0.7])
    ev = COCOEvaluator([0])
    ev.add(0, dt, scores, gt)
    stats = ev.summarize()

    # t <= 0.80 (7 thresholds): ranked [TP, FP, TP] ->
    #   recall [.5, .5, 1], precision [1, .5, 2/3], right-max [1, 2/3, 2/3]
    #   51 recall points <= 0.5 at precision 1; 50 points at 2/3
    ap_low = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    # t in {.85, .90, .95}: ranked [TP, FP, FP] -> 51 pts at 1, 50 at 0
    ap_high = 51 / 101
    np.testing.assert_allclose(stats["AP50"], ap_low, atol=1e-9)
    np.testing.assert_allclose(stats["AP75"], ap_low, atol=1e-9)
    np.testing.assert_allclose(stats["AP"], (7 * ap_low + 3 * ap_high) / 10,
                               atol=1e-9)
    # AR: final recall averaged over thresholds
    np.testing.assert_allclose(stats["AR@100"], (7 * 1.0 + 3 * 0.5) / 10,
                               atol=1e-9)
    np.testing.assert_allclose(stats["AR@10"], 0.85, atol=1e-9)
    # maxDets=1 keeps only D1 -> recall 0.5 at every threshold
    np.testing.assert_allclose(stats["AR@1"], 0.5, atol=1e-9)


def test_analytic_golden_maxdets_truncation():
    """maxDets truncation happens per image BEFORE matching (pycocotools
    evaluateImg: dt = dt[0:maxDet]): with 101 detections where the only
    true positive is ranked LAST by score, AR@100 must drop it while a
    101-det budget would have scored recall 1."""
    from minddet_tpu.data.coco_eval import COCOEvaluator

    gt = np.array([[0, 0, 10, 10.0]])
    # 100 far-away FPs scored above the one perfect TP
    fp = np.stack([
        np.linspace(100, 5050, 100), np.full(100, 100.0),
        np.linspace(100, 5050, 100) + 20, np.full(100, 120.0),
    ], axis=1)
    dt = np.vstack([fp, gt])
    scores = np.concatenate([np.linspace(0.9, 0.5, 100), [0.4]])
    ev = COCOEvaluator([0])
    ev.add(0, dt, scores, gt)
    stats = ev.summarize()
    # the TP is detection #101 -> truncated at every maxDets budget
    np.testing.assert_allclose(stats["AR@100"], 0.0, atol=1e-12)
    np.testing.assert_allclose(stats["AP"], 0.0, atol=1e-12)

    # same scene, TP ranked 100th -> kept by maxDets=100, cut by maxDets=10:
    # ranked [99 FPs..., TP, FP]; recall hits 1.0 only at rank 100 where
    # precision is 1/100 -> 101-pt AP = (one recall point above 0) * .01
    ev2 = COCOEvaluator([0])
    scores2 = np.concatenate([np.linspace(0.9, 0.5, 100), [0.55]])
    ev2.add(0, dt, scores2, gt)
    s2 = ev2.summarize()
    np.testing.assert_allclose(s2["AR@100"], 1.0, atol=1e-12)
    np.testing.assert_allclose(s2["AR@10"], 0.0, atol=1e-12)
    # right-max precision envelope: the single positive precision point sits
    # at recall 1.0 with p = 1/rank (rank = #FPs scored above the TP, plus
    # one), so every one of the 101 recall points interpolates to 1/rank
    rank = int(np.sum(scores2[:100] > 0.55)) + 1
    expect_ap = 101 * (1.0 / rank) / 101
    np.testing.assert_allclose(s2["AP"], expect_ap, atol=1e-12)
