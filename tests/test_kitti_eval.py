"""KITTI evaluator sanity: perfect detections -> AP 100, misses -> lower."""

import numpy as np

from minddet_tpu.data.kitti_eval import (
    clean_gt,
    eval_class,
    get_official_eval_result,
)


def _make_anno(boxes, names, locs=None, dims=None, rots=None, scores=None,
               occluded=None, truncated=None, alpha=None):
    n = len(names)
    anno = {
        "name": np.asarray(names),
        "bbox": np.asarray(boxes, np.float32).reshape(n, 4),
        "occluded": np.asarray(occluded if occluded is not None else [0] * n),
        "truncated": np.asarray(truncated if truncated is not None else [0.0] * n),
        "location": np.asarray(locs if locs is not None else np.zeros((n, 3)), np.float32),
        "dimensions": np.asarray(dims if dims is not None else np.ones((n, 3)), np.float32),
        "rotation_y": np.asarray(rots if rots is not None else np.zeros(n), np.float32),
        "alpha": np.asarray(alpha if alpha is not None else np.zeros(n), np.float32),
    }
    if scores is not None:
        anno["score"] = np.asarray(scores, np.float32)
    return anno


def _scene(n_img=20, cls="Car"):
    # >= 41 GT boxes so the 41-point protocol can fill its recall samples
    gt, dt = [], []
    rng = np.random.RandomState(0)
    for i in range(n_img):
        boxes = []
        locs, dims, rots = [], [], []
        for k in range(3):
            x1, y1 = rng.uniform(0, 800), rng.uniform(0, 200)
            boxes.append([x1, y1, x1 + 80, y1 + 60])  # tall enough for easy
            locs.append([rng.uniform(-20, 20), 1.5, rng.uniform(5, 60)])
            dims.append([3.9, 1.56, 1.6])
            rots.append(rng.uniform(-np.pi, np.pi))
        gt.append(_make_anno(boxes, [cls] * 3, locs, dims, rots))
        dt.append(
            _make_anno(
                boxes, [cls] * 3, locs, dims, rots,
                scores=rng.uniform(0.5, 1.0, 3),
            )
        )
    return gt, dt


def test_perfect_detections_ap_100():
    gt, dt = _scene()
    for metric in ("bbox", "bev", "3d"):
        r = eval_class(gt, dt, "Car", 0, metric, 0.7)
        assert r["ap"] > 99.0, (metric, r["ap"])


def test_missed_detection_lowers_ap():
    gt, dt = _scene()
    # drop all detections in half the images -> max recall 0.5 -> AP ~55
    for i in range(10):
        dt[i] = _make_anno(np.zeros((0, 4)), [], scores=[])
    r = eval_class(gt, dt, "Car", 0, "bbox", 0.7)
    assert 30.0 < r["ap"] < 70.0


def test_false_positives_lower_precision():
    gt, dt = _scene()
    # add a far-away high-scoring FP to every image
    for i in range(len(dt)):
        fp_box = [900.0, 300.0, 980.0, 360.0]
        dt[i] = _make_anno(
            np.vstack([dt[i]["bbox"], fp_box]),
            list(dt[i]["name"]) + ["Car"],
            np.vstack([dt[i]["location"], [[50, 1.5, 70]]]),
            np.vstack([dt[i]["dimensions"], [[3.9, 1.56, 1.6]]]),
            np.concatenate([dt[i]["rotation_y"], [0.0]]),
            scores=np.concatenate([dt[i]["score"], [0.99]]),
        )
    r = eval_class(gt, dt, "Car", 0, "bbox", 0.7)
    assert r["ap"] < 99.0


def test_similar_class_ignored_not_fp():
    gt, dt = _scene()
    # GT contains a Van; a matching detection labeled Car must not be FP
    van_box = [100.0, 50.0, 200.0, 130.0]
    gt[0] = _make_anno(
        np.vstack([gt[0]["bbox"], van_box]),
        list(gt[0]["name"]) + ["Van"],
        np.vstack([gt[0]["location"], [[0, 1.5, 30]]]),
        np.vstack([gt[0]["dimensions"], [[4.5, 2.0, 1.9]]]),
        np.concatenate([gt[0]["rotation_y"], [0.0]]),
    )
    r = eval_class(gt, dt, "Car", 0, "bbox", 0.7)
    assert r["ap"] > 99.0


def test_difficulty_filtering():
    # a 30px-tall GT box is excluded from easy (min 40px) but counted moderate
    box = [100, 100, 160, 130]
    gt = [_make_anno([box], ["Car"])]
    ignored, _, nvalid_easy = clean_gt(gt[0], "Car", 0)
    assert nvalid_easy == 0 and ignored[0] == 1
    _, _, nvalid_mod = clean_gt(gt[0], "Car", 1)
    assert nvalid_mod == 1


def test_official_result_table():
    gt, dt = _scene()
    table = get_official_eval_result(gt, dt, classes=("Car",), compute_aos=True)
    assert set(table["Car"].keys()) == {"bbox", "bev", "3d", "aos"}
    assert all(len(v) == 3 for v in table["Car"].values())
    assert table["Car"]["bbox"][0] > 99.0
    assert table["Car"]["aos"][0] > 99.0


# ---------------------------------------------------------------------------
# Analytic golden fixtures for the 41-point protocol: values hand-derived
# from the official algorithm (score->threshold selection advancing the
# recall cursor by 1/40, right-max interpolation over 41 slots, 11-sample
# [0::4] average), not from this implementation.
# ---------------------------------------------------------------------------

def _easy_gt(x=10.0):
    return {
        "name": np.array(["Car"]),
        "bbox": np.array([[0.0, 0.0, 60.0, 60.0]], np.float32),  # h=60 > 40
        "alpha": np.zeros(1, np.float32),
        "occluded": np.zeros(1, np.int64),
        "truncated": np.zeros(1, np.float32),
        "location": np.array([[x, 1.5, 20.0]], np.float32),
        "dimensions": np.array([[4.0, 1.5, 1.8]], np.float32),
        "rotation_y": np.zeros(1, np.float32),
    }


def _dt_from_gt(gt, score):
    dt = {k: np.copy(v) for k, v in gt.items()}
    dt["score"] = np.array([score], np.float32)
    return dt


def _empty_dt():
    return {
        "name": np.zeros(0, dtype="U16"),
        "bbox": np.zeros((0, 4), np.float32),
        "alpha": np.zeros(0, np.float32),
        "occluded": np.zeros(0, np.int64),
        "truncated": np.zeros(0, np.float32),
        "location": np.zeros((0, 3), np.float32),
        "dimensions": np.zeros((0, 3), np.float32),
        "rotation_y": np.zeros(0, np.float32),
        "score": np.zeros(0, np.float32),
    }


def test_analytic_golden_perfect_41():
    """41 GTs, 41 perfect distinct-score detections: every one of the 41
    recall slots is filled at precision 1 -> AP exactly 100."""
    gts = [_easy_gt(float(5 + i)) for i in range(41)]
    dts = [_dt_from_gt(g, 1.0 - 0.01 * i) for i, g in enumerate(gts)]
    out = get_official_eval_result(gts, dts, classes=("Car",),
                                   metrics=("bbox",))
    np.testing.assert_allclose(out["Car"]["bbox"], [100.0] * 3, atol=1e-6)


def test_analytic_golden_partial_recall():
    """41 GTs, the top-20 detected perfectly: recall steps (1/41) lag the
    cursor steps (1/40) too little to skip any threshold within 20, so slots
    0..19 hold precision 1 and the rest 0 -> AP = 5/11 * 100 (slots
    0,4,8,12,16 of the 11-point [0::4] sample are 1)."""
    gts = [_easy_gt(float(5 + i)) for i in range(41)]
    dts = []
    for i, g in enumerate(gts):
        dts.append(_dt_from_gt(g, 1.0 - 0.01 * i) if i < 20 else _empty_dt())
    out = get_official_eval_result(gts, dts, classes=("Car",),
                                   metrics=("bbox",))
    np.testing.assert_allclose(out["Car"]["bbox"], [500.0 / 11] * 3,
                               atol=1e-6)
