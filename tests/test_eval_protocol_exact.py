"""Hand-derived goldens pinning the devkit/toolkit-exact protocol details
added in round 4 (VERDICT r3 items 2-3):

- nuScenes per-class max-range filtering of GT and detections,
- nuScenes TP errors as recall-binned cumulative means (not plain means),
- nuScenes calc_ap excluding the min-recall bin itself (prec[11:]),
- Waymo APH weighting the TP mass by heading accuracy in recall too,
- Waymo range breakdowns sharding GT and detections independently.

Every expected value is derived by hand in the comments; none is a
regression snapshot of the implementation.
"""

import numpy as np

from minddet_tpu.data.nuscenes_eval import (
    calc_ap,
    evaluate_nuscenes,
    filter_eval_boxes,
    N_RECALL_PTS,
)
from minddet_tpu.data.waymo_eval import evaluate_waymo


def _box9(x, y, yaw=0.0, dims=(2.0, 2.0, 2.0), v=(0.0, 0.0)):
    return [x, y, 0.0, dims[0], dims[1], dims[2], v[0], v[1], yaw]


# ---------------------------------------------------------------------------
# nuScenes
# ---------------------------------------------------------------------------


def test_nusc_class_range_drops_far_gt_and_dt():
    """A missed car GT at 55 m is outside class_range['car']=50 and must be
    filtered out: with it gone, the single in-range GT is perfectly detected
    so AP is exactly 1.0. Without range filtering the max recall would be
    0.5 and AP strictly below 1 (the pre-round-4 behavior)."""
    gts = [{"boxes": np.array([_box9(10, 0), _box9(55, 0)])}]
    dts = [{"boxes": np.array([_box9(10, 0)]), "scores": np.array([0.9])}]
    out = evaluate_nuscenes({"car": gts}, {"car": dts}, ["car"])
    assert abs(out["AP_car"] - 1.0) < 1e-12
    assert abs(out["mAP"] - 1.0) < 1e-12
    assert out["mATE"] == 0.0

    fg, fd = filter_eval_boxes(gts, dts, "car")
    assert len(fg[0]["boxes"]) == 1 and len(fd[0]["boxes"]) == 1
    # a far DETECTION is dropped too (it cannot become a false positive)
    dts_far = [{"boxes": np.array([_box9(10, 0), _box9(60, 0)]),
                "scores": np.array([0.9, 0.95])}]
    out2 = evaluate_nuscenes({"car": gts}, {"car": dts_far}, ["car"])
    assert abs(out2["AP_car"] - 1.0) < 1e-12


def test_nusc_range_filter_respects_ego_and_num_pts():
    # ego at (30, 0): a box at x=80 is 50 m away -> dropped (strict <)
    gts = [{"boxes": np.array([_box9(35, 0), _box9(80, 0)]),
            "ego": (30.0, 0.0)}]
    fg, _ = filter_eval_boxes(gts, [{"boxes": np.zeros((0, 9)),
                                     "scores": np.zeros(0)}], "car")
    assert len(fg[0]["boxes"]) == 1
    # GT boxes with zero lidar+radar points are dropped (devkit point filter)
    gts2 = [{"boxes": np.array([_box9(5, 0), _box9(6, 0)]),
             "num_pts": np.array([0, 7])}]
    fg2, _ = filter_eval_boxes(gts2, [{"boxes": np.zeros((0, 9)),
                                       "scores": np.zeros(0)}], "car")
    assert len(fg2[0]["boxes"]) == 1 and fg2[0]["boxes"][0, 0] == 6


def test_nusc_tp_error_is_recall_binned_cummean():
    """Two TPs with ATE 0.5 (score 0.9) and 1.5 (score 0.5) on 2 GTs.

    Per-TP cummean in score order = [0.5, 1.0]. On the 101-point grid:
    confidence is 0.9 for recall bins <= 0.50 and falls linearly to 0.5 at
    recall 1.0, so the interpolated ATE curve is 0.5 on bins 11..49 and
    exactly r on bins 50..100. calc_tp averages bins 11..100:
        (39 * 0.5 + sum_{r=0.50..1.00 step .01} r) / 90
      = (19.5 + 38.25) / 90 = 0.6416666...
    A plain mean over TPs (the pre-round-4 behavior) would give 1.0.
    """
    gts = [{"boxes": np.array([_box9(0, 0), _box9(20, 0)])}]
    dts = [{"boxes": np.array([_box9(0, 0.5), _box9(20, 1.5)]),
            "scores": np.array([0.9, 0.5])}]
    out = evaluate_nuscenes({"car": gts}, {"car": dts}, ["car"])
    assert abs(out["mATE"] - 57.75 / 90.0) < 1e-12
    assert out["mASE"] == 0.0 and out["mAOE"] == 0.0 and out["mAVE"] == 0.0
    # no attributes anywhere -> devkit all-NaN cummean -> worst case 1.0
    assert out["mAAE"] == 1.0


def test_nusc_calc_ap_excludes_min_recall_bin():
    """Precision 1.0 up to and including the recall=0.10 bin, 0 after:
    the devkit averages prec[11:], so AP is exactly 0."""
    md = {"precision": np.concatenate(
        [np.ones(11), np.zeros(N_RECALL_PTS - 11)])}
    assert calc_ap(md) == 0.0
    # and a curve that is 1.0 through bin 11 contributes exactly 1/90
    md2 = {"precision": np.concatenate(
        [np.ones(12), np.zeros(N_RECALL_PTS - 12)])}
    assert abs(calc_ap(md2) - (1.0 / 90.0)) < 1e-12


def test_nusc_nds_uses_raw_aoe():
    """NDS clips 1 - mTP at zero without dividing AOE by pi (devkit
    DetectionMetrics.tp_scores): a constant orientation error of 2.0 rad
    (> 1) must zero the AOE term, not contribute 1 - 2/pi."""
    gts = [{"boxes": np.array([_box9(0, 0), _box9(20, 0)])}]
    dts = [{"boxes": np.array([_box9(0, 0, yaw=2.0), _box9(20, 0, yaw=2.0)]),
            "scores": np.array([0.9, 0.5])}]
    out = evaluate_nuscenes({"car": gts}, {"car": dts}, ["car"])
    assert abs(out["mAOE"] - 2.0) < 1e-9
    # terms: mAP=1, ATE=1, ASE=1, AOE=max(0,1-2)=0, AVE=1, AAE=max(0,1-1)=0
    assert abs(out["NDS"] - (5.0 * 1.0 + 1 + 1 + 0 + 1 + 0) / 10.0) < 1e-9


# ---------------------------------------------------------------------------
# Waymo
# ---------------------------------------------------------------------------


def _wbox(x, y, yaw=0.0):
    # square footprint: a pi/2 heading error keeps the BEV IoU at 1.0 so
    # the APH goldens can isolate the heading weighting from the matching
    return [x, y, 0.0, 4.5, 4.5, 1.7, yaw]


def test_waymo_aph_weights_recall_golden():
    """Two GTs, two TPs: d1 exact heading (h=1, score 0.9), d2 off by pi/2
    (h=0.5, score 0.5). Weighted TP mass = [1.0, 1.5] so
    recall = [0.5, 0.75], precision = [1.0, 0.75]. Interpolated precision:
    1.0 on bins 0..50, 1.0-(r-0.5) on bins 51..75, 0 after. APH =
    (51 + sum_{r=.51...75}(1.5-r)) / 101 = (51 + 21.75) / 101 = 72.0297...
    Leaving recall unweighted (pre-round-4) gives 93.69 instead."""
    gts = [{"boxes": np.array([_wbox(0, 0), _wbox(20, 0)]),
            "classes": np.ones(2, np.int32)}]
    dts = [{"boxes": np.array([_wbox(0, 0), _wbox(20, 0, yaw=np.pi / 2)]),
            "classes": np.ones(2, np.int32),
            "scores": np.array([0.9, 0.5])}]
    out = evaluate_waymo(gts, dts, classes=("Vehicle",))["Vehicle"]
    assert abs(out["AP_L1"] - 100.0) < 1e-9
    assert abs(out["APH_L1"] - 100.0 * 72.75 / 101.0) < 1e-9


def test_waymo_range_breakdowns_shard_independently():
    """GT at 10 m (detected) and 40 m (missed): the near shard scores 100,
    the mid shard 0, the far shard has no GT, and the overall AP reflects
    the pooled 50% recall."""
    gts = [{"boxes": np.array([_wbox(10, 0), _wbox(40, 0)]),
            "classes": np.ones(2, np.int32)}]
    dts = [{"boxes": np.array([_wbox(10, 0)]),
            "classes": np.ones(1, np.int32),
            "scores": np.array([0.9])}]
    out = evaluate_waymo(gts, dts, classes=("Vehicle",),
                         range_breakdowns=True)["Vehicle"]
    assert abs(out["AP_L1_[0,30)"] - 100.0) < 1e-9
    assert out["AP_L1_[30,50)"] == 0.0
    assert out["AP_L1_[50,inf)"] == 0.0
    assert 0.0 < out["AP_L1"] < 100.0
    # a far detection is confined to its own shard: it becomes an FP in
    # [30,50) but cannot pollute [0,30)
    dts2 = [{"boxes": np.array([_wbox(10, 0), _wbox(43, 0)]),
             "classes": np.ones(2, np.int32),
             "scores": np.array([0.9, 0.8])}]
    out2 = evaluate_waymo(gts, dts2, classes=("Vehicle",),
                          range_breakdowns=True)["Vehicle"]
    assert abs(out2["AP_L1_[0,30)"] - 100.0) < 1e-9
