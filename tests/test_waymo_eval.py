"""Waymo L1/L2 AP/APH protocol behavior on constructed scenes."""

import numpy as np

from minddet_tpu.data.waymo_eval import evaluate_waymo


def _boxes(n, rng, spread=40.0):
    return np.concatenate(
        [rng.uniform(-spread, spread, (n, 2)), rng.uniform(-1, 0, (n, 1)),
         np.tile([1.9, 4.5, 1.7], (n, 1)), rng.uniform(-np.pi, np.pi, (n, 1))],
        -1,
    )


def test_perfect_detections_score_100():
    rng = np.random.RandomState(0)
    gts, dts = [], []
    for _ in range(3):
        b = _boxes(5, rng)
        gts.append({"boxes": b, "classes": np.ones(5, np.int32),
                    "num_points": np.full(5, 50)})
        dts.append({"boxes": b, "classes": np.ones(5, np.int32),
                    "scores": rng.uniform(0.5, 1, 5)})
    out = evaluate_waymo(gts, dts, classes=("Vehicle",))
    for k in ("AP_L1", "APH_L1", "AP_L2", "APH_L2"):
        assert abs(out["Vehicle"][k] - 100.0) < 1e-6, (k, out)


def test_aph_penalizes_flipped_heading():
    rng = np.random.RandomState(1)
    b = _boxes(6, rng)
    flipped = b.copy()
    flipped[:, 6] += np.pi  # same footprint, opposite heading
    gts = [{"boxes": b, "classes": np.ones(6, np.int32)}]
    dts = [{"boxes": flipped, "classes": np.ones(6, np.int32),
            "scores": np.ones(6)}]
    out = evaluate_waymo(gts, dts, classes=("Vehicle",))["Vehicle"]
    assert abs(out["AP_L1"] - 100.0) < 1e-6      # IoU match is perfect
    assert out["APH_L1"] < 1.0                   # heading weight ~0


def test_l2_ground_truths_ignored_at_l1():
    rng = np.random.RandomState(2)
    easy = _boxes(4, rng)
    hard = _boxes(4, rng) + [200, 200, 0, 0, 0, 0, 0]  # disjoint region
    boxes = np.concatenate([easy, hard])
    npts = np.array([50] * 4 + [2] * 4)  # hard: <=5 points -> LEVEL_2
    gts = [{"boxes": boxes, "classes": np.ones(8, np.int32),
            "num_points": npts}]
    # detector only finds the easy ones
    dts = [{"boxes": easy, "classes": np.ones(4, np.int32),
            "scores": np.ones(4)}]
    out = evaluate_waymo(gts, dts, classes=("Vehicle",))["Vehicle"]
    assert abs(out["AP_L1"] - 100.0) < 1e-6      # L2 gts not FN at L1
    assert out["AP_L2"] < 60.0                   # but they count at L2
    # a detection matching an L2 gt is neutral at L1, not a false positive
    dts2 = [{"boxes": boxes, "classes": np.ones(8, np.int32),
             "scores": np.ones(8)}]
    out2 = evaluate_waymo(gts, dts2, classes=("Vehicle",))["Vehicle"]
    assert abs(out2["AP_L1"] - 100.0) < 1e-6
    assert abs(out2["AP_L2"] - 100.0) < 1e-6


def test_cross_class_detections_dont_leak():
    rng = np.random.RandomState(3)
    b = _boxes(3, rng)
    gts = [{"boxes": b, "classes": np.array(["Vehicle"] * 3)}]
    dts = [{"boxes": b, "classes": np.array(["Pedestrian"] * 3),
            "scores": np.ones(3)}]
    out = evaluate_waymo(gts, dts, classes=("Vehicle", "Pedestrian"))
    assert out["Vehicle"]["AP_L2"] == 0.0
    assert out["Pedestrian"]["AP_L2"] == 0.0  # no ped gt -> AP 0
