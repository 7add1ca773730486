"""Greedy tracker + nuScenes tracking metrics (AMOTA/AMOTP) goldens.

The reference README quotes CenterPoint's AMOTA
(``minddet/models/centerpoint/README.md:13``) but ships neither a tracker
nor a tracking evaluator; these pin our clean-room implementations with
hand-derived values.
"""

import numpy as np

from minddet_tpu.data.nuscenes_track_eval import evaluate_tracking
from minddet_tpu.track import GreedyTracker, track_sequence

CLASSES = ("car", "pedestrian")


def _frame(centers, classes, scores=None, ids=None, ego=True):
    centers = np.asarray(centers, np.float64).reshape(-1, 2)
    fr = {"centers": centers,
          "classes": np.asarray(classes, np.int64)}
    if ego:  # goldens place everything near the origin-ego
        fr["ego"] = np.zeros(2)
    if scores is not None:
        fr["scores"] = np.asarray(scores, np.float64)
    if ids is not None:
        fr["ids"] = np.asarray(ids, np.int64)
    return fr


# ---------------------------------------------------------------------------
# tracker
# ---------------------------------------------------------------------------

def test_tracker_constant_velocity_ids_stable():
    tr = GreedyTracker(class_names=CLASSES)
    ids = []
    for t in range(5):
        # car moving +10 m/s in x, pedestrian stationary; dt = 0.5 s
        centers = np.array([[5.0 * t, 0.0], [0.0, 20.0]])
        vels = np.array([[10.0, 0.0], [0.0, 0.0]])
        ids.append(tr.step(centers, vels, [0, 1], [0.9, 0.8],
                           0.0 if t == 0 else 0.5))
    ids = np.stack(ids)
    assert (ids[:, 0] == ids[0, 0]).all()
    assert (ids[:, 1] == ids[0, 1]).all()
    assert ids[0, 0] != ids[0, 1]


def test_tracker_crossing_same_class_resolved_by_velocity():
    # two cars crossing head-on; velocity projection keeps identities even
    # when raw nearest-center would swap at the crossing point
    tr = GreedyTracker(class_names=CLASSES)
    out = []
    for t in range(5):
        a = [2.0 * t, 0.0]          # +4 m/s, dt 0.5
        b = [8.0 - 2.0 * t, 0.0]    # -4 m/s
        out.append(tr.step(np.array([a, b]),
                           np.array([[4.0, 0.0], [-4.0, 0.0]]),
                           [0, 0], [0.9, 0.9], 0.0 if t == 0 else 0.5))
    out = np.stack(out)
    assert (out[:, 0] == out[0, 0]).all() and (out[:, 1] == out[0, 1]).all()


def test_tracker_occlusion_within_max_age_keeps_id():
    tr = GreedyTracker(class_names=CLASSES, max_age=3)
    i0 = tr.step(np.array([[0.0, 0.0]]), np.zeros((1, 2)), [0], [0.9], 0.0)[0]
    # two empty frames (object occluded), then it reappears
    for _ in range(2):
        tr.step(np.zeros((0, 2)), np.zeros((0, 2)), [], [], 0.5)
    i1 = tr.step(np.array([[0.0, 0.0]]), np.zeros((1, 2)), [0], [0.9], 0.5)[0]
    assert i1 == i0


def test_tracker_max_age_expiry_spawns_new_id():
    tr = GreedyTracker(class_names=CLASSES, max_age=2)
    i0 = tr.step(np.array([[0.0, 0.0]]), np.zeros((1, 2)), [0], [0.9], 0.0)[0]
    for _ in range(3):  # > max_age unmatched frames
        tr.step(np.zeros((0, 2)), np.zeros((0, 2)), [], [], 0.5)
    i1 = tr.step(np.array([[0.0, 0.0]]), np.zeros((1, 2)), [0], [0.9], 0.5)[0]
    assert i1 != i0


def test_tracker_class_gating():
    tr = GreedyTracker(class_names=CLASSES)
    i0 = tr.step(np.array([[0.0, 0.0]]), np.zeros((1, 2)), [0], [0.9], 0.0)[0]
    i1 = tr.step(np.array([[0.0, 0.0]]), np.zeros((1, 2)), [1], [0.9], 0.5)[0]
    assert i1 != i0  # same spot, different class -> new track


def test_track_sequence_wrapper():
    frames = [
        {"centers": np.array([[0.0, 0.0]]), "velocities": np.array([[2.0, 0.0]]),
         "classes": np.array([0]), "scores": np.array([0.9]),
         "timestamp": 0.5 * t}
        for t in range(4)
    ]
    for t, fr in enumerate(frames):
        fr["centers"] = np.array([[1.0 * t, 0.0]])
    ids = track_sequence(frames, class_names=CLASSES)
    assert all(int(i[0]) == int(ids[0][0]) for i in ids)


# ---------------------------------------------------------------------------
# AMOTA / AMOTP goldens (hand-derived)
# ---------------------------------------------------------------------------

def test_amota_perfect_track():
    gt, dt = [], []
    for t in range(4):
        gt.append(_frame([[float(t), 0.0]], [0], ids=[0]))
        dt.append(_frame([[float(t), 0.0]], [0], scores=[1.0], ids=[5]))
    m = evaluate_tracking([gt], [dt], class_names=CLASSES)
    assert m["AMOTA"] == 1.0
    assert m["AMOTP"] == 0.0
    assert m["MOTA"] == 1.0
    assert m["IDS"] == 0


def test_amota_id_switch_golden():
    # one GT over 4 frames; hypothesis id changes once after frame 1:
    # every threshold pass matches all 4 with 1 switch ->
    # MOTAR = 1 - 1/4 = 0.75 at every recall level
    gt, dt = [], []
    for t in range(4):
        gt.append(_frame([[0.0, 0.0]], [0], ids=[0]))
        dt.append(_frame([[0.0, 0.0]], [0], scores=[1.0],
                         ids=[10 if t < 2 else 11]))
    m = evaluate_tracking([gt], [dt], class_names=CLASSES)
    assert np.isclose(m["AMOTA"], 0.75)
    assert m["IDS"] == 1
    assert np.isclose(m["MOTA"], 0.75)


def test_amota_recall_sweep_golden():
    # 2 GT frames; frame 0 detected (score .9), frame 1 only a far FP (.8).
    # Levels with recall <= .5 (18 of the 40 in linspace(.1, 1, 40)) use
    # threshold .9: the FP falls below it -> FP=0, FN=1, rec=.5,
    # MOTAR = 1 - (1 - .5*2)/(.5*2) = 1, MOTP = 0. The other 22 levels are
    # unachievable -> MOTAR 0, MOTP dist_th=2.
    gt = [_frame([[0.0, 0.0]], [0], ids=[0]),
          _frame([[0.0, 0.0]], [0], ids=[0])]
    dt = [_frame([[0.0, 0.0]], [0], scores=[0.9], ids=[1]),
          _frame([[10.0, 10.0]], [0], scores=[0.8], ids=[2])]
    m = evaluate_tracking([gt], [dt], class_names=CLASSES)
    assert np.isclose(m["AMOTA"], 18 / 40)
    assert np.isclose(m["AMOTP"], (18 * 0.0 + 22 * 2.0) / 40)
    # unthresholded pass: 1 match, 1 FP, 1 FN -> MOTA = 1 - 2/2 = 0
    assert m["MOTA"] == 0.0


def test_amota_range_filter_excludes_far_boxes():
    # GT + DT pair at 100 m from the ego: both outside the car 50 m range ->
    # neither counts, class has no GT in range -> empty result set
    gt = [[{**_frame([[100.0, 0.0]], [0], ids=[0]),
            "ego": np.zeros(2)}]]
    dt = [[{**_frame([[100.0, 0.0]], [0], scores=[0.9], ids=[1]),
            "ego": np.zeros(2)}]]
    m = evaluate_tracking(gt, dt, class_names=CLASSES)
    assert "AMOTA_car" not in m
    # with the ego placed nearby, the same pair is a clean match
    g2 = [[{**gt[0][0], "ego": np.array([99.0, 0.0])}]]
    d2 = [[{**dt[0][0], "ego": np.array([99.0, 0.0])}]]
    m2 = evaluate_tracking(g2, d2, class_names=CLASSES)
    assert m2["AMOTA_car"] == 1.0
    # frames WITHOUT ego must raise (a silent (0,0) default would
    # range-drop every global-frame box and report a plausible 0.0)
    import pytest

    no_ego_g = [[_frame([[1.0, 0.0]], [0], ids=[0], ego=False)]]
    no_ego_d = [[_frame([[1.0, 0.0]], [0], scores=[1.0], ids=[1],
                        ego=False)]]
    with pytest.raises(ValueError, match="ego"):
        evaluate_tracking(no_ego_g, no_ego_d, class_names=CLASSES)
    # ... unless range filtering is disabled explicitly
    m3 = evaluate_tracking(no_ego_g, no_ego_d, class_names=CLASSES,
                           class_range={})
    assert m3["AMOTA_car"] == 1.0


def test_tracking_eval_rejects_mismatched_frame_counts():
    gt = [[_frame([[0.0, 0.0]], [0], ids=[0]),
           _frame([[0.0, 0.0]], [0], ids=[0])]]
    dt = [[_frame([[0.0, 0.0]], [0], scores=[1.0], ids=[1])]]
    import pytest

    with pytest.raises(ValueError, match="frames"):
        evaluate_tracking(gt, dt, class_names=CLASSES, class_range={})


def test_tracking_eval_route_e2e(tmp_path):
    """records (with tracking metadata) -> CenterPoint predict -> greedy
    tracker -> AMOTA: the evaluate.py --options tracking=true route."""
    import jax
    import jax.numpy as jnp

    from minddet_tpu.data.nuscenes import create_nuscenes_records
    from minddet_tpu.models.detectors.centerpoint import CenterPoint
    from minddet_tpu.train.evaluate import nuscenes_tracking_evaluate
    from tests.test_nuscenes_data import _write_fake_nusc

    root = _write_fake_nusc(str(tmp_path))
    out = str(tmp_path / "nusc")
    create_nuscenes_records(root, out, "v1.0-test", nsweeps=3)
    model = CenterPoint(
        task_num_classes=(1, 2, 2, 1, 2, 2), grid_ny=128, grid_nx=128,
        voxel_size=(0.2, 0.2, 8.0),
        pc_range=(-12.8, -12.8, -5.0, 12.8, 12.8, 3.0),
        max_voxels=1024, max_points_per_voxel=8, max_objs=32,
        rpn_filters=(32, 64, 128), rpn_up_filters=(32, 32, 32),
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 5)),
        jnp.ones((1, 256), bool), method=model.predict_from_points,
    )
    m = nuscenes_tracking_evaluate(
        model, variables, out + "-*.arrayrecord", batch_size=1,
        score_threshold=0.0,
    )
    assert {"AMOTA", "AMOTP", "MOTA", "IDS"} <= set(m)
    assert all(np.isfinite(v) for v in m.values())


def test_tracking_eval_oracle_detections(tmp_path):
    """With GT boxes fed back as 'detections', the route must score a
    perfect AMOTA — pins the record metadata -> global transform -> tracker
    -> protocol chain without a trained model."""
    from minddet_tpu.data.nuscenes import (
        DETECTION_CLASSES,
        NuScenesDetection,
        create_nuscenes_records,
    )
    from minddet_tpu.data.nuscenes_track_eval import evaluate_tracking
    from minddet_tpu.track import GreedyTracker
    from tests.test_nuscenes_data import _write_fake_nusc

    root = _write_fake_nusc(str(tmp_path))
    out = str(tmp_path / "nusc")
    create_nuscenes_records(root, out, "v1.0-test", nsweeps=3)
    ds = NuScenesDetection(out + "-*.arrayrecord", max_points=1024, max_gt=32)
    frames = [ds[i] for i in range(len(ds))]
    assert all("scene" in f for f in frames)
    frames.sort(key=lambda f: float(f["timestamp"]))

    tracker = GreedyTracker(class_names=DETECTION_CLASSES)
    gt_sc, dt_sc = [], []
    prev_t = None
    for f in frames:
        T = np.asarray(f["global_from_lidar"], np.float64)
        gm = f["gt_mask"]
        gb = f["gt_boxes"][gm]
        centers = (gb[:, :3] @ T[:3, :3].T + T[:3, 3])[:, :2]
        vel = gb[:, 6:8] @ T[:2, :2].T
        cls = f["gt_classes"][gm].astype(np.int64) - 1
        t = float(f["timestamp"])
        dt = 0.0 if prev_t is None else t - prev_t
        prev_t = t
        ids = tracker.step(centers, vel, cls, np.ones(len(cls)), dt)
        ego = T[:2, 3]
        gt_sc.append({"centers": centers, "ids": f["gt_track_ids"][gm],
                      "classes": cls, "ego": ego})
        dt_sc.append({"centers": centers, "ids": ids, "classes": cls,
                      "scores": np.ones(len(cls)), "ego": ego})
    m = evaluate_tracking([gt_sc], [dt_sc], DETECTION_CLASSES)
    assert m["AMOTA"] == 1.0 and m["AMOTP"] == 0.0 and m["IDS"] == 0


def test_amota_end_to_end_with_tracker():
    # synthetic scene: two cars + one pedestrian, constant velocity, perfect
    # detections; the greedy tracker's ids must yield AMOTA 1 / AMOTP 0
    rng = np.random.RandomState(0)
    centers0 = np.array([[0.0, 0.0], [30.0, 5.0], [-10.0, 8.0]])
    vels = np.array([[8.0, 0.0], [-6.0, 2.0], [0.5, 0.0]])
    classes = np.array([0, 0, 1])
    gt_scene, det_frames = [], []
    for t in range(6):
        c = centers0 + vels * 0.5 * t
        gt_scene.append(_frame(c, classes, ids=np.arange(3)))
        order = rng.permutation(3)  # detector output order is arbitrary
        det_frames.append({
            "centers": c[order], "velocities": vels[order],
            "classes": classes[order],
            "scores": np.array([0.9, 0.8, 0.7]), "timestamp": 0.5 * t,
        })
    ids = track_sequence(det_frames, class_names=("car", "pedestrian"))
    dt_scene = [
        _frame(f["centers"], f["classes"], scores=f["scores"], ids=i)
        for f, i in zip(det_frames, ids)
    ]
    m = evaluate_tracking([gt_scene], [dt_scene],
                          class_names=("car", "pedestrian"))
    assert m["AMOTA"] == 1.0 and m["AMOTP"] == 0.0 and m["IDS"] == 0
