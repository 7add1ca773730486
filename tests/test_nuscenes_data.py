"""nuScenes ingestion on a synthetic v1.0-layout fixture: raw-table parsing,
lidar-frame GT + velocity extraction, sweep-transform chain, CBGS balance,
record roundtrip into CenterPoint's fused device loss."""

import json
import os

import numpy as np
import pytest

from minddet_tpu.data.nuscenes import (
    ATTRIBUTES,
    DETECTION_CLASSES,
    NuScenesDetection,
    cbgs_indices,
    create_nuscenes_infos,
    create_nuscenes_records,
    load_merged_sweeps,
    quaternion_yaw,
)

QI = [1.0, 0.0, 0.0, 0.0]  # identity quaternion
QZ90 = [float(np.cos(np.pi / 4)), 0.0, 0.0, float(np.sin(np.pi / 4))]  # yaw +90


def _write_fake_nusc(root):
    """One scene, 3 keyframes at t=0/0.5/1.0 s with intermediate sweeps; ego
    drives +x at 2 m/s; lidar mounted at z=+1.8; a parked car and a
    pedestrian walking +y at 3 m/s."""
    version = os.path.join(root, "v1.0-test")
    os.makedirs(version, exist_ok=True)
    os.makedirs(os.path.join(root, "sweeps"), exist_ok=True)

    t_us = lambda s: int(s * 1e6)
    sd_times = [0.0, 0.25, 0.5, 0.75, 1.0]  # kf, sweep, kf, sweep, kf
    is_kf = [True, False, True, False, True]
    sample_of = ["s0", "s1", "s1", "s2", "s2"]

    ego_pose, sample_data = [], []
    rng = np.random.RandomState(0)
    for i, t in enumerate(sd_times):
        ego_pose.append({"token": f"ep{i}", "timestamp": t_us(t),
                         "translation": [2.0 * t, 0.0, 0.0], "rotation": QI})
        fname = f"sweeps/pc{i}.pcd.bin"
        sample_data.append({
            "token": f"sd{i}", "sample_token": sample_of[i],
            "ego_pose_token": f"ep{i}", "calibrated_sensor_token": "cs0",
            "filename": fname, "timestamp": t_us(t), "is_key_frame": is_kf[i],
            "prev": f"sd{i - 1}" if i > 0 else "",
            "next": f"sd{i + 1}" if i < 4 else "",
        })
        # point cloud in the lidar frame at time t: noise + clusters at the
        # parked car (global (10, 0, 0.75)) and the walking pedestrian
        # (global (5, 3t, 0.9))
        pts = rng.uniform(-1.5, 20, (200, 5)).astype(np.float32)
        car_lidar = np.array([10.0 - 2.0 * t, 0.0, 0.75 - 1.8], np.float32)
        cluster = car_lidar + rng.uniform(-0.7, 0.7, (50, 3)).astype(np.float32)
        pts[:50, :3] = cluster
        ped_lidar = np.array([5.0 - 2.0 * t, 3.0 * t, 0.9 - 1.8], np.float32)
        pts[50:80, :3] = ped_lidar + rng.uniform(
            -0.25, 0.25, (30, 3)).astype(np.float32)
        pts.tofile(os.path.join(root, fname))

    samples = [
        {"token": f"s{i}", "timestamp": t_us(0.5 * i), "scene_token": "sc0"}
        for i in range(3)
    ]

    anns = []
    for i in range(3):  # instance A: parked car, yaw 90deg
        anns.append({
            "token": f"a{i}", "sample_token": f"s{i}", "instance_token": "instA",
            "translation": [10.0, 0.0, 0.75], "size": [1.9, 4.6, 1.7],
            "rotation": QZ90, "prev": f"a{i - 1}" if i > 0 else "",
            "next": f"a{i + 1}" if i < 2 else "", "num_lidar_pts": 50,
            "num_radar_pts": 0, "attribute_tokens": ["at_parked"],
        })
    for i in range(3):  # instance B: pedestrian walking +y at 3 m/s
        anns.append({
            "token": f"b{i}", "sample_token": f"s{i}", "instance_token": "instB",
            "translation": [5.0, 3.0 * 0.5 * i, 0.9], "size": [0.6, 0.7, 1.7],
            "rotation": QI, "prev": f"b{i - 1}" if i > 0 else "",
            "next": f"b{i + 1}" if i < 2 else "", "num_lidar_pts": 8,
            "num_radar_pts": 0, "attribute_tokens": ["at_moving"],
        })
    # an empty-lidar annotation that filter_zero must drop
    anns.append({
        "token": "c0", "sample_token": "s0", "instance_token": "instA",
        "translation": [3.0, 3.0, 0.5], "size": [1.9, 4.6, 1.7],
        "rotation": QI, "prev": "", "next": "", "num_lidar_pts": 0,
        "num_radar_pts": 0, "attribute_tokens": [],
    })

    tables = {
        "sample": samples,
        "sample_data": sample_data,
        "ego_pose": ego_pose,
        "calibrated_sensor": [{
            "token": "cs0", "sensor_token": "sn0",
            "translation": [0.0, 0.0, 1.8], "rotation": QI,
        }],
        "sample_annotation": anns,
        "scene": [{"token": "sc0", "name": "scene-0001"}],
        "category": [
            {"token": "cat_car", "name": "vehicle.car"},
            {"token": "cat_ped", "name": "human.pedestrian.adult"},
        ],
        "attribute": [
            {"token": "at_parked", "name": "vehicle.parked"},
            {"token": "at_moving", "name": "pedestrian.moving"},
        ],
        "instance": [
            {"token": "instA", "category_token": "cat_car"},
            {"token": "instB", "category_token": "cat_ped"},
        ],
        "sensor": [{"token": "sn0", "channel": "LIDAR_TOP"}],
    }
    for name, rows in tables.items():
        with open(os.path.join(version, f"{name}.json"), "w") as f:
            json.dump(rows, f)
    return root


def test_infos_lidar_frame_gt_and_velocity(tmp_path):
    root = _write_fake_nusc(str(tmp_path))
    train, val = create_nuscenes_infos(root, "v1.0-test", nsweeps=3)
    assert len(train) == 3 and len(val) == 0
    info0 = train[0]
    # filter_zero dropped the empty annotation
    assert len(info0["gt_names"]) == 2
    i_car = info0["gt_names"].index("car")
    i_ped = info0["gt_names"].index("pedestrian")
    box_car = info0["gt_boxes"][i_car]
    # lidar frame at t=0: global (10,0,0.75) - ego (0,0,0) - mount (0,0,1.8)
    np.testing.assert_allclose(box_car[:3], [10.0, 0.0, -1.05], atol=1e-5)
    np.testing.assert_allclose(box_car[3:6], [1.9, 4.6, 1.7], atol=1e-5)
    assert abs(box_car[8] - np.pi / 2) < 1e-5  # yaw from the quaternion
    np.testing.assert_allclose(box_car[6:8], [0.0, 0.0], atol=1e-6)  # parked
    # walking pedestrian: forward-difference velocity (0, 3)
    box_ped = info0["gt_boxes"][i_ped]
    np.testing.assert_allclose(box_ped[6:8], [0.0, 3.0], atol=1e-5)
    # attributes recorded for mAAE modeling
    assert info0["gt_attrs"][i_car] == ATTRIBUTES.index("vehicle.parked")
    assert info0["gt_attrs"][i_ped] == ATTRIBUTES.index("pedestrian.moving")
    # ego motion shifts the lidar-frame car at t=1.0 by -2 m in x
    box_car2 = train[2]["gt_boxes"][train[2]["gt_names"].index("car")]
    np.testing.assert_allclose(box_car2[:3], [8.0, 0.0, -1.05], atol=1e-5)


def test_sweep_transform_chain_and_padding(tmp_path):
    root = _write_fake_nusc(str(tmp_path))
    train, _ = create_nuscenes_infos(root, "v1.0-test", nsweeps=3)
    # first keyframe has no history: padded with the ref cloud (lag 0)
    assert len(train[0]["sweeps"]) == 2
    assert train[0]["sweeps"][0]["transform_matrix"] is None
    assert train[0]["sweeps"][1]["time_lag"] == 0.0
    # last keyframe: sweeps at lag 0.25 (sd3) and 0.5 (sd2 = keyframe 1)
    lags = [s["time_lag"] for s in train[2]["sweeps"]]
    np.testing.assert_allclose(lags, [0.25, 0.5], atol=1e-9)
    # the transform must shift a past cloud by -2 * lag in x (ego at 2 m/s)
    tm = train[2]["sweeps"][1]["transform_matrix"]
    np.testing.assert_allclose(tm[:3, :3], np.eye(3), atol=1e-7)
    np.testing.assert_allclose(tm[:3, 3], [-1.0, 0.0, 0.0], atol=1e-6)

    merged = load_merged_sweeps(train[2], root, nsweeps=3)
    assert merged.shape[1] == 5
    dts = np.unique(merged[:, 4])
    np.testing.assert_allclose(sorted(dts), [0.0, 0.25, 0.5], atol=1e-6)
    # the parked car's cluster from every sweep lands at the SAME ref-frame
    # position (10 - 2*1.0 = 8.0) after the transform chain
    for dt in (0.0, 0.25, 0.5):
        sel = merged[np.isclose(merged[:, 4], dt)]
        near = sel[np.linalg.norm(sel[:, :2] - [8.0, 0.0], axis=1) < 1.2]
        assert len(near) >= 30, f"car cluster missing in sweep dt={dt}"


def test_cbgs_rebalances_rare_classes():
    rng = np.random.RandomState(0)
    # 90 car-only samples, 10 with a bicycle
    sets = [{"car"} for _ in range(90)] + [{"car", "bicycle"} for _ in range(10)]
    idx = cbgs_indices(sets, class_names=("car", "bicycle"), rng=rng)
    picked = [sets[i] for i in idx]
    n_bike = sum("bicycle" in s for s in picked)
    # bicycle samples must be heavily duplicated: ~half the epoch
    assert n_bike / len(picked) > 0.35


def test_records_roundtrip_to_centerpoint_loss(tmp_path):
    import jax
    import jax.numpy as jnp

    from minddet_tpu.data.gt_sampler import DataBaseSampler, build_gt_database
    from minddet_tpu.models.detectors.centerpoint import CenterPoint
    from minddet_tpu.ops import host_ops

    root = _write_fake_nusc(str(tmp_path))
    out = str(tmp_path / "nusc")
    paths = create_nuscenes_records(root, out, "v1.0-test", nsweeps=3)
    assert paths and os.path.exists(out + "-classsets.json")

    ds = NuScenesDetection(out + "-*.arrayrecord", max_points=1024,
                           max_gt=32, cbgs=True, augment=True)
    ex = ds[0]
    assert ex["points"].shape == (1024, 5)
    assert ex["gt_boxes"].shape == (32, 9)
    assert ex["gt_mask"].sum() == 2
    got = {DETECTION_CLASSES[c - 1] for c in ex["gt_classes"][ex["gt_mask"]]}
    assert got == {"car", "pedestrian"}

    # GT-AUG hook: database built from the records, pasted objects must show
    # up in the batch with unlabeled attributes (reference wiring:
    # preprocess.py:85-112 with configs_ms sample_groups)
    if host_ops.available():
        db = build_gt_database(ds, DETECTION_CLASSES, min_points=5)
        assert len(db["car"]) >= 1
        aug = NuScenesDetection(
            out + "-*.arrayrecord", max_points=1024, max_gt=32,
            # generous quota: most db entries collide with their own source
            # positions in frame 0, only ego-shifted ones can be accepted
            gt_sampler=DataBaseSampler(
                db, {"car": 8, "pedestrian": 8},
                {c: i + 1 for i, c in enumerate(DETECTION_CLASSES)},
            ),
        )
        ex_aug = aug[0]
        assert ex_aug["gt_mask"].sum() > 2  # something was pasted
        assert np.all(ex_aug["gt_attrs"][2:][ex_aug["gt_mask"][2:]] == -1)
        ds = aug  # feed the GT-AUG batch through the loss below

    batch = {
        k: jnp.asarray(np.stack([ds[0][k], ds[1][k]]))
        for k in ("points", "points_mask", "gt_boxes", "gt_classes", "gt_mask")
    }
    # tiny grid: this test's job is pipeline plumbing, not kernel scale (the
    # 128x128 variant compiled for ~4 min on a CPU host; grid coverage lives
    # in test_centerpoint_model.py)
    model = CenterPoint(
        task_num_classes=(1, 2, 2, 1, 2, 2), grid_ny=64, grid_nx=64,
        voxel_size=(0.4, 0.4, 8.0), pc_range=(-12.8, -12.8, -5.0, 12.8, 12.8, 3.0),
        max_voxels=512, max_points_per_voxel=8, max_objs=32,
        rpn_filters=(16, 32, 64), rpn_up_filters=(16, 16, 16),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           method=model.loss_from_gt)
    (total, parts), _ = model.apply(
        variables, batch, train=True, method=model.loss_from_gt,
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(total))
    # jit like the real eval path — eager op-by-op dispatch of the fused
    # predict program (voxelize + decode + rotated NMS) is ~90 s on CPU
    out_p = jax.jit(
        lambda p, m: model.apply(variables, p, m,
                                 method=model.predict_from_points)
    )(batch["points"], batch["points_mask"])
    assert out_p["boxes"].shape[0] == 2


def test_quaternion_yaw_basics():
    assert abs(quaternion_yaw([1, 0, 0, 0])) < 1e-8
    q = [np.cos(0.3 / 2), 0, 0, np.sin(0.3 / 2)]
    assert abs(quaternion_yaw(q) - 0.3) < 1e-7


def test_infer_attributes_velocity_heuristic():
    from minddet_tpu.data.nuscenes import infer_attributes

    boxes = np.zeros((4, 9), np.float32)
    boxes[0, 6:8] = [3.0, 0.0]   # fast car -> vehicle.moving
    boxes[1, 6:8] = [0.0, 0.0]   # parked car
    boxes[2, 6:8] = [1.0, 1.0]   # moving pedestrian
    boxes[3, 6:8] = [5.0, 0.0]   # barrier: no attributes
    ids = np.array([1, 1, 9, 6])  # car, car, pedestrian, barrier
    attrs = infer_attributes(boxes, ids)
    assert attrs[0] == ATTRIBUTES.index("vehicle.moving")
    assert attrs[1] == ATTRIBUTES.index("vehicle.parked")
    assert attrs[2] == ATTRIBUTES.index("pedestrian.moving")
    assert attrs[3] == -1


def test_nuscenes_eval_attribute_term():
    from minddet_tpu.data.nuscenes_eval import evaluate_nuscenes

    rng = np.random.RandomState(0)
    boxes = np.concatenate(
        [rng.uniform(-20, 20, (6, 2)), rng.uniform(-1, 1, (6, 1)),
         rng.uniform(1, 3, (6, 3)), rng.uniform(-2, 2, (6, 2)),
         rng.uniform(-np.pi, np.pi, (6, 1))], -1)
    attrs = np.array([5, 6, 5, 6, 5, 6])
    gts = [{"boxes": boxes, "attrs": attrs}]
    perfect = [{"boxes": boxes, "scores": np.ones(6), "attrs": attrs}]
    wrong = [{"boxes": boxes, "scores": np.ones(6),
              "attrs": (attrs + 1) % 8}]
    good = evaluate_nuscenes({"car": gts}, {"car": perfect}, ["car"])
    bad = evaluate_nuscenes({"car": gts}, {"car": wrong}, ["car"])
    assert good["mAAE"] == 0.0 and bad["mAAE"] == 1.0
    assert good["NDS"] > bad["NDS"]
    # barrier never contributes attribute/velocity terms (devkit exclusion)
    barrier = evaluate_nuscenes({"barrier": gts}, {"barrier": perfect},
                                ["barrier"])
    assert barrier["mAAE"] == 1.0  # no classes contribute -> worst-case


@pytest.mark.slow
def test_nuscenes_e2e_eval_path(tmp_path):
    """records -> CenterPoint predict_from_points -> nuScenes metrics."""
    import jax

    from minddet_tpu.data.nuscenes import create_nuscenes_records
    from minddet_tpu.models.detectors.centerpoint import CenterPoint
    from minddet_tpu.train.evaluate import nuscenes_evaluate

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
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 5)),
        jnp.ones((1, 256), bool), method=model.predict_from_points,
    )
    ds_pattern = out + "-*.arrayrecord"
    stats = nuscenes_evaluate(model, variables, ds_pattern, batch_size=1,
                              score_threshold=0.0)
    assert {"mAP", "NDS", "mATE", "mAAE"} <= set(stats)
    assert all(np.isfinite(v) for v in stats.values())


@pytest.mark.slow
def test_nuscenes_e2e_eval_path_refined(tmp_path):
    """records -> CenterPointTwoStage predict_refined -> nuScenes metrics
    (the --options refined=true route in train/evaluate.py)."""
    import jax
    import jax.numpy as jnp

    from minddet_tpu.data.nuscenes import create_nuscenes_records
    from minddet_tpu.models.detectors.centerpoint import CenterPointTwoStage
    from minddet_tpu.train.evaluate import nuscenes_evaluate

    root = _write_fake_nusc(str(tmp_path))
    out = str(tmp_path / "nusc")
    create_nuscenes_records(root, out, "v1.0-test", nsweeps=3)
    model = CenterPointTwoStage(
        task_num_classes=(1, 2, 2, 1, 2, 2), grid_ny=128, grid_nx=128,
        voxel_size=(0.2, 0.2, 8.0),
        pc_range=(-12.8, -12.8, -5.0, 12.8, 12.8, 3.0),
        max_voxels=1024, max_points_per_voxel=8, max_objs=32,
        rpn_filters=(32, 64, 128), rpn_up_filters=(32, 32, 32),
        num_proposals=16, refine_hidden=32,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 5)),
        jnp.ones((1, 256), bool), method=model.predict_refined,
    )
    stats = nuscenes_evaluate(model, variables, out + "-*.arrayrecord",
                              batch_size=1, score_threshold=0.0,
                              refined=True)
    assert {"mAP", "NDS", "mATE", "mAAE"} <= set(stats)
    assert all(np.isfinite(v) for v in stats.values())
