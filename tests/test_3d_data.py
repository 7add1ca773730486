"""KITTI plumbing, GT-AUG sampler, nuScenes metrics."""

import numpy as np
import pytest

from minddet_tpu.data.gt_sampler import DataBaseSampler, build_gt_database
from minddet_tpu.data.kitti import (
    camera_to_lidar_boxes,
    global_augment,
    parse_calib_file,
    parse_label_file,
)
from minddet_tpu.data.nuscenes_eval import evaluate_nuscenes
from minddet_tpu.ops import host_ops


def test_parse_label(tmp_path):
    p = tmp_path / "000001.txt"
    p.write_text(
        "Car 0.00 0 -1.57 614.24 181.78 727.31 284.77 1.57 1.73 4.15 1.00 1.75 13.22 -1.62\n"
        "DontCare -1 -1 -10 503.89 169.71 590.61 190.13 -1 -1 -1 -1000 -1000 -1000 -10\n"
        "Truncated 0.00 0\n"  # short row: dropped
    )
    objs = parse_label_file(str(p))
    # DontCare rows are KEPT (they mark don't-care regions for the AP
    # matcher); only short rows drop
    assert len(objs) == 2
    assert objs[1]["name"] == "DontCare"
    assert objs[0]["name"] == "Car"
    np.testing.assert_allclose(objs[0]["dimensions"], [4.15, 1.57, 1.73])  # l,h,w
    assert objs[0]["rotation_y"] == -1.62


def test_calib_and_camera_to_lidar(tmp_path):
    p = tmp_path / "calib.txt"
    # identity-ish calibration: velo == cam
    p.write_text(
        "P2: 700 0 600 0 0 700 180 0 0 0 1 0\n"
        "R0_rect: 1 0 0 0 1 0 0 0 1\n"
        "Tr_velo_to_cam: 1 0 0 0 0 1 0 0 0 0 1 0\n"
    )
    calib = parse_calib_file(str(p))
    assert calib["P2"].shape == (3, 4)
    objs = [{
        "location": np.array([1.0, 2.0, 3.0], np.float32),
        "dimensions": np.array([4.0, 1.5, 1.8], np.float32),  # l, h, w
        "rotation_y": 0.5,
    }]
    boxes = camera_to_lidar_boxes(objs, calib)
    assert boxes.shape == (1, 7)
    np.testing.assert_allclose(boxes[0, :3], [1, 2, 3], atol=1e-5)
    np.testing.assert_allclose(boxes[0, 3:6], [1.8, 4.0, 1.5], atol=1e-5)  # w,l,h
    np.testing.assert_allclose(boxes[0, 6], -0.5 - np.pi / 2, atol=1e-5)


def test_global_augment_consistency():
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 4).astype(np.float32) * 5
    boxes = np.array([[1.0, 2.0, -1.0, 1.6, 3.9, 1.5, 0.2]], np.float32)
    # point exactly at box center must stay at box center
    pts[0, :3] = boxes[0, :3]
    p2, b2 = global_augment(rng, pts, boxes)
    np.testing.assert_allclose(p2[0, :3], b2[0, :3], atol=1e-5)


@pytest.mark.skipif(not host_ops.available(), reason="native lib missing")
def test_gt_database_and_sampler():
    rng = np.random.RandomState(0)

    class FakeDS:
        def __init__(self):
            box = np.array([[5.0, 0.0, -1.0, 2.0, 4.0, 1.5, 0.0]], np.float32)
            pts_in = rng.uniform(-0.8, 0.8, (50, 4)).astype(np.float32)
            pts_in[:, 0] = pts_in[:, 0] + 5.0  # inside box
            pts_in[:, 2] = rng.uniform(-1.0, 0.4, 50)
            noise = rng.uniform(20, 30, (100, 4)).astype(np.float32)
            self.records = [
                {"points": np.concatenate([pts_in, noise]),
                 "gt_boxes": box, "gt_classes": np.array([1], np.int32)}
            ]

        def __len__(self):
            return 1

    ds = FakeDS()
    db = build_gt_database(ds, ["Car"], min_points=5)
    assert len(db["Car"]) == 1
    assert len(db["Car"][0]["points"]) >= 40  # most inside points captured

    sampler = DataBaseSampler(db, {"Car": 3}, {"Car": 1})
    scene_pts = rng.uniform(-40, 40, (500, 4)).astype(np.float32)
    boxes, classes = np.zeros((0, 7), np.float32), np.zeros((0,), np.int32)
    p2, b2, c2 = sampler.sample(rng, scene_pts, boxes, classes)
    assert len(b2) >= 1  # pasted something
    assert np.all(c2 == 1)
    assert len(p2) > 450
    # pasted boxes must not overlap each other
    if len(b2) > 1:
        bev = b2[:, [0, 1, 3, 4, 6]]
        iou = host_ops.rotated_iou_matrix(bev, bev)
        np.fill_diagonal(iou, 0)
        assert iou.max() < 1e-3


@pytest.mark.skipif(not host_ops.available(), reason="native lib missing")
def test_gt_database_and_sampler_9d_velocity_boxes():
    """nuScenes-style GT-AUG: 9D [x,y,z_center,w,l,h,vx,vy,yaw] boxes, 5-dim
    sweep points. Mirrors the reference's withvelo database semantics
    (create_gt_database.py:55-62): sampled objects carry their source
    velocity. Collision rejection must key off yaw = LAST column."""
    rng = np.random.RandomState(0)

    class FakeNusc:
        def __init__(self):
            # z-center convention: box z=-0.25, h=1.5 -> occupies [-1.0, 0.5]
            box = np.array(
                [[5.0, 0.0, -0.25, 2.0, 4.0, 1.5, 3.0, -1.0, 0.6]], np.float32
            )
            pts_in = rng.uniform(-0.8, 0.8, (50, 5)).astype(np.float32)
            pts_in[:, 0] += 5.0
            pts_in[:, 2] = rng.uniform(-0.9, 0.4, 50)
            noise = rng.uniform(20, 30, (100, 5)).astype(np.float32)
            self.records = [
                {"points": np.concatenate([pts_in, noise]),
                 "gt_boxes": box, "gt_classes": np.array([1], np.int32)}
            ]

        def __len__(self):
            return 1

    db = build_gt_database(FakeNusc(), ["car"], min_points={"car": 5})
    assert len(db["car"]) == 1
    assert len(db["car"][0]["points"]) >= 40  # z-center crop captured them
    assert db["car"][0]["box"].shape == (9,)

    sampler = DataBaseSampler(db, {"car": 4}, {"car": 1})
    scene_pts = rng.uniform(-40, 40, (500, 5)).astype(np.float32)
    # one pre-existing GT away from the db object's stored position
    gt = np.array([[-8.0, -8.0, -0.25, 2.0, 4.0, 1.5, 0.0, 0.0, 0.6]], np.float32)
    p2, b2, c2 = sampler.sample(
        rng, scene_pts, gt, np.array([1], np.int32)
    )
    assert b2.shape[-1] == 9 and len(b2) > 1
    pasted = b2[1:]
    # source velocity rides along (withvelo)
    np.testing.assert_allclose(
        pasted[:, 6:8], np.tile([3.0, -1.0], (len(pasted), 1)), atol=1e-6
    )
    # no pasted box collides with the original GT or each other (yaw = col 8)
    bev = b2[:, [0, 1, 3, 4, 8]]
    iou = host_ops.rotated_iou_matrix(bev, bev)
    np.fill_diagonal(iou, 0)
    assert iou.max() < 1e-3
    # object points were translated to each accepted box center
    for box in pasted:
        near = np.linalg.norm(p2[:, :2] - box[:2], axis=1) < 2.5
        assert near.sum() >= 40


def _nusc_sample(rng, n=5, jitter=0.0):
    boxes = np.zeros((n, 9), np.float64)
    boxes[:, :2] = rng.uniform(-40, 40, (n, 2))
    boxes[:, 2] = -1
    boxes[:, 3:6] = rng.uniform(1, 4, (n, 3))
    boxes[:, 6:8] = rng.uniform(-5, 5, (n, 2))
    boxes[:, 8] = rng.uniform(-np.pi, np.pi, n)
    dt = boxes.copy()
    dt[:, :2] += jitter * rng.randn(n, 2)
    return boxes, dt


def test_nuscenes_perfect_detections():
    rng = np.random.RandomState(0)
    gts, dts = [], []
    for _ in range(6):
        g, d = _nusc_sample(rng)
        gts.append({"boxes": g})
        dts.append({"boxes": d, "scores": rng.uniform(0.5, 1, len(d))})
    out = evaluate_nuscenes({"car": gts}, {"car": dts}, ["car"])
    assert out["mAP"] > 0.95
    assert out["mATE"] < 0.01
    assert out["NDS"] > 0.85


def test_nuscenes_jitter_hurts_ate_not_map():
    rng = np.random.RandomState(1)
    gts, dts = [], []
    for _ in range(6):
        g, d = _nusc_sample(rng, jitter=0.3)
        gts.append({"boxes": g})
        dts.append({"boxes": d, "scores": rng.uniform(0.5, 1, len(d))})
    out = evaluate_nuscenes({"car": gts}, {"car": dts}, ["car"])
    assert out["mAP"] > 0.9  # 0.3 m jitter << 2 m threshold band
    assert out["mATE"] > 0.2


def test_nuscenes_misses_lower_map():
    rng = np.random.RandomState(2)
    gts, dts = [], []
    for i in range(6):
        g, d = _nusc_sample(rng)
        gts.append({"boxes": g})
        keep = d[: len(d) // 2]
        dts.append({"boxes": keep, "scores": rng.uniform(0.5, 1, len(keep))})
    out = evaluate_nuscenes({"car": gts}, {"car": dts}, ["car"])
    assert 0.2 < out["mAP"] < 0.6


# realistic KITTI-style calib: camera x=-y_l, y=-z_l (down), z=x_l
_TRV2C_RECT = np.array(
    [[0, -1, 0, 0], [0, 0, -1, 0.08], [1, 0, 0, -0.27], [0, 0, 0, 1]],
    np.float32,
)
_P2 = np.array([[500.0, 0, 600, 0], [0, 500, 180, 0], [0, 0, 1, 0]], np.float32)


def test_camera_lidar_roundtrip():
    """lidar_box_to_camera inverts camera_to_lidar_boxes exactly."""
    from minddet_tpu.data.kitti import camera_to_lidar_boxes, lidar_box_to_camera

    objs = [
        {"location": np.array([2.0, 1.5, 8.0], np.float32),
         "dimensions": np.array([4.2, 1.6, 1.8], np.float32),  # l, h, w
         "rotation_y": 0.4},
        {"location": np.array([-3.0, 1.4, 15.0], np.float32),
         "dimensions": np.array([3.8, 1.5, 1.7], np.float32),
         "rotation_y": -1.2},
    ]
    calib = {"R0_rect": np.eye(4, dtype=np.float32),
             "Tr_velo_to_cam": _TRV2C_RECT}
    lidar = camera_to_lidar_boxes(objs, calib)
    cam = lidar_box_to_camera(lidar, _TRV2C_RECT)
    for i, o in enumerate(objs):
        np.testing.assert_allclose(cam[i, :3], o["location"], atol=1e-5)
        np.testing.assert_allclose(cam[i, 3:6], o["dimensions"], atol=1e-5)
        # angles equal modulo 2pi
        d = (cam[i, 6] - o["rotation_y"]) % (2 * np.pi)
        assert min(d, 2 * np.pi - d) < 1e-5


def test_detections_to_kitti_annos_projection():
    """Projected 2D bbox sits where the pinhole model says it should."""
    from minddet_tpu.data.kitti import detections_to_kitti_annos

    # car 10 m ahead on the lidar x axis, on the ground
    boxes7 = np.array([[10.0, 0.0, -1.6, 1.8, 4.2, 1.5, 0.0]], np.float32)
    anno = detections_to_kitti_annos(
        boxes7, np.array([0.9]), np.array([0]), ("Car",),
        _TRV2C_RECT, _P2, (375, 1242),
    )
    assert list(anno["name"]) == ["Car"]
    bbox = anno["bbox"][0]
    # yaw=0 heads into depth: image width shows the car's WIDTH (+-0.9 m)
    # at z in [7.6, 11.8] -> u = 600 +- 500*0.9/z
    assert 520 < bbox[0] < 580 and 620 < bbox[2] < 680
    # bottom face y=1.68, top y=0.18 -> v in ~[187, 291]
    assert 180 < bbox[1] < 200 and 240 < bbox[3] < 300
    assert np.isfinite(anno["alpha"][0])
    # a detection behind the camera plane is dropped
    behind = np.array([[-5.0, 0.0, -1.6, 1.8, 4.2, 1.5, 0.0]], np.float32)
    anno2 = detections_to_kitti_annos(
        behind, np.array([0.9]), np.array([0]), ("Car",),
        _TRV2C_RECT, _P2, (375, 1242),
    )
    assert len(anno2["name"]) == 0


@pytest.mark.slow
def test_kitti_eval_cli_path(tmp_path):
    """Full PointPillars -> official-KITTI-AP plumbing on synthetic records
    (untrained model; asserts protocol table structure incl. bbox/AOS, not
    accuracy)."""
    import jax
    import jax.numpy as jnp

    from minddet_tpu.data.kitti import detections_to_kitti_annos
    from minddet_tpu.data.records import write_records
    from minddet_tpu.models.detectors.pointpillars import PointPillars
    from minddet_tpu.train.evaluate import kitti_evaluate

    rng = np.random.RandomState(0)
    VS, PCR = (0.2, 0.2, 4.0), (0.0, -3.2, -3.0, 6.4, 3.2, 1.0)
    exs = []
    for _ in range(4):
        pts = np.stack([rng.uniform(0.2, 6.2, 500), rng.uniform(-3, 3, 500),
                        rng.uniform(-2.5, 0.5, 500), rng.uniform(0, 1, 500)], -1)
        gt7 = np.array([[3.0, 0.0, -1.8, 1.6, 3.9, 1.56, 0.1]], np.float32)
        gt_anno = detections_to_kitti_annos(
            gt7, np.array([1.0]), np.array([0]), ("Car",),
            _TRV2C_RECT, _P2, (375, 1242),
        )
        exs.append({
            "points": pts.astype(np.float32),
            "gt_boxes": gt7,
            "gt_classes": np.array([1], np.int32),
            "P2": _P2,
            "Trv2c_rect": _TRV2C_RECT,
            "img_shape": np.array([375, 1242], np.int32),
            "anno_name": np.asarray(gt_anno["name"], dtype="U16"),
            "anno_bbox": gt_anno["bbox"],
            "anno_alpha": gt_anno["alpha"],
            "anno_occluded": gt_anno["occluded"],
            "anno_truncated": gt_anno["truncated"],
            "anno_location": gt_anno["location"],
            "anno_dimensions": gt_anno["dimensions"],
            "anno_rotation_y": gt_anno["rotation_y"],
        })
    write_records(str(tmp_path / "kitti"), exs)

    model = PointPillars(
        num_classes=1, grid_ny=32, grid_nx=32, voxel_size=VS, pc_range=PCR,
        rpn_filters=(32, 64, 128), rpn_up_filters=(32, 32, 32),
        anchor_sizes=((1.6, 3.9, 1.56),), anchor_strides=((0.4, 0.4, 0.0),),
        anchor_offsets=((0.2, -3.0, -1.78),), max_voxels=256,
        max_points_per_voxel=8,
    )
    pts0 = jnp.zeros((1, 500, 4))
    variables = model.init(jax.random.PRNGKey(0), pts0,
                           jnp.ones((1, 500), bool),
                           method=model.predict_from_points)

    table = kitti_evaluate(
        model, variables, str(tmp_path / "kitti-*.arrayrecord"),
        score_threshold=0.0, batch_size=4,
    )
    assert set(table["Car"].keys()) == {"bbox", "bev", "3d", "aos"}
    for v in table["Car"].values():
        assert len(v) == 3 and all(np.isfinite(x) for x in v)


# ---------------------------------------------------------------------------
# Per-object noise aug (reference preprocess.py:560-668)
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not host_ops.available(), reason="native lib missing")
def test_noise_per_object_moves_box_with_its_points():
    from minddet_tpu.data.kitti import noise_per_object

    rng = np.random.RandomState(3)
    box = np.array([[10.0, 0.0, -1.0, 2.0, 4.0, 1.5, 0.3]], np.float32)
    inner = rng.uniform(-0.5, 0.5, (60, 4)).astype(np.float32)
    inner[:, :3] += box[0, :3] + [0, 0, 0.6]
    far = rng.uniform(30, 40, (40, 4)).astype(np.float32)
    pts = np.concatenate([inner, far])
    p2, b2 = noise_per_object(
        rng, box, pts, rotation_perturb=(0.3, 0.3), center_noise_std=(1.0, 1.0, 0.0)
    )
    # box perturbed: rotation exactly +0.3, translation drawn from N(0,1)
    assert abs((b2[0, 6] - box[0, 6]) - 0.3) < 1e-5
    dloc = b2[0, :3] - box[0, :3]
    assert np.linalg.norm(dloc[:2]) > 1e-3 and abs(dloc[2]) < 1e-6
    # interior points moved rigidly with the box: distances to the new
    # center equal distances to the old center (rotation+translation only)
    d_old = np.linalg.norm(pts[:60, :2] - box[0, :2], axis=1)
    d_new = np.linalg.norm(p2[:60, :2] - b2[0, :2], axis=1)
    np.testing.assert_allclose(d_new, d_old, atol=1e-4)
    # far points untouched
    np.testing.assert_allclose(p2[60:], far, atol=0)


@pytest.mark.skipif(not host_ops.available(), reason="native lib missing")
def test_noise_per_object_never_creates_collisions():
    from minddet_tpu.data.kitti import noise_per_object

    rng = np.random.RandomState(5)
    # a tight row of cars, 0.4 m apart nose-to-tail: most candidates collide
    boxes = np.stack(
        [np.array([5.0 + i * 4.4, 0.0, -1.0, 2.0, 4.0, 1.5, np.pi / 2])
         for i in range(6)]
    ).astype(np.float32)
    iou0 = host_ops.rotated_iou_matrix(
        boxes[:, [0, 1, 3, 4, 6]], boxes[:, [0, 1, 3, 4, 6]]
    )
    np.fill_diagonal(iou0, 0)
    assert iou0.max() == 0.0  # scene starts collision-free
    pts = rng.uniform(-1, 1, (50, 4)).astype(np.float32)
    _, b2 = noise_per_object(
        rng, boxes, pts, rotation_perturb=(-0.3, 0.3),
        center_noise_std=(0.5, 0.5, 0.0), num_try=50,
    )
    bev = b2[:, [0, 1, 3, 4, 6]]
    iou = host_ops.rotated_iou_matrix(bev, bev)
    np.fill_diagonal(iou, 0)
    assert iou.max() <= 1e-6


# ---------------------------------------------------------------------------
# Assembled KITTI training path: records -> GT-AUG -> noise -> aug -> batch
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not host_ops.available(), reason="native lib missing")
def test_kitti_batches_carry_gtaug_objects(tmp_path):
    """GT-database objects actually appear in training batches (the reference
    wires this through prep_pointcloud; VERDICT r1 found ours unconnected)."""
    from minddet_tpu.core.config import ConfigDict
    from minddet_tpu.data.records import write_records
    from minddet_tpu.train.train import kitti_batches

    rng = np.random.RandomState(0)
    exs = []
    for i in range(4):
        # one real car with 80 interior points + scene noise
        cx = 10.0 + 3 * i
        box = np.array([[cx, 0.0, -1.5, 1.8, 4.2, 1.5, 0.2]], np.float32)
        inner = rng.uniform(-0.6, 0.6, (80, 4)).astype(np.float32)
        inner[:, 0] += cx
        inner[:, 2] = rng.uniform(-1.4, -0.2, 80)
        noise = np.stack(
            [rng.uniform(0, 60, 400), rng.uniform(-30, 30, 400),
             rng.uniform(-2.5, 0.5, 400), rng.uniform(0, 1, 400)], -1
        ).astype(np.float32)
        exs.append({
            "points": np.concatenate([inner, noise]),
            "gt_boxes": box,
            "gt_classes": np.array([1], np.int32),
        })
    write_records(str(tmp_path / "kitti"), exs)

    cfg = ConfigDict({
        "data": {
            "type": "kitti",
            "records": str(tmp_path / "kitti-*.arrayrecord"),
            "classes": ["Car"],
            "max_points": 2000,
            "max_gt": 24,
            "gt_sampler": {"max_per_class": {"Car": 10}},
            "object_noise": {},
            "augment": True,
            "workers": 0,
        }
    })
    batch = next(iter(kitti_batches(cfg, batch_size=4)))
    assert batch["points"].shape == (4, 2000, 4)
    assert batch["gt_boxes"].shape == (4, 24, 7)
    n_gt = batch["gt_mask"].sum(axis=1)
    # each scene had exactly 1 real box; the sampler must have pasted more
    assert np.all(n_gt > 1), n_gt
    # pasted boxes never overlap (collision rejection held through noise)
    for b in range(4):
        bev = batch["gt_boxes"][b][batch["gt_mask"][b]][:, [0, 1, 3, 4, 6]]
        iou = host_ops.rotated_iou_matrix(bev, bev)
        np.fill_diagonal(iou, 0)
        assert iou.max() < 1e-3


def test_create_data_cli_gt_database(tmp_path):
    """tools/create_data.py end-to-end: records glob -> pickled GT bank."""
    import os
    import subprocess
    import sys

    from minddet_tpu.data.records import write_records

    rng = np.random.RandomState(0)
    exs = []
    for _ in range(3):
        boxes = np.array([[5.0, 2.0, -1.5, 1.6, 3.9, 1.5, 0.2]], np.float32)
        inside = rng.uniform(-0.5, 0.5, (40, 3)).astype(np.float32) * [
            1.5, 3.5, 1.3] + boxes[0, :3] + [0, 0, boxes[0, 5] / 2]
        noise = rng.uniform(-20, 20, (60, 3)).astype(np.float32)
        pts = np.concatenate([inside, noise]).astype(np.float32)
        pts = np.concatenate([pts, rng.rand(100, 1).astype(np.float32)], 1)
        exs.append({
            "points": pts,
            "gt_boxes": boxes,
            "gt_classes": np.array([1], np.int32),
        })
    write_records(str(tmp_path / "k"), exs)

    out = tmp_path / "db.pkl"
    r = subprocess.run(
        [sys.executable, "tools/create_data.py", "gt-database",
         "--records", str(tmp_path / "k-*.arrayrecord"),
         "--classes", "Car", "--out", str(out)],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-800:]
    from minddet_tpu.data.gt_sampler import load_database
    db = load_database(str(out))
    assert len(db["Car"]) == 3
    assert all(d["points"].shape[1] == 4 for d in db["Car"])
