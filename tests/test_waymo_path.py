"""Waymo end-to-end path: converter (synthetic Frame fixture), batches,
CenterPoint loss, and the L1/L2 AP/APH eval dispatch.

The waymo_open_dataset proto + tensorflow are unavailable here (as in most
training images), so the converter test fakes the parsed-frame layer via
``sys.modules`` — the converter's own control flow (TFRecord iteration,
Frame parse, point extraction, record writing) runs for real.
"""

import sys
import types

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# Synthetic Frame fixture
# ---------------------------------------------------------------------------


class _FakeBox:
    def __init__(self, cx, cy, cz, l, w, h, heading):
        self.center_x, self.center_y, self.center_z = cx, cy, cz
        self.length, self.width, self.height = l, w, h
        self.heading = heading


class _FakeLabel:
    def __init__(self, box, type_, npts):
        self.box = box
        self.type = type_
        self.num_lidar_points_in_box = npts


_FRAMES = {}


class _FakeFrame:
    def __init__(self):
        self.laser_labels = []

    def ParseFromString(self, data: bytes):
        spec = _FRAMES[data.decode()]
        self.laser_labels = [
            _FakeLabel(_FakeBox(*b["box"]), b["type"], b["npts"])
            for b in spec["labels"]
        ]
        self._points = spec["points"]


class _FakeRecord:
    def __init__(self, key: str):
        self._key = key

    def numpy(self):
        return self._key.encode()


def _install_fake_waymo(monkeypatch):
    tf = types.ModuleType("tensorflow")
    tf.data = types.SimpleNamespace(
        TFRecordDataset=lambda path, compression_type="": [
            _FakeRecord(k) for k in _FRAMES if k.startswith(path)
        ]
    )
    wod = types.ModuleType("waymo_open_dataset")
    dataset_pb2 = types.ModuleType("waymo_open_dataset.dataset_pb2")
    dataset_pb2.Frame = _FakeFrame
    utils = types.ModuleType("waymo_open_dataset.utils")
    frame_utils = types.ModuleType("waymo_open_dataset.utils.frame_utils")

    # the converter calls parse(frame) then convert(frame, ri, cp); the fake
    # hands back the frame's preset cloud
    frame_utils.parse_range_image_and_camera_projection = (
        lambda frame: (None, None, None))

    def _convert(frame, ri, cp, keep_polar_features=False):
        # the real toolkit returns [range, intensity, elongation, x, y, z]
        # when keep_polar_features=True; the fake's preset clouds are stored
        # in that 6-feature layout
        assert keep_polar_features, "converter must request polar features"
        return [frame._points], None

    frame_utils.convert_range_image_to_point_cloud = _convert
    wod.dataset_pb2 = dataset_pb2
    wod.utils = utils
    utils.frame_utils = frame_utils
    for name, mod in [
        ("tensorflow", tf),
        ("waymo_open_dataset", wod),
        ("waymo_open_dataset.dataset_pb2", dataset_pb2),
        ("waymo_open_dataset.utils", utils),
        ("waymo_open_dataset.utils.frame_utils", frame_utils),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)


def _frame_spec(rng, n_pts=4000, n_obj=4, raw_types=False):
    labels = []
    for i in range(n_obj):
        cx, cy = rng.uniform(-40, 40, 2)
        labels.append({
            "box": (cx, cy, 0.8, 4.5, 2.0, 1.7, rng.uniform(-np.pi, np.pi)),
            # raw proto enum {1 VEH, 2 PED, 3 SIGN, 4 CYC} for the converter
            # path; 1-based WAYMO_CLASSES ids for pre-extracted records
            "type": int(rng.randint(1, 5)) if raw_types
            else int(rng.randint(1, 4)),
            "npts": int(rng.randint(1, 200)),
        })
    xyz = np.stack([
        rng.uniform(-70, 70, n_pts), rng.uniform(-70, 70, n_pts),
        rng.uniform(-1, 3, n_pts),
    ], -1)
    intensity = rng.uniform(0, 1, (n_pts, 1))
    elongation = rng.uniform(0, 1, (n_pts, 1))
    rng_col = np.linalg.norm(xyz, axis=-1, keepdims=True)
    # toolkit polar layout: [range, intensity, elongation, x, y, z]
    polar = np.concatenate([rng_col, intensity, elongation, xyz], -1)
    return {"points": polar.astype(np.float32), "labels": labels}


def test_convert_waymo_tfrecords_with_fake_frames(tmp_path, monkeypatch):
    from minddet_tpu.data.waymo import WaymoDetection, convert_waymo_tfrecords

    rng = np.random.RandomState(0)
    _FRAMES.clear()
    for seg in ("segA", "segB"):
        for f in range(3):
            _FRAMES[f"{seg}/frame{f}"] = _frame_spec(rng, raw_types=True)
    # one frame with every raw type: 1 VEHICLE, 2 PEDESTRIAN, 3 SIGN, 4 CYCLIST
    spec = _frame_spec(rng, n_obj=4, raw_types=True)
    for i, t in enumerate((1, 2, 3, 4)):
        spec["labels"][i]["type"] = t
    _FRAMES["segA/frame3"] = spec
    _install_fake_waymo(monkeypatch)

    paths = convert_waymo_tfrecords(["segA", "segB"],
                                    str(tmp_path / "waymo"))
    assert paths
    ds = WaymoDetection(str(tmp_path / "waymo-*.arrayrecord"),
                        max_points=5000, max_gt=16)
    assert len(ds) == 7
    ex = ds[0]
    assert ex["points"].shape == (5000, 5)
    assert ex["gt_boxes"].shape == (16, 9)
    # SIGN/UNKNOWN labels are dropped, the rest remapped {1:1, 2:2, 4:3}
    spec0 = _FRAMES["segA/frame0"]
    expected = [{1: 1, 2: 2, 4: 3}[b["type"]] for b in spec0["labels"]
                if b["type"] in (1, 2, 4)]
    assert ex["gt_mask"].sum() == len(expected)
    assert list(ex["gt_classes"][ex["gt_mask"]]) == expected
    # converted points carry [x, y, z, intensity, elongation]
    np.testing.assert_allclose(
        ex["points"][: ex["points_mask"].sum()][:, :3].min(axis=0),
        spec0["points"][:, 3:6].min(axis=0), atol=1e-4)
    # segA/frame3 (record index 3) holds one label of each raw type:
    # SIGN dropped, the remainder remapped to [VEHICLE, PEDESTRIAN, CYCLIST]
    assert list(ds.records[3]["gt_classes"]) == [1, 2, 3]
    # z converted bottom->center: center z = bottom + h/2 = 0.8 - 1.7/2 + ...
    gb = ex["gt_boxes"][ex["gt_mask"]]
    np.testing.assert_allclose(gb[:, 2], 0.8, atol=1e-5)  # original center z
    np.testing.assert_allclose(gb[:, 6:8], 0.0)  # zero velocity
    assert "gt_num_points" in ex
    # records keep the metric-side 7D z-bottom layout
    rec = ds.records[0]
    np.testing.assert_allclose(rec["gt_boxes"][:, 2], 0.8 - 1.7 / 2, atol=1e-5)


def _write_waymo_records(tmp_path, n_frames=4, seed=0):
    from minddet_tpu.data.records import write_records
    from minddet_tpu.data.waymo import waymo_frame_to_example

    rng = np.random.RandomState(seed)

    def examples():
        for _ in range(n_frames):
            spec = _frame_spec(rng, n_pts=3000, n_obj=3)
            labels = [
                {"center": b["box"][:3],
                 "size": b["box"][3:6],
                 "heading": b["box"][6],
                 "type": b["type"],
                 "num_points": b["npts"]}
                for b in spec["labels"]
            ]
            # pre-extracted records store [x, y, z, intensity, elongation]
            yield waymo_frame_to_example(spec["points"][:, [3, 4, 5, 1, 2]],
                                         labels)

    return write_records(str(tmp_path / "wrec"), examples())


def test_waymo_batches_to_centerpoint_loss(tmp_path):
    import jax
    import jax.numpy as jnp

    from minddet_tpu.core.config import Config
    from minddet_tpu.models.detectors.centerpoint import CenterPoint
    from minddet_tpu.train.train import waymo_batches

    _write_waymo_records(tmp_path)
    cfg = Config.fromdict({
        "data": {"type": "waymo",
                 "records": str(tmp_path / "wrec-*.arrayrecord"),
                 "max_points": 4000, "max_gt": 16, "workers": 1,
                 "augment": True,
                 "gt_sampler": {"max_per_class": {"VEHICLE": 4},
                                "min_points": {"VEHICLE": 1}}},
    })
    batch = next(iter(waymo_batches(cfg, 2)))
    assert batch["points"].shape == (2, 4000, 5)
    assert batch["gt_boxes"].shape == (2, 16, 9)
    assert "gt_num_points" not in batch
    batch.pop("step")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model = CenterPoint(
        task_num_classes=(3,), grid_ny=80, grid_nx=80,
        voxel_size=(1.92, 1.92, 6.0),
        pc_range=(-76.8, -76.8, -2.0, 76.8, 76.8, 4.0),
        max_voxels=1500, max_objs=32,
    )
    variables = model.init(jax.random.PRNGKey(0), batch,
                           method=model.loss_from_gt)
    (total, parts), _ = model.apply(variables, batch, train=True,
                                    method=model.loss_from_gt,
                                    mutable=["batch_stats"])
    assert np.isfinite(float(total))


@pytest.mark.slow
def test_waymo_evaluate_path(tmp_path):
    """The eval dispatch closes: records -> fused predict -> L1/L2 AP/APH
    table (untrained model -> finite, ~zero numbers)."""
    import jax
    import jax.numpy as jnp

    from minddet_tpu.models.detectors.centerpoint import CenterPoint
    from minddet_tpu.train.evaluate import waymo_evaluate

    _write_waymo_records(tmp_path, n_frames=3)
    model = CenterPoint(
        task_num_classes=(3,), grid_ny=80, grid_nx=80,
        voxel_size=(1.92, 1.92, 6.0),
        pc_range=(-76.8, -76.8, -2.0, 76.8, 76.8, 4.0),
        max_voxels=1500, max_objs=32,
    )
    pts = jnp.zeros((1, 256, 5))
    variables = model.init(jax.random.PRNGKey(0), pts,
                           jnp.ones((1, 256), bool),
                           method=model.predict_from_points)
    table = waymo_evaluate(
        model, variables, str(tmp_path / "wrec-*.arrayrecord"),
        batch_size=2,  # 3 frames -> covers the tail-padding path too
    )
    assert set(table) == {"Vehicle", "Pedestrian", "Cyclist"}
    for ms in table.values():
        assert set(ms) == {"AP_L1", "APH_L1", "AP_L2", "APH_L2"}
        assert all(np.isfinite(v) and 0 <= v <= 100 for v in ms.values())


@pytest.mark.slow
def test_waymo_evaluate_path_refined(tmp_path):
    """--options refined=true route: two-stage model through waymo_evaluate."""
    import jax
    import jax.numpy as jnp

    from minddet_tpu.models.detectors.centerpoint import CenterPointTwoStage
    from minddet_tpu.train.evaluate import waymo_evaluate

    _write_waymo_records(tmp_path, n_frames=2)
    model = CenterPointTwoStage(
        task_num_classes=(3,), grid_ny=80, grid_nx=80,
        voxel_size=(1.92, 1.92, 6.0),
        pc_range=(-76.8, -76.8, -2.0, 76.8, 76.8, 4.0),
        max_voxels=1500, max_objs=32, num_proposals=16, refine_hidden=32,
    )
    pts = jnp.zeros((1, 256, 5))
    variables = model.init(jax.random.PRNGKey(0), pts,
                           jnp.ones((1, 256), bool),
                           method=model.predict_refined)
    table = waymo_evaluate(
        model, variables, str(tmp_path / "wrec-*.arrayrecord"),
        batch_size=1, refined=True,
    )
    for ms in table.values():
        assert all(np.isfinite(v) and 0 <= v <= 100 for v in ms.values())
