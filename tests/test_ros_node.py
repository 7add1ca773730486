"""ROS inference node driven end to end with a faked rospy stack.

rospy/sensor_msgs/visualization_msgs aren't installable here (nor for the
reference's ``single_infernece_ros.py`` in practice), so the ROS layer is
faked via ``sys.modules`` — the node's own logic (PointCloud2 decode, fixed
-capacity padding, the fused jitted predict, marker/JSON publishing) runs
for real on a tiny CenterPoint config.
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_node():
    spec = importlib.util.spec_from_file_location(
        "ros_infer_node", os.path.join(_REPO, "tools", "ros_infer_node.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Field:
    def __init__(self, name, offset):
        self.name, self.offset = name, offset


class _FakeCloud:
    """Packed xyzi PointCloud2 stand-in (16-byte point_step)."""

    def __init__(self, pts_xyzi: np.ndarray):
        self.height = 1
        self.width = len(pts_xyzi)
        self.point_step = 16
        self.fields = [_Field("x", 0), _Field("y", 4), _Field("z", 8),
                       _Field("intensity", 12)]
        self.data = pts_xyzi.astype(np.float32).tobytes()
        self.header = types.SimpleNamespace(stamp=123)


def test_pointcloud2_decode_and_pad():
    node = _load_node()
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 4).astype(np.float32)
    pts[5, 0] = np.nan  # dropped
    msg = _FakeCloud(pts)
    dec = node.pointcloud2_to_points(msg, num_features=5)
    assert dec.shape == (99, 5)
    np.testing.assert_allclose(dec[:5, :4], pts[:5], atol=0)
    assert (dec[:, 4] == 0).all()  # missing feature padded
    p, m = node.pad_points(dec, 256)
    assert p.shape == (1, 256, 5) and m.sum() == 99


def _install_fake_ros(monkeypatch, state):
    rospy = types.ModuleType("rospy")
    rospy.init_node = lambda name: state.setdefault("node", name)
    rospy.loginfo = lambda *a: None

    class _Pub:
        def __init__(self, topic, msg_cls, queue_size=1):
            self.topic = topic

        def publish(self, msg):
            state.setdefault("published", []).append((self.topic, msg))

    rospy.Publisher = _Pub

    def _sub(topic, msg_cls, cb, **kw):
        state["callback"] = cb

    rospy.Subscriber = _sub
    rospy.spin = lambda: state["callback"](state["msg"])

    sensor = types.ModuleType("sensor_msgs")
    sensor_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msg.PointCloud2 = object
    sensor.msg = sensor_msg
    std = types.ModuleType("std_msgs")
    std_msg = types.ModuleType("std_msgs.msg")

    class _String:
        def __init__(self, data=""):
            self.data = data

    std_msg.String = _String
    std.msg = std_msg
    vis = types.ModuleType("visualization_msgs")
    vis_msg = types.ModuleType("visualization_msgs.msg")

    class _Marker:
        CUBE, ADD = 1, 0

        def __init__(self):
            self.header = types.SimpleNamespace(frame_id="", stamp=None)
            self.pose = types.SimpleNamespace(
                position=types.SimpleNamespace(x=0, y=0, z=0),
                orientation=types.SimpleNamespace(x=0, y=0, z=0, w=1))
            self.scale = types.SimpleNamespace(x=0, y=0, z=0)
            self.color = types.SimpleNamespace(r=0, g=0, b=0, a=0)
            self.text = ""

    class _MarkerArray:
        def __init__(self):
            self.markers = []

    vis_msg.Marker = _Marker
    vis_msg.MarkerArray = _MarkerArray
    vis.msg = vis_msg
    for name, mod in [("rospy", rospy), ("sensor_msgs", sensor),
                      ("sensor_msgs.msg", sensor_msg), ("std_msgs", std),
                      ("std_msgs.msg", std_msg),
                      ("visualization_msgs", vis),
                      ("visualization_msgs.msg", vis_msg)]:
        monkeypatch.setitem(sys.modules, name, mod)


def test_ros_node_end_to_end(tmp_path, monkeypatch):
    node = _load_node()
    cfgp = tmp_path / "cfg.yaml"
    cfgp.write_text(
        """
model:
  type: CenterPoint
  task_num_classes: [1, 2]
  grid_ny: 64
  grid_nx: 64
  voxel_size: [0.4, 0.4, 8.0]
  pc_range: [-12.8, -12.8, -5.0, 12.8, 12.8, 3.0]
  max_voxels: 512
  max_points_per_voxel: 8
  max_objs: 16
  rpn_filters: [32, 64, 128]
  rpn_up_filters: [32, 32, 32]
"""
    )
    rng = np.random.RandomState(0)
    pts = np.concatenate([rng.uniform(-10, 10, (800, 3)),
                          rng.uniform(0, 1, (800, 1))], -1)
    state = {"msg": _FakeCloud(pts)}
    _install_fake_ros(monkeypatch, state)
    node.main(["--config", str(cfgp), "--topic", "/points_raw",
               "--score", "-1.0", "--max-points", "1024",
               "--num-features", "5"])
    assert state["node"] == "minddet_tpu_ros_node"
    topics = dict((t, m) for t, m in state["published"])
    assert "minddet/boxes" in topics and "minddet/detections" in topics
    det = json.loads(topics["minddet/detections"].data)
    assert np.isfinite(np.asarray(det["boxes"], np.float64)).all()
    assert len(det["scores"]) == len(topics["minddet/boxes"].markers)
    assert det["latency_s"] > 0
