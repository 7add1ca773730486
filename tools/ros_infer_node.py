"""Live ROS inference node: PointCloud2 in -> 3D detections out.

TPU-native counterpart of the reference's
``centerpoint/tools_ms/single_infernece_ros.py:67-260`` (Processor_ROS +
rslidar_callback): subscribe a lidar topic, run the ONE fused device program
(voxelize + PFN + RPN + heads + decode + rotated NMS,
``model.predict_from_points``) per cloud, and publish the kept boxes. The
reference publishes jsk ``BoundingBoxArray``; this node publishes the
equivalent as standard ``visualization_msgs/MarkerArray`` cubes (no jsk
dependency) plus a ``std_msgs/String`` JSON detail topic.

rospy is not installable in training images (true for the reference too);
the node imports it lazily and everything around it — cloud decode, fixed
-capacity padding, the jitted predict, marker building — is importable and
tested with a faked rospy (``tests/test_ros_node.py``).

    python tools/ros_infer_node.py --config configs/centerpoint_pp_nusc.yaml \
        --checkpoint runs/cp/ckpt --topic /points_raw --score 0.3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Dict, Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pointcloud2_to_points(msg, num_features: int = 5) -> np.ndarray:
    """Decode a sensor_msgs/PointCloud2 into (N, num_features) float32.

    Reads x/y/z (+intensity when present) from the message's field offsets
    (the reference's ``get_xyz_points``/``pointcloud2_to_array`` role);
    missing extra features (intensity, sweep dt / elongation) pad with 0.
    NaN rows are dropped.
    """
    fields = {f.name: f for f in msg.fields}
    n = msg.width * msg.height
    raw = np.frombuffer(bytes(msg.data), dtype=np.uint8).reshape(
        n, msg.point_step)

    def read(name):
        f = fields.get(name)
        if f is None:
            return np.zeros(n, np.float32)
        return raw[:, f.offset:f.offset + 4].copy().view(np.float32)[:, 0]

    cols = [read("x"), read("y"), read("z")]
    if num_features >= 4:
        cols.append(read("intensity"))
    while len(cols) < num_features:
        cols.append(np.zeros(n, np.float32))
    pts = np.stack(cols, -1)
    return pts[np.isfinite(pts[:, :3]).all(axis=1)]


def pad_points(points: np.ndarray, max_points: int):
    """Fixed-capacity padding: ONE compiled program serves every cloud."""
    out = np.zeros((1, max_points, points.shape[-1]), np.float32)
    n = min(len(points), max_points)
    out[0, :n] = points[:n]
    mask = np.zeros((1, max_points), bool)
    mask[0, :n] = True
    return out, mask


def detections_to_markers(boxes: np.ndarray, scores: np.ndarray,
                          labels: np.ndarray, frame_id: str, stamp=None,
                          score_threshold: float = 0.3):
    """Kept detections -> visualization_msgs/MarkerArray CUBE markers
    (the reference's per-box BoundingBox fill, single_infernece_ros.py:
    rslidar_callback)."""
    from visualization_msgs.msg import Marker, MarkerArray

    arr = MarkerArray()
    keep = np.nonzero(scores > score_threshold)[0]
    for mi, i in enumerate(keep):
        m = Marker()
        m.header.frame_id = frame_id
        if stamp is not None:
            m.header.stamp = stamp
        m.id = int(mi)
        m.type = Marker.CUBE
        m.action = Marker.ADD
        x, y, z = (float(v) for v in boxes[i, :3])
        w, l, h = (float(v) for v in boxes[i, 3:6])
        yaw = float(boxes[i, -1])
        m.pose.position.x, m.pose.position.y, m.pose.position.z = x, y, z
        m.pose.orientation.z = float(np.sin(yaw / 2.0))
        m.pose.orientation.w = float(np.cos(yaw / 2.0))
        m.scale.x, m.scale.y, m.scale.z = l, w, h
        m.color.a, m.color.g = 0.4, 1.0
        m.text = f"{int(labels[i])}:{float(scores[i]):.2f}"
        arr.markers.append(m)
    return arr


class RosProcessor:
    """Model + jitted predict behind a callback (Processor_ROS role)."""

    def __init__(self, config_path: str, checkpoint: Optional[str],
                 max_points: int = 120000, num_features: int = 5):
        import jax
        import jax.numpy as jnp

        from minddet_tpu.core.config import Config
        from minddet_tpu.core.registry import DETECTORS
        import minddet_tpu.train.train  # noqa: F401 (registry)

        cfg = Config.fromfile(config_path)
        self.model = DETECTORS.build(dict(cfg.model))
        self.max_points = max_points
        self.num_features = num_features
        variables = self.model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 256, num_features)), jnp.ones((1, 256), bool),
            method=self.model.predict_from_points)
        if checkpoint:
            from minddet_tpu.core.checkpoint import load_pytree

            restored = load_pytree(checkpoint)
            variables = {"params": restored["params"],
                         "batch_stats": restored.get("batch_stats", {})}
        self._variables = variables

        @jax.jit
        def _predict(points, mask):
            return self.model.apply(variables, points, mask,
                                    method=self.model.predict_from_points)

        self._predict = _predict

    def run(self, points: np.ndarray) -> Dict[str, np.ndarray]:
        p, m = pad_points(points, self.max_points)
        out = self._predict(p, m)
        return {k: np.asarray(v[0]) for k, v in out.items()}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="minddet_tpu ROS inference node")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--topic", default="/points_raw")
    p.add_argument("--frame-id", default="lidar")
    p.add_argument("--score", type=float, default=0.3)
    p.add_argument("--max-points", type=int, default=120000)
    p.add_argument("--num-features", type=int, default=5)
    args = p.parse_args(argv)

    import rospy  # lazy: unavailable in training images, like the reference
    from sensor_msgs.msg import PointCloud2
    from std_msgs.msg import String
    from visualization_msgs.msg import MarkerArray

    proc = RosProcessor(args.config, args.checkpoint,
                        max_points=args.max_points,
                        num_features=args.num_features)
    rospy.init_node("minddet_tpu_ros_node")
    pub_markers = rospy.Publisher("minddet/boxes", MarkerArray, queue_size=1)
    pub_json = rospy.Publisher("minddet/detections", String, queue_size=1)

    def callback(msg):
        t0 = time.time()
        pts = pointcloud2_to_points(msg, args.num_features)
        out = proc.run(pts)
        markers = detections_to_markers(
            out["boxes"], out["scores"], out["labels"],
            args.frame_id, getattr(msg.header, "stamp", None), args.score)
        pub_markers.publish(markers)
        keep = out["scores"] > args.score
        pub_json.publish(String(data=json.dumps({
            "boxes": out["boxes"][keep].tolist(),
            "scores": out["scores"][keep].tolist(),
            "labels": out["labels"][keep].tolist(),
            "latency_s": time.time() - t0,
        })))
        rospy.loginfo("minddet_tpu: %d dets in %.3fs",
                      int(keep.sum()), time.time() - t0)

    rospy.Subscriber(args.topic, PointCloud2, callback, queue_size=1,
                     buff_size=2 ** 24)
    rospy.spin()


if __name__ == "__main__":
    main()
