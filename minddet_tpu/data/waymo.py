"""Waymo Open Dataset loaders (TFRecord frame decode + record materialization).

Counterpart of the reference's ``det3d_ms/datasets/waymo/`` (waymo_decoder.py,
waymo_common.py): decodes range-image-free fields (laser point clouds already
extracted by the official toolkit are also accepted) from Frame protos into
the same raw-record layout as KITTI/nuScenes here. TensorFlow is only needed
for the offline conversion step and is imported lazily; training reads plain
ArrayRecords with zero TF dependence.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from minddet_tpu.core.registry import DATASETS
from minddet_tpu.data.records import RecordDataset, write_records

WAYMO_CLASSES = ("VEHICLE", "PEDESTRIAN", "CYCLIST")


def waymo_frame_to_example(points: np.ndarray, labels: Sequence[Dict]) -> Dict[str, Any]:
    """Build a raw record from extracted points + label dicts.

    ``labels``: [{'center': (3,), 'size': (3,) wlh? (l, w, h), 'heading': f,
    'type': int 1..3, 'num_points': int}] — the fields of
    waymo Label.Box. Boxes are stored [x, y, z_bottom, w, l, h, yaw].
    """
    boxes, classes = [], []
    for lb in labels:
        cx, cy, cz = lb["center"]
        l, w, h = lb["size"]
        boxes.append([cx, cy, cz - h / 2.0, w, l, h, lb["heading"]])
        classes.append(int(lb["type"]))
    return {
        "points": np.asarray(points, np.float32),
        "gt_boxes": np.asarray(boxes, np.float32).reshape(-1, 7),
        "gt_classes": np.asarray(classes, np.int32),
    }


def convert_waymo_tfrecords(
    tfrecord_paths: Sequence[str], out_prefix: str, max_points: int = 180000
) -> List[str]:
    """Offline conversion of Waymo Frame TFRecords -> ArrayRecord shards.

    Requires tensorflow + the waymo_open_dataset proto (only at conversion
    time). Raises a clear error if the proto package is unavailable.
    """
    try:
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2
    except ImportError as e:  # pragma: no cover - conversion-time only
        raise ImportError(
            "convert_waymo_tfrecords needs tensorflow + waymo_open_dataset "
            "(conversion-time only); install them on the prep machine"
        ) from e

    def examples() -> Iterator[Dict[str, Any]]:  # pragma: no cover
        for path in tfrecord_paths:
            for data in tf.data.TFRecordDataset(path, compression_type=""):
                frame = dataset_pb2.Frame()
                frame.ParseFromString(bytes(data.numpy()))
                # points must be pre-extracted by the official frame_utils on
                # the prep machine; here we read the top-lidar ri_return1 via
                # the toolkit if present.
                from waymo_open_dataset.utils import frame_utils

                ri, cp, _ = frame_utils.parse_range_image_and_camera_projection(frame)
                pts, _ = frame_utils.convert_range_image_to_point_cloud(frame, ri, cp)
                points = np.concatenate(pts, axis=0)[:max_points]
                labels = [
                    {
                        "center": (lb.box.center_x, lb.box.center_y, lb.box.center_z),
                        "size": (lb.box.length, lb.box.width, lb.box.height),
                        "heading": lb.box.heading,
                        "type": lb.type,
                        "num_points": lb.num_lidar_points_in_box,
                    }
                    for lb in frame.laser_labels
                ]
                yield waymo_frame_to_example(points, labels)

    return write_records(out_prefix, examples())


@DATASETS.register_module()
class WaymoDetection:
    """Record-backed Waymo dataset; same host contract as KittiDetection."""

    def __init__(self, record_pattern: str, max_points: int = 160000, max_gt: int = 200):
        self.records = RecordDataset(record_pattern)
        self.max_points = max_points
        self.max_gt = max_gt

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rec = self.records[idx]
        points = rec["points"]
        n = min(len(points), self.max_points)
        p = np.zeros((self.max_points, points.shape[-1]), np.float32)
        p[:n] = points[:n]
        g = min(len(rec["gt_boxes"]), self.max_gt)
        gb = np.zeros((self.max_gt, 7), np.float32)
        gc = np.zeros((self.max_gt,), np.int32)
        gm = np.zeros((self.max_gt,), bool)
        gb[:g] = rec["gt_boxes"][:g]
        gc[:g] = rec["gt_classes"][:g]
        gm[:g] = True
        return {
            "points": p,
            "points_mask": (np.arange(self.max_points) < n),
            "gt_boxes": gb,
            "gt_classes": gc,
            "gt_mask": gm,
        }
