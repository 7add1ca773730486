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
    boxes, classes, npts = [], [], []
    for lb in labels:
        cx, cy, cz = lb["center"]
        l, w, h = lb["size"]
        boxes.append([cx, cy, cz - h / 2.0, w, l, h, lb["heading"]])
        classes.append(int(lb["type"]))
        npts.append(int(lb.get("num_points", 100)))
    return {
        "points": np.asarray(points, np.float32),
        "gt_boxes": np.asarray(boxes, np.float32).reshape(-1, 7),
        "gt_classes": np.asarray(classes, np.int32),
        "num_points_in_gt": np.asarray(npts, np.int32),
    }


# raw proto Label.Type -> 1-based index into WAYMO_CLASSES: the proto
# enumerates {0 UNKNOWN, 1 VEHICLE, 2 PEDESTRIAN, 3 SIGN, 4 CYCLIST};
# the detection task drops SIGN/UNKNOWN and compacts CYCLIST to 3
# (reference waymo_decoder.py extract_objects does the same filtering)
_TYPE_MAP = {1: 1, 2: 2, 4: 3}


def decode_waymo_frame(frame, frame_utils, max_points: int) -> Dict[str, Any]:
    """One parsed Frame proto -> a raw record dict.

    ``frame_utils`` is the waymo toolkit module (or a test double with the
    same ``parse_range_image_and_camera_projection`` /
    ``convert_range_image_to_point_cloud`` API).
    """
    ri, cp, _ = frame_utils.parse_range_image_and_camera_projection(frame)
    # keep_polar_features prepends (range, intensity, elongation) to xyz:
    # reorder to the configs' 5-feature layout [x, y, z, intensity,
    # elongation] (configs/centerpoint_pp_waymo.yaml num_features: 5,
    # matching the reference decoder's points[..., 3:5])
    pts, _ = frame_utils.convert_range_image_to_point_cloud(
        frame, ri, cp, keep_polar_features=True)
    raw = np.concatenate(pts, axis=0)[:max_points]
    points = raw[:, [3, 4, 5, 1, 2]]
    labels = [
        {
            "center": (lb.box.center_x, lb.box.center_y, lb.box.center_z),
            "size": (lb.box.length, lb.box.width, lb.box.height),
            "heading": lb.box.heading,
            "type": _TYPE_MAP[lb.type],
            "num_points": lb.num_lidar_points_in_box,
        }
        for lb in frame.laser_labels
        if lb.type in _TYPE_MAP
    ]
    return waymo_frame_to_example(points, labels)


def convert_waymo_tfrecords(
    tfrecord_paths: Sequence[str],
    out_prefix: str,
    max_points: int = 180000,
    _modules: Optional[Dict[str, Any]] = None,
) -> List[str]:
    """Offline conversion of Waymo Frame TFRecords -> ArrayRecord shards.

    Requires tensorflow + the waymo_open_dataset proto (only at conversion
    time). Raises a clear error if the proto package is unavailable.
    ``_modules`` injects {'tf', 'dataset_pb2', 'frame_utils'} doubles so the
    decode path is testable without the toolkit (tests/test_waymo.py).
    """
    if _modules is None:
        try:  # pragma: no cover - conversion-time only
            import tensorflow as tf
            from waymo_open_dataset import dataset_pb2
            from waymo_open_dataset.utils import frame_utils
        except ImportError as e:
            raise ImportError(
                "convert_waymo_tfrecords needs tensorflow + "
                "waymo_open_dataset (conversion-time only); install them on "
                "the prep machine"
            ) from e
    else:
        tf = _modules["tf"]
        dataset_pb2 = _modules["dataset_pb2"]
        frame_utils = _modules["frame_utils"]

    def examples() -> Iterator[Dict[str, Any]]:
        for path in tfrecord_paths:
            for data in tf.data.TFRecordDataset(path, compression_type=""):
                frame = dataset_pb2.Frame()
                frame.ParseFromString(bytes(data.numpy()))
                yield decode_waymo_frame(frame, frame_utils, max_points)

    return write_records(out_prefix, examples())


@DATASETS.register_module()
class WaymoDetection:
    """Record-backed Waymo dataset -> fixed-shape host examples.

    Same host contract as ``NuScenesDetection`` (the model side is the same
    CenterPoint): points (max_points, F) padded + mask, gt_boxes (max_gt, 9)
    — records store 7D Waymo boxes; a zero (vx, vy) pair is inserted so the
    shared velocity-aware CenterHead/augmentation path applies unchanged
    (Waymo labels carry no velocity; the vel code-weight is simply wasted,
    matching det3d's no-velocity waymo task) — gt_classes 1-based into
    ``WAYMO_CLASSES``, gt_mask. ``gt_sampler``/``augment`` mirror the
    nuScenes recipe (reference ``det3d_ms/datasets/waymo/waymo.py:7`` routes
    through the same Preprocess pipeline).
    """

    def __init__(
        self,
        record_pattern: str,
        max_points: int = 160000,
        max_gt: int = 200,
        augment: bool = False,
        gt_sampler=None,
        seed: int = 0,
    ):
        self.records = RecordDataset(record_pattern)
        self.max_points = max_points
        self.max_gt = max_gt
        self.augment = augment
        self.gt_sampler = gt_sampler
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        from minddet_tpu.data.nuscenes import global_augment_3d

        rec = self.records[idx]
        points = np.asarray(rec["points"], np.float32)
        boxes7 = np.asarray(rec["gt_boxes"], np.float32).reshape(-1, 7)
        classes = np.asarray(rec["gt_classes"], np.int32)
        if self.gt_sampler is not None:  # database holds the records' 7D boxes
            points, boxes7, classes = self.gt_sampler.sample(
                self._rng, points, boxes7, classes
            )
        # 7D [x,y,z_bottom,...] -> 9D z-CENTER zero-velocity boxes (the
        # CenterPoint target/9D-augment convention, data/nuscenes.py)
        if len(boxes7):
            boxes = np.concatenate(
                [boxes7[:, :2], (boxes7[:, 2] + boxes7[:, 5] / 2)[:, None],
                 boxes7[:, 3:6], np.zeros((len(boxes7), 2), np.float32),
                 boxes7[:, 6:7]], axis=1,
            )
        else:
            boxes = np.zeros((0, 9), np.float32)
        if self.augment:
            points, boxes = global_augment_3d(self._rng, points, boxes)

        n = min(len(points), self.max_points)
        p = np.zeros((self.max_points, points.shape[-1]), np.float32)
        sel = (
            self._rng.permutation(len(points))[:n]
            if len(points) > n else slice(0, n)
        )
        p[:n] = points[sel]
        g = min(len(boxes), self.max_gt)
        gb = np.zeros((self.max_gt, 9), np.float32)
        gc = np.zeros((self.max_gt,), np.int32)
        gm = np.zeros((self.max_gt,), bool)
        gb[:g] = boxes[:g]
        gc[:g] = classes[:g]
        gm[:g] = True
        out = {
            "points": p,
            "points_mask": (np.arange(self.max_points) < n),
            "gt_boxes": gb,
            "gt_classes": gc,
            "gt_mask": gm,
        }
        if "num_points_in_gt" in rec:
            npts = np.full((self.max_gt,), 100, np.int32)
            src = np.asarray(rec["num_points_in_gt"], np.int32)
            k = min(g, len(src))  # pasted GT-AUG objects keep the default
            npts[:k] = src[:k]
            out["gt_num_points"] = npts
        return out
