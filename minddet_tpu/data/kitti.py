"""KITTI dataset plumbing: label/calib parsing, infos, record materialization.

Host-side equivalent of the reference's ``pointpillars/src/create_data.py`` +
``kitti_common.py`` (infos pkl, reduced clouds, GT database): plain-text label
and calib parsing, camera->lidar box conversion, and ArrayRecord
materialization of (points, boxes, labels) examples. Voxelization and target
assignment happen ON DEVICE at train time (``ops.voxelize``, ``ops.anchors``),
so records stay raw and small.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from minddet_tpu.core.registry import DATASETS
from minddet_tpu.data.records import RecordDataset, write_records

KITTI_CLASSES = ("Car", "Pedestrian", "Cyclist", "Van", "Truck",
                 "Person_sitting", "Tram", "Misc")


def parse_label_file(path: str) -> List[Dict[str, Any]]:
    """KITTI label txt -> list of object dicts (camera-frame boxes)."""
    objs = []
    with open(path) as f:
        for line in f:
            p = line.strip().split(" ")
            if len(p) < 15 or p[0] == "DontCare" and len(p) < 15:
                continue
            objs.append(
                {
                    "name": p[0],
                    "truncated": float(p[1]),
                    "occluded": int(p[2]),
                    "alpha": float(p[3]),
                    "bbox": np.array([float(x) for x in p[4:8]], np.float32),
                    "dimensions": np.array(  # h, w, l in file -> store l, h, w
                        [float(p[10]), float(p[8]), float(p[9])], np.float32
                    ),
                    "location": np.array([float(x) for x in p[11:14]], np.float32),
                    "rotation_y": float(p[14]),
                }
            )
    return objs


def parse_calib_file(path: str) -> Dict[str, np.ndarray]:
    """KITTI calib txt -> dict of matrices (P2, R0_rect, Tr_velo_to_cam)."""
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            out[k.strip()] = np.array([float(x) for x in v.split()], np.float32)
    calib = {}
    if "P2" in out:
        calib["P2"] = out["P2"].reshape(3, 4)
    if "R0_rect" in out:
        r = np.eye(4, dtype=np.float32)
        r[:3, :3] = out["R0_rect"].reshape(3, 3)
        calib["R0_rect"] = r
    if "Tr_velo_to_cam" in out:
        t = np.eye(4, dtype=np.float32)
        t[:3, :4] = out["Tr_velo_to_cam"].reshape(3, 4)
        calib["Tr_velo_to_cam"] = t
    return calib


def camera_to_lidar_boxes(objs: List[Dict], calib: Dict[str, np.ndarray]) -> np.ndarray:
    """Camera-frame KITTI objects -> (N, 7) lidar boxes [x,y,z,w,l,h,yaw].

    z is the box bottom (SECOND convention); yaw = -ry - pi/2 per the standard
    camera->lidar rotation relation.
    """
    if not objs:
        return np.zeros((0, 7), np.float32)
    loc = np.stack([o["location"] for o in objs])  # camera x, y(down), z
    dims = np.stack([o["dimensions"] for o in objs])  # l, h, w
    ry = np.array([o["rotation_y"] for o in objs], np.float32)
    # camera -> lidar: invert rect @ velo2cam
    tr = calib["R0_rect"] @ calib["Tr_velo_to_cam"]
    inv = np.linalg.inv(tr)
    pts = np.concatenate([loc, np.ones((len(loc), 1), np.float32)], -1)
    lidar_xyz = (pts @ inv.T)[:, :3]
    l, h, w = dims[:, 0], dims[:, 1], dims[:, 2]
    yaw = -ry - np.pi / 2
    return np.stack(
        [lidar_xyz[:, 0], lidar_xyz[:, 1], lidar_xyz[:, 2], w, l, h, yaw], -1
    ).astype(np.float32)


def read_velodyne(path: str) -> np.ndarray:
    return np.fromfile(path, np.float32).reshape(-1, 4)


def kitti_examples(
    root: str,
    split_ids: Sequence[str],
    classes: Sequence[str] = ("Car",),
    training_dir: str = "training",
) -> Iterator[Dict[str, Any]]:
    """Yield raw record dicts for materialization."""
    name_to_id = {c: i + 1 for i, c in enumerate(classes)}
    for sid in split_ids:
        label = parse_label_file(os.path.join(root, training_dir, "label_2", f"{sid}.txt"))
        calib = parse_calib_file(os.path.join(root, training_dir, "calib", f"{sid}.txt"))
        points = read_velodyne(os.path.join(root, training_dir, "velodyne", f"{sid}.bin"))
        objs = [o for o in label if o["name"] in name_to_id]
        boxes = camera_to_lidar_boxes(objs, calib)
        yield {
            "points": points,
            "gt_boxes": boxes,
            "gt_classes": np.array([name_to_id[o["name"]] for o in objs], np.int32),
            "frame_id": np.frombuffer(sid.encode().ljust(16), np.uint8).copy(),
            "P2": calib.get("P2", np.zeros((3, 4), np.float32)),
        }


def create_kitti_records(
    root: str, split_file: str, out_prefix: str,
    classes: Sequence[str] = ("Car",),
) -> List[str]:
    with open(split_file) as f:
        ids = [l.strip() for l in f if l.strip()]
    return write_records(out_prefix, kitti_examples(root, ids, classes))


@DATASETS.register_module()
class KittiDetection:
    """Record-backed KITTI dataset -> fixed-shape host examples.

    Each example: points (max_points, 4) padded + mask, gt_boxes (max_gt, 7),
    gt_classes, gt_mask. The fused device step voxelizes + assigns targets.
    """

    def __init__(
        self,
        record_pattern: str,
        max_points: int = 20000,
        max_gt: int = 40,
        gt_sampler=None,
        augment: bool = False,
        seed: int = 0,
    ):
        self.records = RecordDataset(record_pattern)
        self.max_points = max_points
        self.max_gt = max_gt
        self.gt_sampler = gt_sampler
        self.augment = augment
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rec = self.records[idx]
        points = rec["points"]
        boxes = rec["gt_boxes"]
        classes = rec["gt_classes"]
        if self.gt_sampler is not None:
            points, boxes, classes = self.gt_sampler.sample(
                self._rng, points, boxes, classes
            )
        if self.augment:
            points, boxes = global_augment(self._rng, points, boxes)

        n = min(len(points), self.max_points)
        p = np.zeros((self.max_points, points.shape[-1]), np.float32)
        sel = self._rng.permutation(len(points))[:n] if len(points) > n else slice(0, n)
        p[:n] = points[sel]
        g = min(len(boxes), self.max_gt)
        gb = np.zeros((self.max_gt, 7), np.float32)
        gc = np.zeros((self.max_gt,), np.int32)
        gm = np.zeros((self.max_gt,), bool)
        gb[:g] = boxes[:g]
        gc[:g] = classes[:g]
        gm[:g] = True
        return {
            "points": p,
            "points_mask": (np.arange(self.max_points) < n),
            "gt_boxes": gb,
            "gt_classes": gc,
            "gt_mask": gm,
        }


def global_augment(
    rng: np.random.RandomState,
    points: np.ndarray,
    boxes: np.ndarray,
    rot_range=(-np.pi / 4, np.pi / 4),
    scale_range=(0.95, 1.05),
    flip_prob: float = 0.5,
) -> tuple:
    """Global flip/rotate/scale of scene + boxes (reference prep_pointcloud's
    global aug stage, pointpillars/src/data/preprocess.py:12-251)."""
    points = points.copy()
    boxes = boxes.copy() if len(boxes) else boxes
    if rng.rand() < flip_prob:  # flip over x axis (y -> -y)
        points[:, 1] = -points[:, 1]
        if len(boxes):
            boxes[:, 1] = -boxes[:, 1]
            boxes[:, 6] = -boxes[:, 6]
    ang = rng.uniform(*rot_range)
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -s], [s, c]], np.float32)
    points[:, :2] = points[:, :2] @ rot.T
    if len(boxes):
        boxes[:, :2] = boxes[:, :2] @ rot.T
        boxes[:, 6] += ang
    sc = rng.uniform(*scale_range)
    points[:, :3] *= sc
    if len(boxes):
        boxes[:, :6] *= sc
    return points, boxes
