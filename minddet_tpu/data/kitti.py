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
            if len(p) < 15:  # DontCare rows have all 15 fields and are KEPT
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


# ---------------------------------------------------------------------------
# lidar -> camera projection (counterpart of the reference's
# ``box_lidar_to_camera`` + bbox projection feeding ``predict_kitti_to_anno``,
# pointpillars/src/predict.py:331-396)
# ---------------------------------------------------------------------------

def lidar_box_to_camera(boxes7: np.ndarray, trv2c_rect: np.ndarray) -> np.ndarray:
    """(N, 7) lidar [x,y,z_bottom,w,l,h,yaw] -> camera [x,y,z,l,h,w,ry].

    KITTI camera location is the box-bottom center (camera y points down);
    ry = -yaw - pi/2 (inverse of ``camera_to_lidar_boxes``)."""
    n = len(boxes7)
    if n == 0:
        return np.zeros((0, 7), np.float32)
    xyz1 = np.concatenate([boxes7[:, :3], np.ones((n, 1), np.float32)], -1)
    cam = (xyz1 @ trv2c_rect.T)[:, :3]
    dims = boxes7[:, [4, 5, 3]]  # l, h, w
    ry = -boxes7[:, 6] - np.pi / 2
    return np.concatenate([cam, dims, ry[:, None]], -1).astype(np.float32)


def camera_box_corners(cam_boxes: np.ndarray) -> np.ndarray:
    """(N, 7) camera [x,y,z,l,h,w,ry] -> (N, 8, 3) corners.

    Location is the bottom-face center; camera y points down so the box
    spans y in [-h, 0]; rotation is about the camera y axis."""
    n = len(cam_boxes)
    l, h, w = cam_boxes[:, 3], cam_boxes[:, 4], cam_boxes[:, 5]
    x = np.stack([l / 2, l / 2, -l / 2, -l / 2] * 2, -1)
    z = np.stack([w / 2, -w / 2, -w / 2, w / 2] * 2, -1)
    y = np.stack([np.zeros_like(h)] * 4 + [-h] * 4, -1)
    ry = cam_boxes[:, 6]
    c, s = np.cos(ry)[:, None], np.sin(ry)[:, None]
    xr = c * x + s * z
    zr = -s * x + c * z
    corners = np.stack([xr, y, zr], -1)  # (N, 8, 3)
    return corners + cam_boxes[:, None, :3]


def project_camera_to_image(pts: np.ndarray, p2: np.ndarray) -> np.ndarray:
    """(..., 3) camera points -> (..., 2) pixel coords via P2."""
    hom = pts @ p2[:, :3].T + p2[:, 3]
    return hom[..., :2] / np.maximum(hom[..., 2:3], 1e-6)


def detections_to_kitti_annos(
    boxes7: np.ndarray,
    scores: np.ndarray,
    labels: np.ndarray,
    classes: Sequence[str],
    trv2c_rect: np.ndarray,
    p2: np.ndarray,
    img_shape: Sequence[int],
) -> Dict[str, np.ndarray]:
    """Lidar detections -> full KITTI anno (camera boxes, projected image
    bbox clipped to the frame, alpha), the quantities the official bbox-AP /
    AOS protocol scores (``predict_kitti_to_anno``, predict.py:331-396).

    Detections whose camera z is behind the plane or whose projected bbox
    falls entirely outside the image are dropped (predict.py:365-374)."""
    cam = lidar_box_to_camera(boxes7, trv2c_rect)
    ih, iw = int(img_shape[0]), int(img_shape[1])
    keep = cam[:, 2] > 0.1
    cam, boxes7 = cam[keep], boxes7[keep]
    scores, labels = np.asarray(scores)[keep], np.asarray(labels)[keep]
    uv = project_camera_to_image(camera_box_corners(cam), p2)  # (N, 8, 2)
    bbox = np.concatenate([uv.min(1), uv.max(1)], -1) if len(uv) else np.zeros((0, 4))
    inside = np.ones(len(cam), bool)
    if len(cam):
        inside = ~(
            (bbox[:, 0] > iw) | (bbox[:, 1] > ih) | (bbox[:, 2] < 0) | (bbox[:, 3] < 0)
        )
    cam, boxes7, bbox = cam[inside], boxes7[inside], bbox[inside]
    scores, labels = scores[inside], labels[inside]
    bbox[:, 0::2] = np.clip(bbox[:, 0::2], 0, iw)
    bbox[:, 1::2] = np.clip(bbox[:, 1::2], 0, ih)
    alpha = -np.arctan2(-boxes7[:, 1], boxes7[:, 0]) + cam[:, 6]
    name = np.asarray(
        [classes[int(c)] if 0 <= c < len(classes) else "Car" for c in labels]
    )
    return {
        "name": name,
        "bbox": bbox.astype(np.float32),
        "location": cam[:, :3].astype(np.float32),
        "dimensions": cam[:, 3:6].astype(np.float32),
        "rotation_y": cam[:, 6].astype(np.float32),
        "alpha": alpha.astype(np.float32),
        "occluded": np.zeros(len(cam), np.int64),
        "truncated": np.zeros(len(cam), np.float32),
        "score": scores.astype(np.float32),
    }


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
        trv2c_rect = (
            calib["R0_rect"] @ calib["Tr_velo_to_cam"]
            if "R0_rect" in calib and "Tr_velo_to_cam" in calib
            else np.eye(4, dtype=np.float32)
        )
        img_shape = np.asarray([375, 1242], np.int32)  # KITTI default
        img_path = os.path.join(root, training_dir, "image_2", f"{sid}.png")
        if os.path.exists(img_path):
            try:
                import cv2

                img = cv2.imread(img_path)
                if img is not None:
                    img_shape = np.asarray(img.shape[:2], np.int32)
            except ImportError:
                pass
        # full camera-frame label record (incl. DontCare) — the official
        # bbox-AP/AOS protocol needs the original 2D boxes, alpha, and
        # occlusion/truncation for difficulty filtering
        n_all = len(label)
        yield {
            "points": points,
            "gt_boxes": boxes,
            "gt_classes": np.array([name_to_id[o["name"]] for o in objs], np.int32),
            "frame_id": np.frombuffer(sid.encode().ljust(16), np.uint8).copy(),
            "P2": calib.get("P2", np.zeros((3, 4), np.float32)),
            "Trv2c_rect": trv2c_rect.astype(np.float32),
            "img_shape": img_shape,
            "anno_name": np.array([o["name"] for o in label], dtype="U16"),
            "anno_bbox": (
                np.stack([o["bbox"] for o in label]).astype(np.float32)
                if n_all else np.zeros((0, 4), np.float32)
            ),
            "anno_alpha": np.array([o["alpha"] for o in label], np.float32),
            "anno_occluded": np.array([o["occluded"] for o in label], np.int64),
            "anno_truncated": np.array([o["truncated"] for o in label], np.float32),
            "anno_location": (
                np.stack([o["location"] for o in label]).astype(np.float32)
                if n_all else np.zeros((0, 3), np.float32)
            ),
            "anno_dimensions": (
                np.stack([o["dimensions"] for o in label]).astype(np.float32)
                if n_all else np.zeros((0, 3), np.float32)
            ),
            "anno_rotation_y": np.array(
                [o["rotation_y"] for o in label], np.float32
            ),
        }


def create_kitti_records(
    root: str, split_file: str, out_prefix: str,
    classes: Sequence[str] = ("Car",),
) -> List[str]:
    with open(split_file) as f:
        ids = [l.strip() for l in f if l.strip()]
    return write_records(out_prefix, kitti_examples(root, ids, classes))


def noise_per_object(
    rng: np.random.RandomState,
    boxes: np.ndarray,
    points: np.ndarray,
    valid_mask: Optional[np.ndarray] = None,
    rotation_perturb=(-np.pi / 20, np.pi / 20),
    center_noise_std=(0.25, 0.25, 0.25),
    num_try: int = 100,
) -> tuple:
    """Per-object pose perturbation with collision rejection.

    Counterpart of the reference's ``noise_per_object``
    (``pointpillars/src/core/preprocess.py:560-668``; car recipe per
    ``configs/car_xyres16.yaml:19-23``: yaw ±0.157 rad, loc std 0.25 m,
    group/global-rot variants disabled). For each valid GT box, ``num_try``
    candidate (rotation about the box center, translation) perturbations are
    drawn; the first whose noised BEV footprint does not intersect any other
    box (earlier boxes at their already-noised pose) is applied to the box
    and to the points inside it. The collision test is a batched rotated-IoU
    matrix via the native host ops instead of the reference's numba
    corner-intersection scan.

    Returns (points, boxes) copies; inputs are not mutated.
    """
    boxes = np.array(boxes, np.float32, copy=True)
    points = np.array(points, np.float32, copy=True)
    n = len(boxes)
    if n == 0 or len(points) == 0:
        return points, boxes
    if valid_mask is None:
        valid_mask = np.ones(n, bool)
    from minddet_tpu.ops import host_ops

    loc_noises = rng.normal(
        scale=center_noise_std, size=(n, num_try, 3)
    ).astype(np.float32)
    rot_noises = rng.uniform(
        rotation_perturb[0], rotation_perturb[1], size=(n, num_try)
    ).astype(np.float32)

    bev = boxes[:, [0, 1, 3, 4, 6]].copy()  # working copy, updated on accept
    sel_loc = np.zeros((n, 3), np.float32)
    sel_rot = np.zeros((n,), np.float32)
    applied = np.zeros(n, bool)
    for i in range(n):
        if not valid_mask[i]:
            continue
        cand = np.tile(bev[i], (num_try, 1))
        cand[:, :2] += loc_noises[i, :, :2]
        cand[:, 4] += rot_noises[i]
        iou = host_ops.rotated_iou_matrix(cand, bev)  # (num_try, n)
        iou[:, i] = 0.0
        ok = iou.max(axis=1) <= 0.0
        j = int(np.argmax(ok))
        if not ok[j]:
            continue  # every candidate collides: leave this box unperturbed
        sel_loc[i], sel_rot[i] = loc_noises[i, j], rot_noises[i, j]
        applied[i] = True
        bev[i] = cand[j]

    if not applied.any():
        return points, boxes
    # move the points inside each ORIGINAL box with it (first-box-wins,
    # like the reference's points_transform_ break-after-first)
    orig_bev = boxes[:, [0, 1, 3, 4, 6]]
    inside = host_ops.points_in_rboxes(points[:, :2], orig_bev)
    zok = (points[:, 2:3] >= boxes[None, :, 2]) & (
        points[:, 2:3] <= boxes[None, :, 2] + boxes[None, :, 5]
    )
    inside = inside & zok & applied[None, :]
    has_owner = inside.any(axis=1)
    owner = np.argmax(inside, axis=1)
    for i in np.nonzero(applied)[0]:
        pm = has_owner & (owner == i)
        if not pm.any():
            continue
        c, s = np.cos(sel_rot[i]), np.sin(sel_rot[i])
        rel = points[pm, :2] - boxes[i, :2]
        points[pm, 0] = c * rel[:, 0] - s * rel[:, 1] + boxes[i, 0]
        points[pm, 1] = s * rel[:, 0] + c * rel[:, 1] + boxes[i, 1]
        points[pm, :3] += sel_loc[i]
    boxes[applied, :3] += sel_loc[applied]
    boxes[applied, 6] += sel_rot[applied]
    return points, boxes


@DATASETS.register_module()
class KittiDetection:
    """Record-backed KITTI dataset -> fixed-shape host examples.

    Each example: points (max_points, 4) padded + mask, gt_boxes (max_gt, 7),
    gt_classes, gt_mask. The fused device step voxelizes + assigns targets.

    With ``gt_sampler`` + ``object_noise`` + ``augment`` set, ``__getitem__``
    runs the full reference training recipe in order (``prep_pointcloud``,
    ``pointpillars/src/data/preprocess.py:97-170``): DB-sample -> per-object
    noise -> global flip/rotate/scale/translate. Voxelize + anchor-mask +
    assign stay on device.
    """

    def __init__(
        self,
        record_pattern: str,
        max_points: int = 20000,
        max_gt: int = 40,
        gt_sampler=None,
        augment: bool = False,
        object_noise: Optional[Dict[str, Any]] = None,
        keep_raw: bool = False,
        seed: int = 0,
    ):
        self.records = RecordDataset(record_pattern)
        self.max_points = max_points
        self.max_gt = max_gt
        self.gt_sampler = gt_sampler
        self.augment = augment
        self.object_noise = object_noise
        self.keep_raw = keep_raw
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
        if self.object_noise is not None:
            points, boxes = noise_per_object(
                self._rng, boxes, points, **self.object_noise
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
        out = {
            "points": p,
            "points_mask": (np.arange(self.max_points) < n),
            "gt_boxes": gb,
            "gt_classes": gc,
            "gt_mask": gm,
        }
        if self.keep_raw:  # eval path: calib + original camera-frame labels
            for k, v in rec.items():
                if k.startswith("anno_") or k in (
                    "P2", "Trv2c_rect", "img_shape", "frame_id"
                ):
                    out[k] = v
        return out


def global_augment(
    rng: np.random.RandomState,
    points: np.ndarray,
    boxes: np.ndarray,
    rot_range=(-np.pi / 4, np.pi / 4),
    scale_range=(0.95, 1.05),
    flip_prob: float = 0.5,
    translate_std=(0.2, 0.2, 0.2),
) -> tuple:
    """Global flip/rotate/scale/translate of scene + boxes (reference
    prep_pointcloud's global aug stage, incl. ``global_translate``;
    pointpillars/src/data/preprocess.py:153-160)."""
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
    t = rng.normal(scale=translate_std, size=3).astype(np.float32)
    points[:, :3] += t
    if len(boxes):
        boxes[:, :3] += t
    return points, boxes
