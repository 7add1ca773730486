"""GT-AUG database sampling: paste ground-truth objects into training scenes.

Host-side by design (stateful database + rejection sampling), like the
reference keeps it (``pointpillars/src/core/sample_ops.py`` 356 LoC,
``centerpoint/det3d_ms/core/sampler/`` 1212 LoC) — but the collision tests run
through the native C++ host ops (``points_in_rboxes``, ``rotated_iou_matrix``)
instead of numba JIT kernels.

Database format: a dict class_name -> list of {points (N, F) object-frame,
box (D,)} built from materialized records. ``D`` is 7 for KITTI
``[x,y,z_bottom,w,l,h,yaw]`` or 9 for nuScenes
``[x,y,z_center,w,l,h,vx,vy,yaw]`` — yaw is always the LAST column, which is
the same invariant the reference's ``sample_class_v2`` relies on
(``gt_boxes[:, -1]`` for BEV corners, sample_ops.py:250-251). Like the
reference's ``dbinfos_train_10sweeps_withvelo.pkl``
(create_gt_database.py:55-62), 9D database entries keep the source scene's
velocity; it rides along when the object is pasted.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from minddet_tpu.ops import host_ops


def _bev(boxes: np.ndarray) -> np.ndarray:
    """(G, D>=7) lidar boxes -> (G, 5) BEV [x, y, w, l, yaw=last col]."""
    return boxes[:, [0, 1, 3, 4, boxes.shape[-1] - 1]]


def build_gt_database(
    dataset,
    class_names: Sequence[str],
    min_points: Union[int, Mapping[str, int]] = 5,
) -> Dict[str, List[Dict]]:
    """Crop per-object point clouds from a record dataset.

    Equivalent of ``create_groundtruth_database`` (det3d_ms/datasets/utils/
    create_gt_database.py): points inside each GT box are stored relative to
    the box origin. Handles both 7D boxes (z = bottom, KITTI/SECOND
    convention) and 9D velocity boxes (z = center, our nuScenes convention;
    see data/nuscenes.py module docstring). ``min_points`` may be a
    per-class dict (the reference's ``filter_by_min_num_points`` db-prep
    step, configs_ms/nusc/pp/...sweep.py:111-123).
    """
    db: Dict[str, List[Dict]] = {c: [] for c in class_names}
    id_to_name = {i + 1: c for i, c in enumerate(class_names)}
    for idx in range(len(dataset)):
        rec = dataset.records[idx] if hasattr(dataset, "records") else dataset[idx]
        points = rec["points"]
        boxes = rec["gt_boxes"]
        classes = rec["gt_classes"]
        if len(boxes) == 0:
            continue
        z_center = boxes.shape[-1] == 9
        inside = host_ops.points_in_rboxes(points[:, :2], _bev(boxes))  # (N, G)
        z_lo = boxes[None, :, 2] - (boxes[None, :, 5] / 2 if z_center else 0)
        zok = (points[:, 2:3] >= z_lo) & (points[:, 2:3] <= z_lo + boxes[None, :, 5])
        inside = inside & zok
        for g in range(len(boxes)):
            name = id_to_name.get(int(classes[g]))
            if name is None:
                continue
            obj_pts = points[inside[:, g]].copy()
            need = (min_points.get(name, 5)
                    if isinstance(min_points, Mapping) else min_points)
            if len(obj_pts) < need:
                continue
            obj_pts[:, :3] -= boxes[g, :3]
            db[name].append({"points": obj_pts.astype(np.float32),
                             "box": boxes[g].astype(np.float32)})
    return db


def save_database(db, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(db, f)


def load_database(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


class DataBaseSampler:
    """Paste sampled GT objects into a scene, rejecting BEV collisions.

    Mirrors the reference's ``DataBaseSamplerV2`` semantics
    (det3d_ms/core/sampler/sample_ops.py:10, 245-291): sample up to
    ``max_per_class[name]`` extra objects of each class (prescribed count
    minus already-present instances, ``sample_all``'s ``sampled_num``), drop
    candidates whose BEV box overlaps existing GT or already-accepted
    samples, remove scene points inside accepted boxes, append object points.
    Box dimensionality follows the database (7D KITTI or 9D nuScenes
    velocity boxes); all BEV geometry keys off yaw-is-last-column, like the
    reference's ``gt_boxes[:, -1]``.
    """

    def __init__(
        self,
        database: Dict[str, List[Dict]],
        max_per_class: Dict[str, int],
        class_ids: Dict[str, int],
    ):
        self.db = {k: v for k, v in database.items() if v}
        self.max_per_class = max_per_class
        self.class_ids = class_ids

    def sample(
        self,
        rng: np.random.RandomState,
        points: np.ndarray,
        gt_boxes: np.ndarray,
        gt_classes: np.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        new_boxes = [gt_boxes] if len(gt_boxes) else []
        new_classes = [gt_classes] if len(gt_classes) else []
        accepted: List[Dict] = []
        occupied = _bev(gt_boxes) if len(gt_boxes) else np.zeros((0, 5), np.float32)

        for name, max_n in self.max_per_class.items():
            pool = self.db.get(name, [])
            if not pool:
                continue
            present = int(np.sum(gt_classes == self.class_ids[name])) if len(gt_classes) else 0
            want = max(0, max_n - present)
            if want == 0:
                continue
            picks = rng.randint(0, len(pool), size=want * 2)  # oversample, reject
            taken = 0
            for pi in picks:
                if taken >= want:
                    break
                cand = pool[pi]
                bev = _bev(cand["box"][None])
                if len(occupied):
                    iou = host_ops.rotated_iou_matrix(bev, occupied)
                    if iou.max() > 1e-3:
                        continue
                occupied = np.concatenate([occupied, bev], 0)
                accepted.append(cand)
                new_boxes.append(cand["box"][None])
                new_classes.append(np.array([self.class_ids[name]], np.int32))
                taken += 1

        if not accepted:
            return points, gt_boxes, gt_classes

        sampled_bev = np.concatenate([_bev(c["box"][None]) for c in accepted])
        # remove scene points inside pasted boxes
        inside = host_ops.points_in_rboxes(points[:, :2], sampled_bev)
        keep = ~inside.any(axis=1)
        scene = points[keep]
        pasted = []
        for c in accepted:
            p = c["points"].copy()
            p[:, :3] += c["box"][:3]
            pasted.append(p)
        all_points = np.concatenate([scene] + pasted, 0)
        return (
            all_points.astype(np.float32),
            np.concatenate(new_boxes, 0).astype(np.float32),
            np.concatenate(new_classes, 0).astype(np.int32),
        )
