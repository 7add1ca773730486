"""Official-protocol KITTI AP evaluator (bbox / BEV / 3D / AOS).

Clean-room reimplementation of the KITTI object benchmark protocol that the
reference vendors twice (numba CPU ``pointpillars/src/core/eval_utils.py`` 702
LoC; numba-CUDA ``eval_gpu/eval.py`` + ``rotate_iou.py``). The AP bookkeeping
(difficulty filtering, don't-care handling, 41-point interpolation) runs in
numpy on the host — it's O(detections) — while every IoU matrix (image bbox,
rotated BEV, rotated 3D) is computed on device with
``minddet_tpu.ops.rotated_iou``, replacing the reference's CUDA
``rotate_iou_gpu_eval`` kernel.

KITTI camera-frame conventions: location = (x, y, z) with y down, dimensions =
(l, h, w), rotation_y around the camera y axis. BEV boxes live in the (x, z)
plane.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from minddet_tpu.ops.box import pairwise_iou
from minddet_tpu.ops.rotated_iou import rotated_iou_bev, rotated_iou_3d

N_SAMPLE_PTS = 41

# difficulty -> (min bbox height px, max occlusion, max truncation)
DIFFICULTY_RULES = {
    0: (40.0, 0, 0.15),
    1: (25.0, 1, 0.30),
    2: (25.0, 2, 0.50),
}

# class -> class treated as "similar" (ignored, not FP) per official devkit
SIMILAR_CLASSES = {"Car": "Van", "Pedestrian": "Person_sitting"}

DEFAULT_MIN_OVERLAPS = {  # (bbox, bev, 3d) moderate thresholds
    "Car": (0.7, 0.7, 0.7),
    "Pedestrian": (0.5, 0.5, 0.5),
    "Cyclist": (0.5, 0.5, 0.5),
    "Van": (0.7, 0.7, 0.7),
    "Truck": (0.7, 0.7, 0.7),
}


def clean_gt(anno: Dict, current_class: str, difficulty: int):
    """Per-image GT filtering -> (ignored_gt, dontcare_boxes, num_valid).

    ignored flag: 0 = counted, 1 = ignored (similar class / harder difficulty),
    -1 = excluded entirely (other classes).
    """
    min_h, max_occ, max_trunc = DIFFICULTY_RULES[difficulty]
    names = anno["name"]
    n = len(names)
    ignored = np.full(n, -1, np.int32)
    heights = anno["bbox"][:, 3] - anno["bbox"][:, 1] if n else np.zeros(0)
    num_valid = 0
    for i in range(n):
        name = names[i]
        if name == current_class:
            too_hard = (
                anno["occluded"][i] > max_occ
                or anno["truncated"][i] > max_trunc
                or heights[i] < min_h
            )
            if too_hard:
                ignored[i] = 1
            else:
                ignored[i] = 0
                num_valid += 1
        elif name == SIMILAR_CLASSES.get(current_class):
            ignored[i] = 1
    dc = anno["bbox"][np.asarray(names) == "DontCare"] if n else np.zeros((0, 4))
    return ignored, dc, num_valid


def clean_dt(anno: Dict, current_class: str, difficulty: int):
    """Per-image DT filtering: -1 excluded (wrong class), 1 ignored (too
    small for this difficulty), 0 counted."""
    min_h = DIFFICULTY_RULES[difficulty][0]
    names = anno["name"]
    n = len(names)
    ignored = np.full(n, -1, np.int32)
    for i in range(n):
        if names[i] == current_class:
            h = anno["bbox"][i, 3] - anno["bbox"][i, 1]
            ignored[i] = 1 if h < min_h else 0
    return ignored


def _overlap_matrix(gt: Dict, dt: Dict, metric: str) -> np.ndarray:
    """(num_gt, num_dt) overlap for one image, computed on device."""
    ng, nd = len(gt["name"]), len(dt["name"])
    if ng == 0 or nd == 0:
        return np.zeros((ng, nd), np.float32)
    if metric == "bbox":
        return np.asarray(
            pairwise_iou(jnp.asarray(gt["bbox"], jnp.float32), jnp.asarray(dt["bbox"], jnp.float32))
        )
    loc_g, dim_g, rot_g = gt["location"], gt["dimensions"], gt["rotation_y"]
    loc_d, dim_d, rot_d = dt["location"], dt["dimensions"], dt["rotation_y"]
    if metric == "bev":
        # camera frame BEV: (x, z) plane, extents (l, w) -> [x, z, l, w, -ry]
        g = np.stack([loc_g[:, 0], loc_g[:, 2], dim_g[:, 0], dim_g[:, 2], -rot_g], -1)
        d = np.stack([loc_d[:, 0], loc_d[:, 2], dim_d[:, 0], dim_d[:, 2], -rot_d], -1)
        return np.asarray(rotated_iou_bev(jnp.asarray(g, jnp.float32), jnp.asarray(d, jnp.float32)))
    if metric == "3d":
        # y is down: box spans [y - h, y]; use z_bottom = -(y) ... map to our
        # convention [x, y(=z_cam), z_bottom, w(=l), l(=w), h, yaw]
        g = np.stack(
            [loc_g[:, 0], loc_g[:, 2], -loc_g[:, 1], dim_g[:, 0], dim_g[:, 2],
             dim_g[:, 1], -rot_g], -1)
        d = np.stack(
            [loc_d[:, 0], loc_d[:, 2], -loc_d[:, 1], dim_d[:, 0], dim_d[:, 2],
             dim_d[:, 1], -rot_d], -1)
        return np.asarray(rotated_iou_3d(jnp.asarray(g, jnp.float32), jnp.asarray(d, jnp.float32)))
    raise ValueError(metric)


def _image_statistics(
    overlaps, gt, dt, ignored_gt, ignored_dt, dc_boxes, min_overlap,
    threshold, compute_aos=False,
):
    """tp/fp/fn (+ matched score list, aos terms) for one image at one
    score threshold. Greedy GT-centric matching like the official devkit."""
    nd = len(dt["name"])
    ng = len(gt["name"])
    assigned = np.zeros(nd, bool)
    ignored_threshold = dt["score"] < threshold

    tp = fp = fn = 0
    thresholds = []
    delta = []
    for i in range(ng):
        if ignored_gt[i] == -1:
            continue
        det_idx = -1
        valid_detection = -np.inf
        max_overlap = 0.0
        assigned_ignored_det = False
        for j in range(nd):
            if ignored_dt[j] == -1 or assigned[j] or ignored_threshold[j]:
                continue
            ov = overlaps[i, j]
            if ov < min_overlap:
                continue
            if ignored_dt[j] == 0 and (
                ov > max_overlap or assigned_ignored_det
            ):
                if not (ignored_dt[j] == 0 and assigned_ignored_det and ov <= max_overlap):
                    max_overlap = ov
                    det_idx = j
                    valid_detection = 1
                    assigned_ignored_det = False
            elif ignored_dt[j] == 1 and valid_detection == -np.inf:
                det_idx = j
                valid_detection = 1
                assigned_ignored_det = True
        if valid_detection == -np.inf and ignored_gt[i] == 0:
            fn += 1
        elif valid_detection != -np.inf and (
            ignored_gt[i] == 1 or ignored_dt[det_idx] == 1
        ):
            assigned[det_idx] = True
        elif valid_detection != -np.inf:
            tp += 1
            thresholds.append(dt["score"][det_idx])
            if compute_aos:
                delta.append(gt["alpha"][i] - dt["alpha"][det_idx])
            assigned[det_idx] = True

    # count FPs: unassigned, non-ignored detections above threshold
    for j in range(nd):
        if not (assigned[j] or ignored_dt[j] == -1 or ignored_dt[j] == 1 or ignored_threshold[j]):
            fp += 1
    # remove FPs inside don't-care areas (intersection/dt-area > min)
    if len(dc_boxes) and nd:
        dtb = jnp.asarray(dt["bbox"], jnp.float32)
        dcb = jnp.asarray(np.asarray(dc_boxes, np.float32))
        lt = jnp.maximum(dtb[:, None, :2], dcb[None, :, :2])
        rb = jnp.minimum(dtb[:, None, 2:], dcb[None, :, 2:])
        wh = jnp.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        area = (dtb[:, 2] - dtb[:, 0]) * (dtb[:, 3] - dtb[:, 1])
        iod = np.asarray(inter / jnp.maximum(area[:, None], 1e-8))
        for j in range(nd):
            if assigned[j] or ignored_dt[j] != 0 or ignored_threshold[j]:
                continue
            if iod[j].max(initial=0.0) > min_overlap:
                fp -= 1
    similarity = -1.0
    if compute_aos and tp > 0:
        similarity = float(np.sum((1.0 + np.cos(delta)) / 2.0))
    return tp, fp, fn, similarity, thresholds


def _ap_thresholds(scores: np.ndarray, num_gt: int) -> np.ndarray:
    """41 recall-sample score thresholds (official get_thresholds)."""
    scores = np.sort(scores)[::-1]
    thresholds = []
    current_recall = 0.0
    for i, s in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if ((r_recall - current_recall) < (current_recall - l_recall)) and (
            i < len(scores) - 1
        ):
            continue
        thresholds.append(s)
        current_recall += 1.0 / (N_SAMPLE_PTS - 1.0)
    return np.asarray(thresholds)


def eval_class(
    gt_annos: List[Dict],
    dt_annos: List[Dict],
    current_class: str,
    difficulty: int,
    metric: str,
    min_overlap: float,
    compute_aos: bool = False,
):
    """AP (and AOS) for one (class, difficulty, metric) triple, 41-point."""
    assert len(gt_annos) == len(dt_annos)
    per_image = []
    total_valid_gt = 0
    for gt, dt in zip(gt_annos, dt_annos):
        ignored_gt, dc, num_valid = clean_gt(gt, current_class, difficulty)
        ignored_dt = clean_dt(dt, current_class, difficulty)
        overlaps = _overlap_matrix(gt, dt, metric)
        per_image.append((overlaps, gt, dt, ignored_gt, ignored_dt, dc))
        total_valid_gt += num_valid
    if total_valid_gt == 0:
        return {"ap": 0.0, "aos": 0.0, "recall": np.zeros(0), "precision": np.zeros(0)}

    all_scores = []
    for overlaps, gt, dt, ig, idt, dc in per_image:
        _, _, _, _, ths = _image_statistics(
            overlaps, gt, dt, ig, idt, dc, min_overlap, -np.inf, False
        )
        all_scores.extend(ths)
    thresholds = _ap_thresholds(np.asarray(all_scores), total_valid_gt)

    pr = np.zeros((len(thresholds), 4))  # tp, fp, fn, similarity
    for ti, th in enumerate(thresholds):
        for overlaps, gt, dt, ig, idt, dc in per_image:
            tp, fp, fn, sim, _ = _image_statistics(
                overlaps, gt, dt, ig, idt, dc, min_overlap, th, compute_aos
            )
            pr[ti, 0] += tp
            pr[ti, 1] += fp
            pr[ti, 2] += fn
            if sim != -1:
                pr[ti, 3] += sim

    precision = pr[:, 0] / np.maximum(pr[:, 0] + pr[:, 1], 1e-9)
    recall = pr[:, 0] / np.maximum(pr[:, 0] + pr[:, 2], 1e-9)
    aos = pr[:, 3] / np.maximum(pr[:, 0] + pr[:, 1], 1e-9)
    # right-max interpolation over the 41 recall positions
    prec_i = np.zeros(N_SAMPLE_PTS)
    aos_i = np.zeros(N_SAMPLE_PTS)
    prec_i[: len(precision)] = precision
    aos_i[: len(aos)] = aos
    for i in range(len(prec_i) - 2, -1, -1):
        prec_i[i] = max(prec_i[i], prec_i[i + 1])
        aos_i[i] = max(aos_i[i], aos_i[i + 1])
    ap = float(np.mean(prec_i[0::4]) * 100)  # 11-point (0, 4, 8, ... 40)
    ap_aos = float(np.mean(aos_i[0::4]) * 100)
    return {"ap": ap, "aos": ap_aos, "recall": recall, "precision": precision}


def get_official_eval_result(
    gt_annos: List[Dict],
    dt_annos: List[Dict],
    classes: Sequence[str] = ("Car",),
    metrics: Sequence[str] = ("bbox", "bev", "3d"),
    min_overlaps: Dict = None,
    compute_aos: bool = False,
) -> Dict[str, Dict[str, List[float]]]:
    """AP table: result[class][metric] = [easy, moderate, hard].

    Mirrors the reference's entry point (``eval_utils.py:645``).
    """
    min_overlaps = min_overlaps or DEFAULT_MIN_OVERLAPS
    metric_idx = {"bbox": 0, "bev": 1, "3d": 2}
    out: Dict[str, Dict[str, List[float]]] = {}
    for cls in classes:
        out[cls] = {}
        for metric in metrics:
            mo = min_overlaps[cls][metric_idx[metric]]
            aps = []
            for diff in (0, 1, 2):
                r = eval_class(
                    gt_annos, dt_annos, cls, diff, metric, mo,
                    compute_aos=compute_aos and metric == "bbox",
                )
                aps.append(r["ap"])
            out[cls][metric] = aps
        if compute_aos:
            out[cls]["aos"] = [
                eval_class(gt_annos, dt_annos, cls, d, "bbox",
                           min_overlaps[cls][0], True)["aos"]
                for d in (0, 1, 2)
            ]
    return out
