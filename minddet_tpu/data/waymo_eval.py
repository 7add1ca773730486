"""Waymo Open Dataset detection metrics: L1/L2 AP and APH + range breakdowns.

The reference only SHIPS predictions to the official waymo-open-dataset
toolkit (``det3d_ms/datasets/waymo/waymo_common.py:358`` writes .bin protos
and shells out); the toolkit (TensorFlow-based) is not installable here, so
this is a clean-room implementation of the protocol itself:

- matching: greedy by detection score against same-class GT at 3D IoU
  thresholds {Vehicle: 0.7, Pedestrian: 0.5, Cyclist: 0.5} — IoU matrices
  run on device via ``ops.rotated_iou.rotated_iou_3d``.
- difficulty: LEVEL_2 = GT labeled L2 or with <= 5 lidar points; the L1
  metric ignores L2 ground truths (they are neither FN nor do their matches
  count as FP — KITTI-style ignore semantics); the L2 metric scores all.
- APH: every true positive contributes its heading accuracy
  ``max(0, 1 - |dYaw|_wrapped / pi)`` to the TP mass in BOTH the precision
  and the recall numerators (the official metric replaces the TP count with
  the heading-accuracy sum; denominators keep counts) — AP uses weight 1.
- RANGE breakdowns: objects are sharded by BEV center distance into
  [0, 30), [30, 50), [50, inf) and each shard is scored independently
  (the official BreakdownGenerator partitions both GT and predictions by
  their own center range before matching).
- AP integration: 101-point interpolated precision over recall (the official
  toolkit samples the PR curve on a fixed score grid; on the same matches
  the difference is a quantization detail — documented divergence).

Box layout: (N, 7) ``[x, y, z_bottom, w, l, h, yaw]`` lidar frame (the
framework-wide SECOND convention).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from minddet_tpu.ops.rotated_iou import rotated_iou_3d

IOU_THRESHOLDS = {"Vehicle": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5, "Sign": 0.5}
N_RECALL_PTS = 101
L2_MAX_POINTS = 5
RANGE_BUCKETS = ((0.0, 30.0), (30.0, 50.0), (50.0, np.inf))


def _heading_accuracy(gt_yaw: float, dt_yaw: float) -> float:
    d = abs(gt_yaw - dt_yaw) % (2 * np.pi)
    d = min(d, 2 * np.pi - d)
    return max(0.0, 1.0 - d / np.pi)


def _match_frame(
    gt_boxes: np.ndarray,
    gt_ignore: np.ndarray,
    dt_boxes: np.ndarray,
    dt_scores: np.ndarray,
    iou_thr: float,
):
    """Greedy match one frame -> per-detection (score, assigned flag in
    {1 tp, 0 fp, -1 ignored}, heading weight)."""
    nd = len(dt_boxes)
    out_scores = dt_scores.copy()
    out_flag = np.zeros(nd, np.int32)
    out_hw = np.zeros(nd, np.float64)
    if nd == 0:
        return out_scores, out_flag, out_hw
    if len(gt_boxes) == 0:
        return out_scores, out_flag, out_hw  # all FP
    iou = np.asarray(
        rotated_iou_3d(jnp.asarray(dt_boxes, jnp.float32),
                       jnp.asarray(gt_boxes, jnp.float32))
    )
    taken = np.zeros(len(gt_boxes), bool)
    for di in np.argsort(-dt_scores, kind="mergesort"):
        row = np.where(taken, -1.0, iou[di])
        gi = int(np.argmax(row))
        if row[gi] >= iou_thr:
            taken[gi] = True
            if gt_ignore[gi]:
                out_flag[di] = -1  # matched an ignored (L2) gt: neutral
            else:
                out_flag[di] = 1
                out_hw[di] = _heading_accuracy(
                    float(gt_boxes[gi, 6]), float(dt_boxes[di, 6])
                )
    return out_scores, out_flag, out_hw


def _ap_from_matches(scores, flags, hws, n_gt: int, heading: bool) -> float:
    keep = flags >= 0  # drop ignored-match detections entirely
    scores, flags, hws = scores[keep], flags[keep], hws[keep]
    if n_gt == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="mergesort")
    # APH: the TP mass is the heading-accuracy sum in BOTH precision and
    # recall numerators (official metrics replace TP with sum(h)); the
    # denominators stay unweighted counts (FP count, total GT count).
    tp_w = np.where(flags[order] == 1, hws[order] if heading else 1.0, 0.0)
    fp = (flags[order] == 0).astype(np.float64)
    ctp_w = np.cumsum(tp_w)
    ctp_cnt = np.cumsum(flags[order] == 1)
    cfp = np.cumsum(fp)
    recall = ctp_w / n_gt
    precision = ctp_w / np.maximum(ctp_cnt + cfp, 1e-9)
    rec_grid = np.linspace(0, 1, N_RECALL_PTS)
    prec = np.interp(rec_grid, recall, precision, right=0.0)
    # monotone non-increasing envelope
    for i in range(len(prec) - 2, -1, -1):
        prec[i] = max(prec[i], prec[i + 1])
    return float(np.mean(prec))


def _bev_range(boxes: np.ndarray) -> np.ndarray:
    return np.linalg.norm(np.asarray(boxes, np.float64).reshape(-1, 7)[:, :2],
                          axis=1)


def _eval_shard(
    gt_annos, dt_annos, cls, classes, thr,
    rng: Optional[Tuple[float, float]],
) -> Dict[str, float]:
    """L1/L2 AP+APH for one class, optionally restricted to a range shard
    (both GT and detections filtered by their own BEV center distance)."""
    def cls_of(anno, i):
        c = anno["classes"][i]
        if isinstance(c, (str, np.str_)):
            return str(c)
        return classes[int(c) - 1] if 1 <= int(c) <= len(classes) else None

    per_level = {}
    for level in (1, 2):
        all_s, all_f, all_h = [], [], []
        n_gt = 0
        for g, d in zip(gt_annos, dt_annos):
            g_sel = [i for i in range(len(g["boxes"]))
                     if cls_of(g, i) == cls]
            gb = np.asarray(g["boxes"], np.float64).reshape(-1, 7)[g_sel]
            npts = np.asarray(
                g.get("num_points", np.full(len(g["boxes"]), 100))
            )[g_sel]
            diff = np.asarray(
                g.get("difficulty", np.ones(len(g["boxes"])))
            )[g_sel]
            d_sel = [i for i in range(len(d["boxes"]))
                     if cls_of(d, i) == cls]
            db = np.asarray(d["boxes"], np.float64).reshape(-1, 7)[d_sel]
            dsc = np.asarray(d["scores"], np.float64)[d_sel]
            if rng is not None:
                gk = (_bev_range(gb) >= rng[0]) & (_bev_range(gb) < rng[1])
                gb, npts, diff = gb[gk], npts[gk], diff[gk]
                dk = (_bev_range(db) >= rng[0]) & (_bev_range(db) < rng[1])
                db, dsc = db[dk], dsc[dk]
            is_l2 = (diff >= 2) | (npts <= L2_MAX_POINTS)
            ignore = is_l2 if level == 1 else np.zeros(len(gb), bool)
            n_gt += int((~ignore).sum())
            s, f, h = _match_frame(gb, ignore, db, dsc, thr)
            all_s.append(s)
            all_f.append(f)
            all_h.append(h)
        s = np.concatenate(all_s) if all_s else np.zeros(0)
        f = np.concatenate(all_f) if all_f else np.zeros(0, np.int32)
        h = np.concatenate(all_h) if all_h else np.zeros(0)
        per_level[f"AP_L{level}"] = 100 * _ap_from_matches(
            s, f, h, n_gt, heading=False)
        per_level[f"APH_L{level}"] = 100 * _ap_from_matches(
            s, f, h, n_gt, heading=True)
    return per_level


def evaluate_waymo(
    gt_annos: List[Dict],
    dt_annos: List[Dict],
    classes: Sequence[str] = ("Vehicle", "Pedestrian", "Cyclist"),
    range_breakdowns: bool = False,
) -> Dict[str, Dict[str, float]]:
    """-> result[class] = {AP_L1, APH_L1, AP_L2, APH_L2} (percent), plus
    '<metric>_[lo,hi)' range-shard entries when ``range_breakdowns``.

    gt anno per frame: boxes (N, 7), classes (N,) names or ids matching
    ``classes`` 1-based, optional num_points (N,) and difficulty (N,) where
    2 marks labeler-assigned LEVEL_2.
    dt anno per frame: boxes, classes, scores.
    """
    out: Dict[str, Dict[str, float]] = {}
    for cls in classes:
        thr = IOU_THRESHOLDS.get(cls, 0.5)
        per_level = _eval_shard(gt_annos, dt_annos, cls, classes, thr, None)
        if range_breakdowns:
            for lo, hi in RANGE_BUCKETS:
                tag = f"[{lo:g},{'inf' if np.isinf(hi) else f'{hi:g}'})"
                shard = _eval_shard(
                    gt_annos, dt_annos, cls, classes, thr, (lo, hi))
                per_level.update(
                    {f"{k}_{tag}": v for k, v in shard.items()})
        out[cls] = per_level
    return out
