"""nuScenes detection metrics (mAP @ center-distance + TP errors + NDS).

The nuscenes-devkit is not installable here; the reference shells out to it
(``det3d_ms/datasets/nuscenes/nuscenes.py:213-300``). This is a clean-room
implementation of the official protocol: per-class AP at center-distance
thresholds {0.5, 1, 2, 4} m with the (recall, precision) > 0.1 normalization,
TP errors (ATE/ASE/AOE/AVE/AAE) accumulated at the 2 m threshold with the
devkit's per-class exclusions (no attribute/velocity for barrier and
traffic_cone, no orientation for traffic_cone, barrier orientation modulo
pi), and

    NDS = (5 * mAP + sum_k max(0, 1 - mTP_k)) / 10.

Boxes: [x, y, z, w, l, h, vx, vy, yaw] global/lidar frame (CenterPoint's
output layout). Attributes are integer ids into
``data.nuscenes.ATTRIBUTES`` (-1 = none/void, excluded from AAE like the
devkit).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
N_RECALL_PTS = 101

# devkit per-class TP-metric exclusions (nuscenes/eval/detection/algo.py)
ATTR_EXCLUDED = frozenset({"barrier", "traffic_cone"})
VEL_EXCLUDED = frozenset({"barrier", "traffic_cone"})
ORIENT_EXCLUDED = frozenset({"traffic_cone"})
ORIENT_PERIOD_PI = frozenset({"barrier"})


def _yaw_diff(a: np.ndarray, b: np.ndarray, period: float = 2 * np.pi) -> np.ndarray:
    d = (a - b) % period
    return np.minimum(d, period - d)


def _aligned_iou_1d(d1: np.ndarray, d2: np.ndarray) -> np.ndarray:
    """Scale error: IoU of center-aligned axis-aligned boxes (w, l, h)."""
    mins = np.minimum(d1, d2)
    maxs = np.maximum(d1, d2)
    inter = np.prod(mins, axis=-1)
    union = np.prod(d1, axis=-1) + np.prod(d2, axis=-1) - inter
    return inter / np.maximum(union, 1e-9)


def accumulate_class(
    gts: List[Dict], dts: List[Dict], dist_th: float, cls: str = ""
) -> Dict[str, np.ndarray]:
    """Match one class at one distance threshold across all samples.

    gts/dts: per-sample dicts with 'boxes' (N, 9), dts also 'scores', both
    optionally 'attrs' (N,) int attribute ids (-1 = void). Returns tp/fp
    flags sorted by score + per-TP errors + total gt count. AAE entries are
    only emitted for TPs whose GT attribute is non-void (devkit semantics).
    """
    period = np.pi if cls in ORIENT_PERIOD_PI else 2 * np.pi
    n_gt = sum(len(g["boxes"]) for g in gts)
    all_scores, all_tp = [], []
    errs = {"ate": [], "ase": [], "aoe": [], "ave": [], "aae": []}
    for g, d in zip(gts, dts):
        gb = np.asarray(g["boxes"], np.float64).reshape(-1, 9)
        db = np.asarray(d["boxes"], np.float64).reshape(-1, 9)
        ds = np.asarray(d["scores"], np.float64).reshape(-1)
        ga = np.asarray(g.get("attrs", np.full(len(gb), -1)), np.int64)
        da = np.asarray(d.get("attrs", np.full(len(db), -1)), np.int64)
        order = np.argsort(-ds, kind="mergesort")
        taken = np.zeros(len(gb), bool)
        for di in order:
            if len(gb) == 0:
                all_scores.append(ds[di])
                all_tp.append(False)
                continue
            dist = np.linalg.norm(gb[:, :2] - db[di, :2], axis=1)
            dist = np.where(taken, np.inf, dist)
            gi = int(np.argmin(dist))
            if dist[gi] < dist_th:
                taken[gi] = True
                all_scores.append(ds[di])
                all_tp.append(True)
                errs["ate"].append(dist[gi])
                errs["ase"].append(1.0 - _aligned_iou_1d(gb[gi, 3:6], db[di, 3:6]))
                errs["aoe"].append(_yaw_diff(gb[gi, 8], db[di, 8], period))
                errs["ave"].append(np.linalg.norm(gb[gi, 6:8] - db[di, 6:8]))
                if ga[gi] >= 0:  # void GT attributes don't count toward AAE
                    errs["aae"].append(0.0 if da[di] == ga[gi] else 1.0)
            else:
                all_scores.append(ds[di])
                all_tp.append(False)
    return {
        "scores": np.asarray(all_scores),
        "tp": np.asarray(all_tp, bool),
        "n_gt": n_gt,
        "errors": {k: np.asarray(v) for k, v in errs.items()},
    }


def average_precision(acc: Dict) -> float:
    """Official nuScenes AP: normalized area above (0.1, 0.1)."""
    if acc["n_gt"] == 0 or len(acc["scores"]) == 0:
        return 0.0
    order = np.argsort(-acc["scores"], kind="mergesort")
    tp = acc["tp"][order]
    tps = np.cumsum(tp)
    fps = np.cumsum(~tp)
    recall = tps / acc["n_gt"]
    precision = tps / np.maximum(tps + fps, 1e-9)
    rec_interp = np.linspace(0, 1, N_RECALL_PTS)
    prec = np.interp(rec_interp, recall, precision, right=0)
    prec = prec[rec_interp >= MIN_RECALL]
    prec = np.maximum(prec - MIN_PRECISION, 0)
    return float(np.mean(prec) / (1.0 - MIN_PRECISION))


def evaluate_nuscenes(
    gt_by_class: Dict[str, List[Dict]],
    dt_by_class: Dict[str, List[Dict]],
    classes: Sequence[str],
) -> Dict[str, float]:
    """-> {'mAP', 'NDS', 'mATE', 'mASE', 'mAOE', 'mAVE', per-class APs}."""
    per_class_ap = {}
    tp_errs = {"ate": [], "ase": [], "aoe": [], "ave": [], "aae": []}
    excluded = {"aoe": ORIENT_EXCLUDED, "ave": VEL_EXCLUDED,
                "aae": ATTR_EXCLUDED}
    for cls in classes:
        gts = gt_by_class.get(cls, [])
        dts = dt_by_class.get(cls, [])
        aps = []
        for th in DIST_THRESHOLDS:
            acc = accumulate_class(gts, dts, th, cls)
            aps.append(average_precision(acc))
            if th == TP_THRESHOLD:
                for k in tp_errs:
                    if cls in excluded.get(k, ()):  # devkit class exclusions
                        continue
                    e = acc["errors"][k]
                    # devkit: a class with zero TPs contributes worst-case 1.0
                    tp_errs[k].append(float(np.mean(e)) if len(e) else 1.0)
        per_class_ap[cls] = float(np.mean(aps))
    m_ap = float(np.mean(list(per_class_ap.values()))) if per_class_ap else 0.0
    m_tp = {
        f"m{k.upper()}": (float(np.mean(v)) if v else 1.0) for k, v in tp_errs.items()
    }
    # AOE normalized by pi for the NDS bound
    nds_terms = [
        max(0.0, 1.0 - m_tp["mATE"]),
        max(0.0, 1.0 - m_tp["mASE"]),
        max(0.0, 1.0 - m_tp["mAOE"] / np.pi),
        max(0.0, 1.0 - m_tp["mAVE"]),
        max(0.0, 1.0 - m_tp["mAAE"]),
    ]
    nds = (5.0 * m_ap + sum(nds_terms)) / 10.0
    out = {"mAP": m_ap, "NDS": nds, **m_tp}
    out.update({f"AP_{k}": v for k, v in per_class_ap.items()})
    return out
