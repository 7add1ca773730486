"""Vectorized KITTI matcher: bit-equivalence to the per-threshold Python
loop, and the 3,769-frame wall-time budget (VERDICT r3 item 4).

The reference numba-jits its matching loop because plain Python is
minutes-to-hours at real KITTI scale (``eval_utils.py:495``); numba is not
installed here, so ``_image_statistics_batch`` vectorizes the 41 score
thresholds per ground-truth step instead. ``_image_statistics_loop`` below
is a direct transcription of the pre-vectorization implementation and serves
as the semantics oracle.
"""

import time

import numpy as np
import pytest

from minddet_tpu.data.kitti_eval import (
    _dc_iod_max,
    _image_statistics_batch,
    calculate_overlaps,
    clean_dt,
    clean_gt,
    get_official_eval_result,
)


def _image_statistics_loop(
    overlaps, gt, dt, ignored_gt, ignored_dt, dc_boxes, min_overlap,
    threshold, compute_aos=False,
):
    """The original (round-3) per-threshold greedy matcher, verbatim."""
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
            if ignored_dt[j] == 0 and (ov > max_overlap or assigned_ignored_det):
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

    for j in range(nd):
        if not (assigned[j] or ignored_dt[j] == -1 or ignored_dt[j] == 1
                or ignored_threshold[j]):
            fp += 1
    if len(dc_boxes) and nd:
        iod = _dc_iod_max(dt["bbox"], dc_boxes)
        for j in range(nd):
            if assigned[j] or ignored_dt[j] != 0 or ignored_threshold[j]:
                continue
            if iod[j] > min_overlap:
                fp -= 1
    similarity = -1.0
    if compute_aos and tp > 0:
        similarity = float(np.sum((1.0 + np.cos(delta)) / 2.0))
    return tp, fp, fn, similarity, thresholds


_CLASSES = np.array(["Car", "Pedestrian", "Cyclist", "Van", "DontCare"])


def _synth_anno(rng, n_gt=8, n_dt=10, jitter=6.0):
    """One synthetic frame: GT with difficulty attributes + jittered DTs."""
    names = _CLASSES[rng.randint(0, len(_CLASSES), n_gt)]
    xy = rng.uniform(0, 1200, (n_gt, 2))
    wh = rng.uniform(20, 120, (n_gt, 2))
    bbox = np.concatenate([xy, xy + wh], 1).astype(np.float64)
    loc = np.stack([rng.uniform(-30, 30, n_gt), rng.uniform(0.5, 2.5, n_gt),
                    rng.uniform(5, 60, n_gt)], 1)
    dim = rng.uniform(1.0, 4.5, (n_gt, 3))
    rot = rng.uniform(-np.pi, np.pi, n_gt)
    gt = {
        "name": names,
        "bbox": bbox,
        "location": loc,
        "dimensions": dim,
        "rotation_y": rot,
        "alpha": rng.uniform(-np.pi, np.pi, n_gt),
        "occluded": rng.randint(0, 4, n_gt),
        "truncated": rng.uniform(0, 0.6, n_gt),
    }
    # detections: jittered copies of a subset + a few strays
    idx = rng.permutation(n_gt)[: max(1, n_dt - 2)]
    db = bbox[idx] + rng.uniform(-jitter, jitter, (len(idx), 4))
    stray_xy = rng.uniform(0, 1200, (n_dt - len(idx), 2))
    stray_wh = rng.uniform(20, 120, (n_dt - len(idx), 2))
    db = np.concatenate(
        [db, np.concatenate([stray_xy, stray_xy + stray_wh], 1)], 0)
    dnames = np.concatenate([
        names[idx],
        _CLASSES[rng.randint(0, 3, n_dt - len(idx))],
    ])
    dloc = np.concatenate(
        [loc[idx] + rng.uniform(-0.4, 0.4, (len(idx), 3)),
         np.stack([rng.uniform(-30, 30, n_dt - len(idx)),
                   rng.uniform(0.5, 2.5, n_dt - len(idx)),
                   rng.uniform(5, 60, n_dt - len(idx))], 1)], 0)
    ddim = np.concatenate(
        [dim[idx] * rng.uniform(0.9, 1.1, (len(idx), 3)),
         rng.uniform(1.0, 4.5, (n_dt - len(idx), 3))], 0)
    drot = np.concatenate(
        [rot[idx] + rng.uniform(-0.2, 0.2, len(idx)),
         rng.uniform(-np.pi, np.pi, n_dt - len(idx))])
    dt = {
        "name": dnames,
        "bbox": db,
        "location": dloc,
        "dimensions": ddim,
        "rotation_y": drot,
        "alpha": rng.uniform(-np.pi, np.pi, n_dt),
        "score": rng.uniform(0.05, 1.0, n_dt),
    }
    return gt, dt


def test_batch_matcher_bit_identical_to_loop():
    rng = np.random.RandomState(0)
    frames = [_synth_anno(rng) for _ in range(24)]
    # degenerate frames: no gt / no dt / all ignored
    empty_gt = {"name": np.array([]), "bbox": np.zeros((0, 4)),
                "location": np.zeros((0, 3)), "dimensions": np.zeros((0, 3)),
                "rotation_y": np.zeros(0), "alpha": np.zeros(0),
                "occluded": np.zeros(0, int), "truncated": np.zeros(0)}
    g0, d0 = _synth_anno(rng)
    frames.append((empty_gt, d0))
    frames.append((g0, {"name": np.array([]), "bbox": np.zeros((0, 4)),
                        "location": np.zeros((0, 3)),
                        "dimensions": np.zeros((0, 3)),
                        "rotation_y": np.zeros(0), "alpha": np.zeros(0),
                        "score": np.zeros(0)}))
    gts = [f[0] for f in frames]
    dts = [f[1] for f in frames]
    for metric in ("bbox", "bev", "3d"):
        overlaps = calculate_overlaps(gts, dts, metric)
        for cls, mo in (("Car", 0.7), ("Pedestrian", 0.5)):
            for diff in (0, 1, 2):
                for ov, gt, dt in zip(overlaps, gts, dts):
                    ig, dc, _ = clean_gt(gt, cls, diff)
                    idt = clean_dt(dt, cls, diff)
                    ths = np.concatenate(
                        [[-np.inf], np.sort(dt["score"])[::-1][:8], [0.5]])
                    btp, bfp, bfn, bsim, bscores = _image_statistics_batch(
                        ov, gt, dt, ig, idt, dc, mo, ths, compute_aos=True)
                    for ti, th in enumerate(ths):
                        tp, fp, fn, sim, scores = _image_statistics_loop(
                            ov, gt, dt, ig, idt, dc, mo, th,
                            compute_aos=True)
                        assert (tp, fp, fn) == (btp[ti], bfp[ti], bfn[ti]), (
                            metric, cls, diff, th)
                        assert sim == pytest.approx(bsim[ti], abs=1e-12)
                    # matched scores (gathering phase, single threshold)
                    _, _, _, _, s1 = _image_statistics_batch(
                        ov, gt, dt, ig, idt, dc, mo,
                        np.asarray([-np.inf]), False)
                    _, _, _, _, s2 = _image_statistics_loop(
                        ov, gt, dt, ig, idt, dc, mo, -np.inf, False)
                    assert list(s1[0]) == list(s2)


def test_full_kitti_scale_under_wall_budget():
    """3,769 frames x 3 classes x 3 metrics x 3 difficulties + AOS within
    the round-4 wall budget (the pre-vectorization evaluator was
    minutes-to-hours here; VERDICT r3 item 4 asks ~60 s — allow headroom
    for a loaded single-core host)."""
    rng = np.random.RandomState(1)
    frames = [_synth_anno(rng) for _ in range(3769)]
    gts = [f[0] for f in frames]
    dts = [f[1] for f in frames]
    t0 = time.perf_counter()
    out = get_official_eval_result(
        gts, dts, classes=("Car", "Pedestrian", "Cyclist"),
        metrics=("bbox", "bev", "3d"), compute_aos=True)
    dt = time.perf_counter() - t0
    for cls in ("Car", "Pedestrian", "Cyclist"):
        for metric in ("bbox", "bev", "3d", "aos"):
            assert len(out[cls][metric]) == 3
            assert all(0.0 <= v <= 100.0 for v in out[cls][metric])
    # detections are jittered copies of GT, so easy AP must be non-trivial
    # (random occlusion/truncation + 0.7 IoU keeps it modest)
    assert out["Car"]["bbox"][0] > 5.0
    assert dt < 90.0, f"full-scale KITTI eval took {dt:.1f}s"
