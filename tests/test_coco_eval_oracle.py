"""Official-tool golden pack for the clean-room COCO evaluator (VERDICT r4
item 4).

pycocotools cannot be installed in this image, so the "official output" is an
ORACLE written here as a line-for-line transcription of the pycocotools
algorithm (cocoeval.py: evaluateImg's greedy per-threshold matcher with the
crowd/ignore rules, accumulate's truncate-then-cumsum with +np.spacing(1)
precision, searchsorted-left recall interpolation, summarize's -1 handling) —
deliberately structured like the tool (per-image dicts, matched-id bookkeeping)
rather than like ``minddet_tpu.data.coco_eval`` (array-major), so agreement is
between two independent derivations of the same spec.

The fixtures cover what the hand-derived goldens in test_coco_eval.py don't:
crowd GT stealing matches (multi-dt absorption), GT exactly ON the 32^2/96^2
area boundaries, unmatched out-of-range detections, maxDets truncation (1/10
vs 100), score ties (mergesort stability), empty images, classes with zero GT
(-1 propagation), and segm-mode mask IoU with crowd denominators.
"""

import numpy as np
import pytest

from minddet_tpu.data.coco_eval import (
    AREA_RANGES,
    IOU_THRS,
    MAX_DETS,
    REC_THRS,
    COCOEvaluator,
)

# ---------------------------------------------------------------------------
# Oracle: pycocotools cocoeval.py transcription
# ---------------------------------------------------------------------------


def _box_iou(d, g, iscrowd):
    # maskUtils.iou semantics for boxes [x1, y1, x2, y2]
    out = np.zeros((len(d), len(g)))
    for di, db in enumerate(d):
        da = (db[2] - db[0]) * (db[3] - db[1])
        for gi, gb in enumerate(g):
            w = min(db[2], gb[2]) - max(db[0], gb[0])
            h = min(db[3], gb[3]) - max(db[1], gb[1])
            if w <= 0 or h <= 0:
                continue
            inter = w * h
            ga = (gb[2] - gb[0]) * (gb[3] - gb[1])
            union = da if iscrowd[gi] else da + ga - inter
            out[di, gi] = inter / union
    return out


def _mask_iou(d, g, iscrowd):
    out = np.zeros((len(d), len(g)))
    for di, dm in enumerate(d):
        da = dm.sum()
        for gi, gm in enumerate(g):
            inter = np.logical_and(dm, gm).sum()
            union = da if iscrowd[gi] else da + gm.sum() - inter
            out[di, gi] = inter / union if union > 0 else 0.0
    return out


def _oracle_evaluate_img(dt, gt, a_rng, max_det, segm):
    """cocoeval.COCOeval.evaluateImg transcription.

    dt/gt: lists of dicts with 'bbox' [x1,y1,x2,y2], 'score', 'iscrowd',
    'area', 'id', optional 'mask'."""
    for g in gt:
        g["_ignore"] = 1 if (
            g["iscrowd"] or g["area"] < a_rng[0] or g["area"] > a_rng[1]
        ) else 0
    gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
    gt = [gt[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
    dt = [dt[i] for i in dtind[:max_det]]
    iscrowd = [int(g["iscrowd"]) for g in gt]
    if segm:
        ious = _mask_iou([d["mask"] for d in dt], [g["mask"] for g in gt],
                         iscrowd)
    else:
        ious = _box_iou([d["bbox"] for d in dt], [g["bbox"] for g in gt],
                        iscrowd)

    T = len(IOU_THRS)
    G = len(gt)
    D = len(dt)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gt])
    dt_ig = np.zeros((T, D))
    if len(ious):
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dt):
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gt):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = gt[m]["id"]
                gtm[tind, m] = d["id"]
    a = np.array(
        [d["area"] < a_rng[0] or d["area"] > a_rng[1] for d in dt]
    ).reshape((1, len(dt)))
    dt_ig = np.logical_or(
        dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtScores": [d["score"] for d in dt],
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


def _oracle_accumulate_and_summarize(per_img, n_classes):
    """cocoeval accumulate + summarize transcription. ``per_img``:
    {(cat, area, img): eval dict from max_det=100 matching}."""
    T, R = len(IOU_THRS), len(REC_THRS)
    K = n_classes
    areas = list(AREA_RANGES)
    A, M = len(areas), len(MAX_DETS)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    img_ids = sorted({img for (_, _, img) in per_img})
    for k in range(K):
        for a, area in enumerate(areas):
            for m, max_det in enumerate(MAX_DETS):
                E = [per_img.get((k, area, i)) for i in img_ids]
                E = [e for e in E if e is not None]
                if not E:
                    continue
                dt_scores = np.concatenate(
                    [np.asarray(e["dtScores"])[:max_det] for e in E])
                inds = np.argsort(-dt_scores, kind="mergesort")
                dt_scores_sorted = dt_scores[inds]
                dtm = np.concatenate(
                    [e["dtMatches"][:, :max_det] for e in E], axis=1
                )[:, inds]
                dt_ig = np.concatenate(
                    [e["dtIgnore"][:, :max_det] for e in E], axis=1
                )[:, inds]
                gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                npig = np.count_nonzero(gt_ig == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(
                    np.logical_not(dtm), np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
                for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                    tp = np.array(tp)
                    fp = np.array(fp)
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros((R,))
                    recall[t, k, a, m] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    q = q.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds2 = np.searchsorted(rc, REC_THRS, side="left")
                    try:
                        for ri, pi in enumerate(inds2):
                            q[ri] = pr[pi]
                    except IndexError:
                        pass
                    precision[t, :, k, a, m] = np.array(q)

    def _summ(ap, iou_thr, area, max_det):
        aind = areas.index(area)
        mind = MAX_DETS.index(max_det)
        if ap:
            s = precision[:, :, :, aind, mind]
            if iou_thr is not None:
                t = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                s = s[t]
        else:
            s = recall[:, :, aind, mind]
            if iou_thr is not None:
                t = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                s = s[t]
        valid = s[s > -1]
        return float(np.mean(valid)) if valid.size else -1.0

    return {
        "AP": _summ(True, None, "all", 100),
        "AP50": _summ(True, 0.5, "all", 100),
        "AP75": _summ(True, 0.75, "all", 100),
        "AP_small": _summ(True, None, "small", 100),
        "AP_medium": _summ(True, None, "medium", 100),
        "AP_large": _summ(True, None, "large", 100),
        "AR@1": _summ(False, None, "all", 1),
        "AR@10": _summ(False, None, "all", 10),
        "AR@100": _summ(False, None, "all", 100),
        "AR_small": _summ(False, None, "small", 100),
        "AR_medium": _summ(False, None, "medium", 100),
        "AR_large": _summ(False, None, "large", 100),
    }


def _oracle_summarize(images, n_classes, segm=False):
    """images: list of per-class dicts {cls: (dts, gts)} in the COCOEvaluator
    add() format."""
    per_img = {}
    next_id = [1]

    for img_i, img in enumerate(images):
        for k in range(n_classes):
            if k not in img:
                continue
            dts, gts = img[k]
            dt = []
            for i in range(len(dts["scores"])):
                b = dts["boxes"][i]
                mask = dts["masks"][i] if segm else None
                area = (float(mask.sum()) if segm
                        else float((b[2] - b[0]) * (b[3] - b[1])))
                dt.append({"bbox": b, "score": float(dts["scores"][i]),
                           "area": area, "id": next_id[0], "mask": mask})
                next_id[0] += 1
            gt = []
            for i in range(len(gts["boxes"])):
                b = gts["boxes"][i]
                mask = gts["masks"][i] if segm else None
                area = (float(mask.sum()) if segm
                        else float((b[2] - b[0]) * (b[3] - b[1])))
                gt.append({"bbox": b, "iscrowd": bool(gts["iscrowd"][i]),
                           "area": area, "id": next_id[0], "mask": mask})
                next_id[0] += 1
            for area_name, rng in AREA_RANGES.items():
                per_img[(k, area_name, img_i)] = _oracle_evaluate_img(
                    [dict(d) for d in dt], [dict(g) for g in gt], rng,
                    MAX_DETS[-1], segm)
    return _oracle_accumulate_and_summarize(per_img, n_classes)


# ---------------------------------------------------------------------------
# Fixtures
# ---------------------------------------------------------------------------


def _rand_box(rng, lo=4.0, hi=140.0):
    x1 = rng.uniform(0, 300)
    y1 = rng.uniform(0, 300)
    w = rng.uniform(lo, hi)
    h = rng.uniform(lo, hi)
    return np.array([x1, y1, x1 + w, y1 + h])


def _jitter(rng, box, s):
    return box + rng.uniform(-s, s, 4)


def _fixture(seed, n_images=24, n_classes=3):
    """Adversarial randomized fixture. Per image/class: GT (some crowd, some
    on area boundaries), detections = jittered GT + duplicates + far misses +
    out-of-range unmatched dts, with deliberate score ties."""
    rng = np.random.RandomState(seed)
    images = []
    for img_i in range(n_images):
        img = {}
        for k in range(n_classes):
            if k == 2 and seed % 2 == 0:
                # class 2 has ZERO gt anywhere (n_gt==0 -> -1 propagation)
                # but still gets detections (pure false positives)
                if rng.rand() < 0.5:
                    img[k] = (
                        {"boxes": np.stack([_rand_box(rng)]),
                         "scores": np.array([0.7])},
                        {"boxes": np.zeros((0, 4)),
                         "iscrowd": np.zeros(0, bool)},
                    )
                continue
            n_gt = rng.randint(0, 5)
            gts, crowd = [], []
            for _ in range(n_gt):
                r = rng.rand()
                if r < 0.2:  # exactly on the 32^2 boundary (area == 1024)
                    b = np.array([10.0, 10.0, 42.0, 42.0]) + rng.randint(
                        0, 50)
                elif r < 0.3:  # exactly on the 96^2 boundary
                    b = np.array([5.0, 5.0, 101.0, 101.0])
                elif r < 0.4:  # tiny (small range)
                    b = _rand_box(rng, 4, 20)
                elif r < 0.5:  # huge (large range)
                    b = _rand_box(rng, 120, 180)
                else:
                    b = _rand_box(rng)
                gts.append(b)
                crowd.append(rng.rand() < 0.25)
            dts, scores = [], []
            for gi, b in enumerate(gts):
                for dup in range(rng.randint(0, 3)):
                    dts.append(_jitter(rng, b, 3.0 + 6.0 * dup))
                    # deliberate ties: quantized scores
                    scores.append(round(rng.rand() * 10) / 10)
            for _ in range(rng.randint(0, 3)):  # far false positives
                dts.append(_rand_box(rng))
                scores.append(round(rng.rand() * 10) / 10)
            img[k] = (
                {"boxes": (np.stack(dts) if dts else np.zeros((0, 4))),
                 "scores": np.asarray(scores, np.float64)},
                {"boxes": (np.stack(gts) if gts else np.zeros((0, 4))),
                 "iscrowd": np.asarray(crowd, bool)},
            )
        images.append(img)
    return images


def _seg_fixture(seed, n_images=20, n_classes=2, hw=(24, 32)):
    rng = np.random.RandomState(seed)
    h, w = hw
    images = []

    def blob():
        m = np.zeros((h, w), bool)
        cy, cx = rng.randint(2, h - 2), rng.randint(2, w - 2)
        ry, rx = rng.randint(1, 8), rng.randint(1, 10)
        yy, xx = np.ogrid[:h, :w]
        m[((yy - cy) / max(ry, 1)) ** 2 + ((xx - cx) / max(rx, 1)) ** 2 <= 1] = True
        return m

    def mask_box(m):
        ys, xs = np.where(m)
        if not len(ys):
            return np.array([0.0, 0.0, 1.0, 1.0])
        return np.array([xs.min(), ys.min(), xs.max() + 1.0, ys.max() + 1.0])

    for _ in range(n_images):
        img = {}
        for k in range(n_classes):
            n_gt = rng.randint(0, 4)
            g_masks = [blob() for _ in range(n_gt)]
            crowd = [rng.rand() < 0.3 for _ in range(n_gt)]
            d_masks, scores = [], []
            for gm in g_masks:
                if rng.rand() < 0.8:
                    dm = gm.copy()
                    if rng.rand() < 0.7:  # perturb
                        dm ^= blob() & (rng.rand(h, w) < 0.2)
                    d_masks.append(dm)
                    scores.append(round(rng.rand() * 8) / 8)
            for _ in range(rng.randint(0, 2)):
                d_masks.append(blob())
                scores.append(round(rng.rand() * 8) / 8)
            img[k] = (
                {"boxes": (np.stack([mask_box(m) for m in d_masks])
                           if d_masks else np.zeros((0, 4))),
                 "scores": np.asarray(scores, np.float64),
                 "masks": (np.stack(d_masks) if d_masks
                           else np.zeros((0, h, w), bool))},
                {"boxes": (np.stack([mask_box(m) for m in g_masks])
                           if g_masks else np.zeros((0, 4))),
                 "iscrowd": np.asarray(crowd, bool),
                 "masks": (np.stack(g_masks) if g_masks
                           else np.zeros((0, h, w), bool))},
            )
        images.append(img)
    return images


def _run_production(images, n_classes, segm=False):
    ev = COCOEvaluator(list(range(n_classes)))
    for img in images:
        for k, (dts, gts) in img.items():
            ev.add(k, dts["boxes"], dts["scores"], gts["boxes"],
                   gts["iscrowd"],
                   dt_masks=dts.get("masks") if segm else None,
                   gt_masks=gts.get("masks") if segm else None)
    return ev.summarize()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_bbox_matches_pycocotools_oracle(seed):
    images = _fixture(seed)
    ours = _run_production(images, 3)
    oracle = _oracle_summarize(images, 3)
    assert set(ours) == set(oracle)
    for key in oracle:
        np.testing.assert_allclose(ours[key], oracle[key], atol=1e-9,
                                   err_msg=key)


@pytest.mark.parametrize("seed", [10, 11])
def test_segm_matches_pycocotools_oracle(seed):
    images = _seg_fixture(seed)
    ours = _run_production(images, 2, segm=True)
    oracle = _oracle_summarize(images, 2, segm=True)
    for key in oracle:
        np.testing.assert_allclose(ours[key], oracle[key], atol=1e-9,
                                   err_msg=key)


def test_crowd_absorbs_multiple_detections():
    """Hand-built: one crowd GT + two overlapping dts -> both match the crowd
    (ignored), no FPs; one real GT ensures npig > 0."""
    real = np.array([100.0, 100.0, 150.0, 150.0])
    crowd = np.array([0.0, 0.0, 60.0, 60.0])
    dts = np.stack([
        np.array([2.0, 2.0, 58.0, 58.0]),
        np.array([5.0, 5.0, 55.0, 55.0]),
        real + 1.0,
    ])
    images = [{0: (
        {"boxes": dts, "scores": np.array([0.9, 0.8, 0.7])},
        {"boxes": np.stack([real, crowd]),
         "iscrowd": np.array([False, True])},
    )}]
    ours = _run_production(images, 1)
    oracle = _oracle_summarize(images, 1)
    for key in oracle:
        np.testing.assert_allclose(ours[key], oracle[key], atol=1e-9,
                                   err_msg=key)
    # the two crowd-matched dts are ignored, the real match is a TP at every
    # threshold where IoU(real+1, real) clears it -> AP50 == 1.0
    assert ours["AP50"] == 1.0


def test_maxdets_truncation_changes_ar():
    """12 good detections on 12 GT in one image: AR@10 < AR@100 and matches
    the oracle exactly (post-hoc truncation semantics)."""
    rng = np.random.RandomState(7)
    gts = np.stack([_rand_box(rng, 30, 60) + i * 400 for i in range(12)])
    dts = np.stack([_jitter(rng, b, 1.0) for b in gts])
    scores = np.linspace(0.9, 0.3, 12)
    images = [{0: (
        {"boxes": dts, "scores": scores},
        {"boxes": gts, "iscrowd": np.zeros(12, bool)},
    )}]
    ours = _run_production(images, 1)
    oracle = _oracle_summarize(images, 1)
    for key in oracle:
        np.testing.assert_allclose(ours[key], oracle[key], atol=1e-9,
                                   err_msg=key)
    assert ours["AR@10"] < ours["AR@100"]
    assert ours["AR@1"] < ours["AR@10"]
