"""Unified evaluation entry point (COCO mAP / KITTI AP / mIoU).

Replaces the reference's per-model eval scripts (``centernet/eval.py``,
``pointpillars/eval.py``, ``centerpoint/tools_ms/eval.py``). The device side
is one fused predict program (forward + decode + NMS); the host only
accumulates protocol metrics. ``main`` dispatches on the config's data type:
COCO (fixed-res zoo path or CenterNet's keep-res + soft-NMS protocol), KITTI
(camera-frame bbox/BEV/3D/AOS), or segmentation mIoU.

    python -m minddet_tpu.train.evaluate --config configs/centernet_r18_coco.yaml \
        --checkpoint runs/default/ckpt --records 'data/coco/val-*.arrayrecord'
"""

from __future__ import annotations

import argparse
from collections import defaultdict
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.core.config import Config
from minddet_tpu.core.metrics import logger
from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.data.coco import CocoDetection, evaluate_coco_detections
from minddet_tpu.data.transforms import eval_affine, warp_images

import minddet_tpu.train.train  # noqa: F401  (populates the registry)


def _pad_batch(arrays: np.ndarray, batch_size: int) -> np.ndarray:
    """Pad a stacked host batch to ``batch_size`` by repeating the last row
    so the jitted predict keeps one shape; callers slice outputs back to the
    real count. This keeps tail frames in the protocol instead of dropping
    ``n % batch_size`` images (which would count as GT with zero dets)."""
    pad = batch_size - arrays.shape[0]
    if pad <= 0:
        return arrays
    return np.concatenate([arrays, np.repeat(arrays[-1:], pad, axis=0)], 0)


def coco_evaluate(model, variables, records: str, image_hw, num_classes: int,
                  batch_size: int = 8, max_images: int = 0,
                  segm: bool = False, predict_fn=None) -> Dict[str, float]:
    """Fixed-resolution eval path (zoo detectors): warp to ``image_hw``,
    fused predict, inverse-affine back to original pixels.

    ``segm=True`` (Mask R-CNN): the fused predict also returns per-ROI 28x28
    masks; they are pasted to original image resolution on host
    (``paste_masks_to_image``) and scored with the mask-IoU protocol
    (pycocotools iouType='segm'); bbox stats are reported alongside with a
    ``segm_`` prefix on the mask numbers. Requires records converted with
    ``with_masks=True``. Dense per-detection bitmaps are held for all eval
    images — shard with ``max_images`` for full-val runs."""
    from minddet_tpu.data.coco import paste_masks_to_image

    ds = CocoDetection(records, max_objs=128, keep_raw=True)
    n = len(ds)
    if max_images:
        n = min(n, max_images)

    if predict_fn is not None:
        # offline path: a reloaded exported program replaces the in-memory
        # model (evaluate.py --exported; the reference's 310-postprocess /
        # eval_mindir role)
        predict = predict_fn
    else:
        @jax.jit
        def predict(image):
            return model.apply(variables, image, method=model.predict)

    predictions = {}
    for start in range(0, n, batch_size):
        exs = [ds[i] for i in range(start, min(start + batch_size, n))]
        images = jnp.asarray(
            _pad_batch(np.stack([e["image"] for e in exs]), batch_size))
        hw = jnp.asarray(
            _pad_batch(np.stack([e["hw"] for e in exs]), batch_size))
        aff = eval_affine(hw, image_hw)
        warped = warp_images(images, aff, tuple(image_hw))
        out = predict(warped)
        roi_masks = None
        if isinstance(out, dict):
            boxes = np.asarray(out["boxes"], np.float64)
            scores = np.asarray(out["scores"], np.float64)
            labels = np.asarray(out["labels"], np.int64)
            if segm:
                roi_masks = np.asarray(out["masks"], np.float32)
        else:  # CenterNet layout: (B, K, 6) at output stride 4
            det = np.asarray(out, np.float64)
            boxes = det[..., :4] * 4.0
            scores = det[..., 4]
            labels = det[..., 5].astype(np.int64)
        # map back to original pixels with the forward affine
        fwd = np.asarray(aff)  # output->input, exactly what we need
        for bi, ex in enumerate(exs):
            m = fwd[bi]
            b = boxes[bi]
            x1 = m[0, 0] * b[:, 0] + m[0, 2]
            y1 = m[1, 1] * b[:, 1] + m[1, 2]
            x2 = m[0, 0] * b[:, 2] + m[0, 2]
            y2 = m[1, 1] * b[:, 3] + m[1, 2]
            pred = {
                "boxes": np.stack([x1, y1, x2, y2], -1),
                "scores": scores[bi],
                "labels": labels[bi],
            }
            if roi_masks is not None:
                ih, iw = int(ex["hw"][0]), int(ex["hw"][1])
                pred["masks"] = paste_masks_to_image(
                    roi_masks[bi], pred["boxes"], ih, iw)
            predictions[int(ex["image_id"])] = pred
    stats = evaluate_coco_detections(ds, predictions, num_classes)
    if segm:
        mask_stats = evaluate_coco_detections(
            ds, predictions, num_classes, segm=True)
        stats.update({f"segm_{k}": v for k, v in mask_stats.items()})
    return stats


# ---------------------------------------------------------------------------
# CenterNet baseline protocol: keep-res |31+1 padding, per-class soft-NMS,
# top-100 cross-class merge, multi-scale (reference eval.py:110-162,
# post_process.py:36-61, dataset.py:223-257)
# ---------------------------------------------------------------------------

def _keep_res_hw(h: int, w: int, scale: float, bucket: int) -> tuple:
    """Reference padding ``(dim|31)+1`` then rounded up to ``bucket`` so XLA
    compiles one program per bucket instead of per image shape. Scale-1
    centered placement makes the extra border protocol-neutral (the affine
    in ``pre_process_for_test`` pads, never resizes)."""
    nh, nw = int(h * scale), int(w * scale)
    ih, iw = (nh | 31) + 1, (nw | 31) + 1
    return -(-ih // bucket) * bucket, -(-iw // bucket) * bucket


def _soft_nms_per_class(boxes, scores, labels, num_classes, cap=128):
    """Per-class Gaussian soft-NMS, all classes in ONE vmapped device call
    (the reference loops a Cython ext per class, post_process.py:44-52)."""
    from minddet_tpu.ops.nms import soft_nms

    cls_boxes = np.zeros((num_classes, cap, 4), np.float32)
    cls_scores = np.zeros((num_classes, cap), np.float32)
    for j in range(num_classes):
        sel = np.nonzero(labels == j)[0]
        if len(sel) > cap:
            sel = sel[np.argsort(-scores[sel])[:cap]]
        cls_boxes[j, : len(sel)] = boxes[sel]
        cls_scores[j, : len(sel)] = scores[sel]
    new_scores = np.asarray(
        jax.vmap(
            lambda b, s: soft_nms(b, s, sigma=0.5, score_threshold=1e-3)[0]
        )(jnp.asarray(cls_boxes), jnp.asarray(cls_scores))
    )
    out_b, out_s, out_l = [], [], []
    for j in range(num_classes):
        keep = new_scores[j] > 0
        out_b.append(cls_boxes[j][keep])
        out_s.append(new_scores[j][keep])
        out_l.append(np.full(int(keep.sum()), j, np.int64))
    return (np.concatenate(out_b) if out_b else np.zeros((0, 4)),
            np.concatenate(out_s), np.concatenate(out_l))


def centernet_evaluate(
    model,
    variables,
    records: str,
    num_classes: int = 80,
    scales: Sequence[float] = (1.0,),
    bucket: int = 128,
    use_soft_nms: bool = True,
    max_per_image: int = 100,
    down_ratio: int = 4,
    max_images: int = 0,
    batch_size: int = 4,
) -> Dict[str, float]:
    """The reference's 28.7-mAP protocol: keep-res padded eval at native
    scale, per-class soft-NMS, cross-class top-100 merge, optional
    multi-scale. Images are grouped by padded-shape bucket so each bucket
    compiles once and batches."""
    # max_hw larger than any COCO frame so keep-res never host-downscales
    ds = CocoDetection(records, max_hw=(1024, 1024), max_objs=128, keep_raw=True)
    n = len(ds)
    if max_images:
        n = min(n, max_images)

    @jax.jit
    def predict(image):
        return model.apply(variables, image, method=model.predict)

    # accumulate raw (boxes, scores, labels) per image across scales
    raw = defaultdict(lambda: ([], [], []))
    for scale in scales:
        groups = defaultdict(list)
        for i in range(n):  # stored original hw; no jpeg decode needed yet
            h, w = ds.records[i]["hw"]
            groups[_keep_res_hw(int(h), int(w), scale, bucket)].append(i)
        for (ih, iw), items in groups.items():
            for start in range(0, len(items), batch_size):
                chunk = items[start : start + batch_size]
                exs = [ds[i] for i in chunk]
                images = jnp.asarray(np.stack([e["image"] for e in exs]))
                # scale-1 centered placement: output->input affine
                affs = np.zeros((len(exs), 2, 3), np.float32)
                metas = []
                for bi, e in enumerate(exs):
                    h, w = e["hw"]
                    ox = (iw - w * scale) / 2.0
                    oy = (ih - h * scale) / 2.0
                    affs[bi] = [[1 / scale, 0, -ox / scale],
                                [0, 1 / scale, -oy / scale]]
                    metas.append((ox, oy))
                pad = batch_size - len(exs)
                if pad:  # keep the jit shape fixed within a bucket
                    images = jnp.concatenate(
                        [images, jnp.zeros((pad,) + images.shape[1:])], 0)
                    affs = np.concatenate(
                        [affs, np.tile(affs[-1:], (pad, 1, 1))], 0)
                warped = warp_images(images, jnp.asarray(affs), (ih, iw))
                det = np.asarray(predict(warped), np.float64)[: len(exs)]
                for bi, e in enumerate(exs):
                    ox, oy = metas[bi]
                    b = det[bi, :, :4] * down_ratio
                    x1 = (b[:, 0] - ox) / scale
                    y1 = (b[:, 1] - oy) / scale
                    x2 = (b[:, 2] - ox) / scale
                    y2 = (b[:, 3] - oy) / scale
                    bb, ss, ll = raw[int(e["image_id"])]
                    bb.append(np.stack([x1, y1, x2, y2], -1))
                    ss.append(det[bi, :, 4])
                    ll.append(det[bi, :, 5].astype(np.int64))

    predictions = {}
    for img_id, (bb, ss, ll) in raw.items():
        boxes = np.concatenate(bb).astype(np.float32)
        scores = np.concatenate(ss).astype(np.float32)
        labels = np.concatenate(ll)
        if use_soft_nms:
            boxes, scores, labels = _soft_nms_per_class(
                boxes, scores, labels, num_classes,
                cap=max(128, len(scales) * 128),
            )
        if len(scores) > max_per_image:  # top-100 merge (post_process.py:53-61)
            kth = len(scores) - max_per_image
            thresh = np.partition(scores, kth)[kth]
            keep = scores >= thresh
            boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
        predictions[img_id] = {"boxes": boxes, "scores": scores,
                               "labels": labels}
    return evaluate_coco_detections(ds, predictions, num_classes)


# ---------------------------------------------------------------------------
# KITTI: full official table incl. camera-frame bbox AP + AOS
# ---------------------------------------------------------------------------

def kitti_evaluate(
    model,
    variables,
    records: str,
    classes: Sequence[str] = ("Car",),
    batch_size: int = 4,
    max_frames: int = 0,
    score_threshold: float = 0.3,
    metrics: Sequence[str] = ("bbox", "bev", "3d"),
    compute_aos: bool = True,
) -> Dict[str, Dict]:
    """PointPillars -> official KITTI AP over bbox/bev/3d (+AOS).

    The device side is one fused program (voxelize + forward + decode +
    rotated NMS via ``predict_from_points``); detections are then projected
    lidar->camera->image exactly like ``predict_kitti_to_anno``
    (predict.py:331-396) so the BASELINE bbox-AP/AOS numbers are computable.
    GT annos come from the records' original camera-frame label fields
    (difficulty filtering needs true 2D boxes/occlusion/truncation).
    """
    from minddet_tpu.data.kitti import KittiDetection, detections_to_kitti_annos
    from minddet_tpu.data.kitti_eval import get_official_eval_result

    ds = KittiDetection(records, keep_raw=True)
    n = len(ds)
    if max_frames:
        n = min(n, max_frames)

    @jax.jit
    def predict(points, mask):
        return model.apply(
            variables, points, mask, method=model.predict_from_points
        )

    gt_annos, dt_annos = [], []
    for start in range(0, n, batch_size):
        exs = [ds[i] for i in range(start, min(start + batch_size, n))]
        pts = jnp.asarray(
            _pad_batch(np.stack([e["points"] for e in exs]), batch_size))
        msk = jnp.asarray(
            _pad_batch(np.stack([e["points_mask"] for e in exs]), batch_size))
        out = predict(pts, msk)
        for bi, ex in enumerate(exs):
            gt_annos.append({
                "name": np.asarray(ex["anno_name"]),
                "bbox": ex["anno_bbox"],
                "alpha": ex["anno_alpha"],
                "occluded": ex["anno_occluded"],
                "truncated": ex["anno_truncated"],
                "location": ex["anno_location"],
                "dimensions": ex["anno_dimensions"],
                "rotation_y": ex["anno_rotation_y"],
            })
            sc = np.asarray(out["scores"][bi])
            keep = sc > score_threshold
            dt_annos.append(detections_to_kitti_annos(
                np.asarray(out["boxes"][bi])[keep], sc[keep],
                np.asarray(out["labels"][bi])[keep], classes,
                np.asarray(ex["Trv2c_rect"]), np.asarray(ex["P2"]),
                np.asarray(ex["img_shape"]),
            ))
    return get_official_eval_result(
        gt_annos, dt_annos, classes=classes, metrics=metrics,
        compute_aos=compute_aos,
    )


# ---------------------------------------------------------------------------
# nuScenes: mAP / NDS incl. attribute term via the velocity heuristic
# ---------------------------------------------------------------------------

def nuscenes_evaluate(
    model,
    variables,
    records: str,
    batch_size: int = 2,
    max_frames: int = 0,
    score_threshold: float = 0.1,
    tta: bool = False,
    refined: bool = False,
) -> Dict[str, float]:
    """CenterPoint -> nuScenes protocol metrics (mAP@{0.5,1,2,4} m, TP
    errors incl. mAAE via the CenterPoint submission attribute heuristic,
    NDS). One fused device program per batch (voxelize + forward + per-task
    decode + rotated NMS); the host only does protocol matching.

    ``refined=True`` routes through ``predict_refined`` (two-stage models:
    stage-2 rescore + box refinement in the same fused program)."""
    from minddet_tpu.data.nuscenes import (
        DETECTION_CLASSES,
        NuScenesDetection,
        infer_attributes,
    )
    from minddet_tpu.data.nuscenes_eval import evaluate_nuscenes

    ds = NuScenesDetection(records, cbgs=False, augment=False)
    n = len(ds)
    if max_frames:
        n = min(n, max_frames)
    if n == 0:
        raise ValueError("need at least one frame")

    # --options tta=true switches to double-flip TTA (reference DoubleFlip,
    # pipelines/test_aug.py) — 4 flipped clouds, map-space merge, one decode;
    # --options refined=true uses the two-stage predict
    if refined:
        if not hasattr(model, "predict_refined"):
            raise ValueError(
                "refined=true needs a two-stage model (CenterPointTwoStage)")
        method = model.predict_refined
    else:
        method = (model.predict_tta_double_flip if tta
                  else model.predict_from_points)

    @jax.jit
    def predict(points, mask):
        return model.apply(variables, points, mask, method=method)

    gt_by_class = {c: [] for c in DETECTION_CLASSES}
    dt_by_class = {c: [] for c in DETECTION_CLASSES}
    for start in range(0, n, batch_size):
        exs = [ds[i] for i in range(start, min(start + batch_size, n))]
        pts = jnp.asarray(
            _pad_batch(np.stack([e["points"] for e in exs]), batch_size))
        msk = jnp.asarray(
            _pad_batch(np.stack([e["points_mask"] for e in exs]), batch_size))
        out = predict(pts, msk)
        for bi, ex in enumerate(exs):
            gm = ex["gt_mask"]
            boxes = np.asarray(out["boxes"][bi])
            scores = np.asarray(out["scores"][bi])
            labels = np.asarray(out["labels"][bi])
            keep = scores > score_threshold
            boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
            attrs = infer_attributes(boxes, labels + 1)
            for ci, cls in enumerate(DETECTION_CLASSES):
                g = ex["gt_classes"][gm] == ci + 1
                gt_by_class[cls].append({
                    "boxes": ex["gt_boxes"][gm][g],
                    "attrs": ex["gt_attrs"][gm][g],
                })
                d = labels == ci
                dt_by_class[cls].append({
                    "boxes": boxes[d], "scores": scores[d],
                    "attrs": attrs[d],
                })
    return evaluate_nuscenes(gt_by_class, dt_by_class, DETECTION_CLASSES)


def nuscenes_tracking_evaluate(
    model,
    variables,
    records: str,
    batch_size: int = 2,
    max_frames: int = 0,
    score_threshold: float = 0.1,
    refined: bool = False,
) -> Dict[str, float]:
    """CenterPoint detections -> greedy velocity tracker -> AMOTA/AMOTP.

    The reference quotes CenterPoint's tracking AMOTA
    (``minddet/models/centerpoint/README.md:13``) but ships neither tracker
    nor tracking eval; this route supplies both (``minddet_tpu.track`` +
    ``data/nuscenes_track_eval``). Per-frame detection stays the single fused
    device program from :func:`nuscenes_evaluate`; frames are grouped by
    scene, detections are moved to the global frame via each record's
    ``global_from_lidar``, linked by the greedy tracker, and scored with the
    clean-room tracking protocol against ``gt_track_ids``.

    Requires records written with tracking metadata (``create_nuscenes_records``
    after the tracking fields landed); raises otherwise.
    """
    from minddet_tpu.data.nuscenes import DETECTION_CLASSES, NuScenesDetection
    from minddet_tpu.data.nuscenes_track_eval import evaluate_tracking
    from minddet_tpu.track import track_sequence

    ds = NuScenesDetection(records, cbgs=False, augment=False)
    n = len(ds)
    if max_frames:
        n = min(n, max_frames)
    if n == 0:
        raise ValueError("need at least one frame")
    if "scene" not in ds[0]:
        raise ValueError(
            "records lack tracking metadata (scene/timestamp/"
            "global_from_lidar/gt_track_ids); regenerate with "
            "create_nuscenes_records"
        )

    if refined:
        if not hasattr(model, "predict_refined"):
            raise ValueError(
                "refined=true needs a two-stage model (CenterPointTwoStage)")
        method = model.predict_refined
    else:
        method = model.predict_from_points

    @jax.jit
    def predict(points, mask):
        return model.apply(variables, points, mask, method=method)

    def to_global(T, xyz, vel):
        """(K,3) lidar centers + (K,2) lidar-frame velocity -> global BEV."""
        c = xyz @ T[:3, :3].T + T[:3, 3]
        v = vel @ T[:2, :2].T
        return c[:, :2], v

    scenes: Dict[bytes, list] = {}
    for start in range(0, n, batch_size):
        exs = [ds[i] for i in range(start, min(start + batch_size, n))]
        pts = jnp.asarray(
            _pad_batch(np.stack([e["points"] for e in exs]), batch_size))
        msk = jnp.asarray(
            _pad_batch(np.stack([e["points_mask"] for e in exs]), batch_size))
        out = predict(pts, msk)
        for bi, ex in enumerate(exs):
            T = np.asarray(ex["global_from_lidar"], np.float64)
            boxes = np.asarray(out["boxes"][bi])
            scores = np.asarray(out["scores"][bi])
            labels = np.asarray(out["labels"][bi])
            keep = scores > score_threshold
            boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
            dc, dv = to_global(T, boxes[:, :3], boxes[:, 6:8])
            gm = ex["gt_mask"]
            gb = ex["gt_boxes"][gm]
            gc, _ = to_global(T, gb[:, :3], gb[:, 6:8])
            scenes.setdefault(bytes(ex["scene"]), []).append({
                "timestamp": float(ex["timestamp"]),
                "ego": T[:2, 3].copy(),
                "dt_centers": dc, "dt_vel": dv, "dt_classes": labels,
                "dt_scores": scores,
                "gt_centers": gc,
                "gt_classes": ex["gt_classes"][gm].astype(np.int64) - 1,
                "gt_ids": ex["gt_track_ids"][gm].astype(np.int64),
            })

    gt_scenes, dt_scenes = [], []
    for frames in scenes.values():
        frames.sort(key=lambda f: f["timestamp"])
        ids_per_frame = track_sequence(
            [{"centers": f["dt_centers"], "velocities": f["dt_vel"],
              "classes": f["dt_classes"], "scores": f["dt_scores"],
              "timestamp": f["timestamp"]} for f in frames],
            class_names=DETECTION_CLASSES)
        dt_scenes.append([
            {"centers": f["dt_centers"], "ids": ids,
             "classes": f["dt_classes"], "scores": f["dt_scores"],
             "ego": f["ego"]}
            for f, ids in zip(frames, ids_per_frame)])
        gt_scenes.append([
            {"centers": f["gt_centers"], "ids": f["gt_ids"],
             "classes": f["gt_classes"], "ego": f["ego"]}
            for f in frames])
    return evaluate_tracking(gt_scenes, dt_scenes, DETECTION_CLASSES)


# ---------------------------------------------------------------------------
# Waymo: L1/L2 AP/APH
# ---------------------------------------------------------------------------

WAYMO_EVAL_NAMES = ("Vehicle", "Pedestrian", "Cyclist")


def waymo_evaluate(
    model,
    variables,
    records: str,
    batch_size: int = 2,
    max_frames: int = 0,
    score_threshold: float = 0.1,
    range_breakdowns: bool = False,
    refined: bool = False,
) -> Dict[str, Dict[str, float]]:
    """CenterPoint -> Waymo L1/L2 AP/APH (clean-room protocol,
    ``data/waymo_eval.py``). The device side is the same fused
    voxelize+forward+decode+NMS program the nuScenes path uses; predictions
    (9D z-center boxes, zero-velocity for waymo) are converted back to the
    metric's 7D z-bottom layout. GT comes straight from the converted
    records (7D boxes + per-box lidar point counts for the L2 rule).
    Mirrors the reference's route through ``waymo_common.py:358`` without
    the TF toolkit dependency."""
    from minddet_tpu.data.waymo import WaymoDetection
    from minddet_tpu.data.waymo_eval import evaluate_waymo

    ds = WaymoDetection(records, augment=False)
    n = len(ds)
    if max_frames:
        n = min(n, max_frames)

    if refined and not hasattr(model, "predict_refined"):
        raise ValueError(
            "refined=true needs a two-stage model (CenterPointTwoStage)")
    method = model.predict_refined if refined else model.predict_from_points

    @jax.jit
    def predict(points, mask):
        return model.apply(variables, points, mask, method=method)

    gt_annos, dt_annos = [], []
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        exs = [ds[i] for i in idxs]
        pts = jnp.asarray(
            _pad_batch(np.stack([e["points"] for e in exs]), batch_size))
        msk = jnp.asarray(
            _pad_batch(np.stack([e["points_mask"] for e in exs]), batch_size))
        out = predict(pts, msk)
        for bi, (i, ex) in enumerate(zip(idxs, exs)):
            rec = ds.records[i]
            g = np.asarray(rec["gt_boxes"], np.float64).reshape(-1, 7)
            gt_annos.append({
                "boxes": g,
                "classes": np.asarray(rec["gt_classes"], np.int32),
                "num_points": np.asarray(
                    rec.get("num_points_in_gt", np.full(len(g), 100))),
            })
            boxes9 = np.asarray(out["boxes"][bi], np.float64)
            scores = np.asarray(out["scores"][bi], np.float64)
            labels = np.asarray(out["labels"][bi], np.int64)
            keep = scores > score_threshold
            boxes9, scores, labels = boxes9[keep], scores[keep], labels[keep]
            boxes7 = np.concatenate(
                [boxes9[:, :2], (boxes9[:, 2] - boxes9[:, 5] / 2)[:, None],
                 boxes9[:, 3:6], boxes9[:, 8:9]], axis=1,
            ) if len(boxes9) else np.zeros((0, 7))
            dt_annos.append({
                "boxes": boxes7,
                "classes": labels + 1,  # metric ids are 1-based
                "scores": scores,
            })
    return evaluate_waymo(gt_annos, dt_annos, classes=WAYMO_EVAL_NAMES,
                          range_breakdowns=range_breakdowns)


# ---------------------------------------------------------------------------
# Segmentation mIoU
# ---------------------------------------------------------------------------

def segmentation_evaluate(
    model, variables, records: str, num_classes: int,
    batch_size: int = 8, max_images: int = 0,
) -> Dict[str, float]:
    """Seg records -> mIoU via the fused predict (images normalized with the
    same constants the train path uses; ignore_label pixels excluded)."""
    from minddet_tpu.data.seg import SegDataset
    from minddet_tpu.models.segmentors import miou

    ds = SegDataset(records, augment=False)
    n = len(ds)
    if max_images:
        n = min(n, max_images)

    @jax.jit
    def predict(image):
        return model.apply(variables, image, method=model.predict)

    inter = np.zeros(num_classes)
    union = np.zeros(num_classes)
    for start in range(0, n, batch_size):
        recs = [ds[i] for i in range(start, min(start + batch_size, n))]
        images = jnp.asarray(_pad_batch(
            np.stack([r["image"] for r in recs]), batch_size))
        target = np.stack([r["mask"] for r in recs])
        valid = np.stack([r["valid"] for r in recs])
        pred = np.asarray(predict(images))[: len(recs)]
        for c in range(num_classes):
            inter[c] += np.sum((pred == c) & (target == c) & valid)
            union[c] += np.sum(((pred == c) | (target == c)) & valid)
    per_class = inter / np.maximum(union, 1)
    present = union > 0
    stats = {"miou": float(per_class[present].mean()) if present.any() else 0.0}
    _ = miou  # protocol shared with the in-train metric
    return stats


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="minddet_tpu evaluator")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--records", required=True)
    p.add_argument("--max-images", type=int, default=0)
    p.add_argument("--protocol", default=None,
                   choices=[None, "coco", "centernet", "kitti", "nuscenes",
                            "waymo", "miou", "segm"],
                   help="override the data-type-derived eval protocol")
    p.add_argument("--exported", default=None,
                   help="serialized StableHLO predict program (train.export);"
                        " runs the offline fixed-shape eval — the 310-style "
                        "postprocess/eval_mindir role — instead of building "
                        "the model")
    p.add_argument("--options", nargs="*", default=[])
    args = p.parse_args(argv)

    cfg = Config.fromfile(args.config).merge_from_options(args.options)
    # flat (undotted) options act as evaluator switches, e.g. tta=true
    opts = dict(o.split("=", 1) for o in args.options if "=" in o)
    mcfg = dict(cfg.model)
    model = DETECTORS.build(mcfg)
    image_hw = tuple(cfg.train.get("image_hw", (512, 512)))
    data_type = cfg.data.get("type", "coco") if "data" in cfg else "coco"
    protocol = args.protocol
    if protocol is None:
        if data_type == "kitti":
            protocol = "kitti"
        elif data_type == "nuscenes":
            protocol = "nuscenes"
        elif data_type == "waymo":
            protocol = "waymo"
        elif data_type == "seg":
            protocol = "miou"
        elif mcfg.get("type") == "CenterNet":
            protocol = "centernet"
        elif mcfg.get("type") == "MaskRCNN":
            protocol = "segm"
        else:
            protocol = "coco"

    if args.exported:
        # offline exported-program eval: batch size and resolution come from
        # the artifact's fixed export shapes; no model build / checkpoint
        # restore happens (the program embeds its weights), matching the
        # reference's eval-on-310-outputs flow
        # (centernet/postprocess.py:12-59, centerpoint/tools_ms/
        # eval_mindir.py:118)
        from minddet_tpu.train.export import load_exported_program

        fn, in_avals = load_exported_program(args.exported)
        shape = tuple(in_avals[0].shape)
        if len(shape) != 4:
            raise ValueError(
                f"--exported expects an image predict program with a "
                f"(B, H, W, 3) input; got input shape {shape}")
        stats = coco_evaluate(
            None, None, args.records, (shape[1], shape[2]),
            int(mcfg.get("num_classes", 80)), batch_size=shape[0],
            max_images=args.max_images, segm=protocol == "segm",
            predict_fn=fn,
        )
        for k, v in stats.items():
            logger.info("%s: %.4f", k, v)
        return

    # init variables with the protocol-appropriate input signature
    if protocol in ("kitti", "nuscenes", "waymo"):
        # kitti x,y,z,r; nuscenes +sweep-time; waymo intensity+elongation
        nf = int(cfg.data.get("num_features",
                              4 if protocol == "kitti" else 5))
        pts = jnp.zeros((1, 512, nf))
        variables = model.init(
            jax.random.PRNGKey(0), pts, jnp.ones((1, 512), bool),
            method=model.predict_from_points,
        )
    else:
        image = jnp.zeros((1,) + image_hw + (3,))
        # init through predict: two-stage models (Faster/Mask R-CNN) only
        # materialize their ROI heads on that path
        variables = model.init(jax.random.PRNGKey(0), image,
                               method=model.predict)
    if args.checkpoint:
        from minddet_tpu.core.checkpoint import load_pytree

        restored = load_pytree(args.checkpoint)
        variables = {"params": restored["params"],
                     "batch_stats": restored.get("batch_stats", {})}

    num_classes = int(mcfg.get("num_classes", 80))
    if protocol == "kitti":
        classes = tuple(cfg.data.get("classes", ("Car",)))
        table = kitti_evaluate(
            model, variables, args.records, classes=classes,
            max_frames=args.max_images,
        )
        for cls, ms in table.items():
            for metric, aps in ms.items():
                logger.info("%s %s AP: %s", cls, metric,
                            " / ".join(f"{a:.2f}" for a in aps))
        return
    if protocol == "waymo":
        table = waymo_evaluate(
            model, variables, args.records, max_frames=args.max_images,
            range_breakdowns=opts.get("breakdowns", "").lower()
            in ("1", "true", "yes"),
            refined=opts.get("refined", "").lower() in ("1", "true", "yes"),
        )
        for cls, ms in table.items():
            logger.info("%s: %s", cls,
                        " ".join(f"{k}={v:.2f}" for k, v in ms.items()))
        return
    if protocol == "nuscenes":
        refined = opts.get("refined", "").lower() in ("1", "true", "yes")
        if opts.get("tracking", "").lower() in ("1", "true", "yes"):
            # --options tracking=true: detections -> greedy velocity tracker
            # -> AMOTA/AMOTP (reference README quotes the number, ships no code)
            stats = nuscenes_tracking_evaluate(
                model, variables, args.records, max_frames=args.max_images,
                refined=refined,
            )
        else:
            stats = nuscenes_evaluate(
                model, variables, args.records, max_frames=args.max_images,
                tta=opts.get("tta", "").lower() in ("1", "true", "yes"),
                refined=refined,
            )
        for k, v in stats.items():
            logger.info("%s: %.4f", k, v)
        return
    if protocol == "miou":
        stats = segmentation_evaluate(
            model, variables, args.records, num_classes,
            max_images=args.max_images,
        )
    elif protocol == "centernet":
        stats = centernet_evaluate(
            model, variables, args.records, num_classes,
            max_images=args.max_images,
        )
    else:
        stats = coco_evaluate(
            model, variables, args.records, image_hw, num_classes,
            max_images=args.max_images, segm=protocol == "segm",
        )
    for k, v in stats.items():
        logger.info("%s: %.4f", k, v)


if __name__ == "__main__":
    main()
