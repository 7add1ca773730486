"""COCO detection dataset: JSON parsing, record materialization, host decode.

Mirrors the data contract of the reference's ``COCOHP``
(``centernet/src/dataset.py``): offline conversion stores raw JPEG bytes +
boxes per record (``transfer_coco_to_mindrecord:146-205``); training streams
records, decodes on host, and all augmentation runs on device
(``minddet_tpu.data.transforms``). pycocotools is not required — JSON parsing
is plain ``json`` and evaluation uses ``minddet_tpu.data.coco_eval``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from minddet_tpu.core.registry import DATASETS
from minddet_tpu.data.coco_eval import COCOEvaluator
from minddet_tpu.data.records import RecordDataset, write_records


def load_coco_json(ann_file: str) -> Tuple[List[Dict], Dict[int, List[Dict]], List[Dict]]:
    """-> (images, annotations-by-image-id, categories)."""
    with open(ann_file) as f:
        coco = json.load(f)
    by_img: Dict[int, List[Dict]] = {}
    for ann in coco.get("annotations", []):
        by_img.setdefault(ann["image_id"], []).append(ann)
    return coco["images"], by_img, coco.get("categories", [])


def category_mapping(categories: List[Dict]) -> Dict[int, int]:
    """COCO category id -> contiguous [0, C) label."""
    return {c["id"]: i for i, c in enumerate(sorted(categories, key=lambda c: c["id"]))}


def coco_examples(
    ann_file: str, image_dir: str, skip_empty: bool = True,
    with_masks: bool = False,
) -> Iterator[Dict[str, Any]]:
    """Yield record dicts: jpeg bytes, hw, boxes xyxy, labels, iscrowd, id
    (+ JSON-encoded polygon segmentations when with_masks)."""
    import json as _json

    images, by_img, categories = load_coco_json(ann_file)
    cat_map = category_mapping(categories)
    for img in images:
        anns = by_img.get(img["id"], [])
        boxes, labels, crowd, segs = [], [], [], []
        for a in anns:
            x, y, w, h = a["bbox"]
            if w <= 0 or h <= 0:
                continue
            boxes.append([x, y, x + w, y + h])
            labels.append(cat_map[a["category_id"]])
            crowd.append(a.get("iscrowd", 0))
            if with_masks:
                segs.append(a.get("segmentation", []))
        if skip_empty and not boxes:
            continue
        path = os.path.join(image_dir, img["file_name"])
        with open(path, "rb") as f:
            jpeg = f.read()
        ex = {
            "jpeg": jpeg,
            "hw": np.array([img["height"], img["width"]], np.int32),
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int32),
            "iscrowd": np.asarray(crowd, np.int32),
            "image_id": np.asarray(img["id"], np.int64),
        }
        if with_masks:
            ex["segmentations"] = _json.dumps(segs).encode()
        yield ex


def convert_coco_to_records(
    ann_file: str, image_dir: str, out_prefix: str, shard_size: int = 4096,
    with_masks: bool = False,
) -> List[str]:
    """Offline materialization (the transfer_coco_to_mindrecord equivalent)."""
    return write_records(
        out_prefix, coco_examples(ann_file, image_dir, with_masks=with_masks),
        shard_size,
    )


def _decode_jpeg(data: bytes) -> np.ndarray:
    import cv2

    arr = np.frombuffer(data, np.uint8)
    img = cv2.imdecode(arr, cv2.IMREAD_COLOR)  # BGR, matching the reference
    return img


@DATASETS.register_module()
class CocoDetection:
    """Record-backed COCO dataset producing fixed-shape host examples.

    Each example: image (max_h, max_w, 3) f32 zero-padded, hw (2,), boxes
    (max_objs, 4), labels (max_objs,), mask (max_objs,), image_id. Device-side
    transforms + target generation consume these directly.
    """

    def __init__(
        self,
        record_pattern: str,
        max_hw: Tuple[int, int] = (640, 640),
        max_objs: int = 128,
        keep_raw: bool = False,
        with_masks: bool = False,
        mask_stride: int = 4,
    ):
        """``with_masks`` adds per-object GT bitmaps (requires records written
        with ``convert_coco_to_records(..., with_masks=True)``), rasterized at
        ``1/mask_stride`` of canvas resolution — the Mask R-CNN loss crops
        28x28 targets per ROI, so full-resolution dense bitmaps would waste
        16x the host->device bandwidth for no accuracy."""
        self.records = RecordDataset(record_pattern)
        self.max_hw = max_hw
        self.max_objs = max_objs
        self.keep_raw = keep_raw
        self.with_masks = with_masks
        self.mask_stride = mask_stride

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rec = self.records[idx]
        img = _decode_jpeg(rec["jpeg"]).astype(np.float32)
        mh, mw = self.max_hw
        h, w = img.shape[:2]
        # downscale oversize images on host (rare; device affine handles rest)
        if h > mh or w > mw:
            import cv2

            s = min(mh / h, mw / w)
            img = cv2.resize(img, (int(w * s), int(h * s)))
            rec["boxes"] = rec["boxes"] * s
            h, w = img.shape[:2]
        canvas = np.zeros((mh, mw, 3), np.float32)
        canvas[:h, :w] = img

        o = self.max_objs
        boxes = np.zeros((o, 4), np.float32)
        labels = np.zeros((o,), np.int32)
        mask = np.zeros((o,), bool)
        n = min(len(rec["boxes"]), o)
        boxes[:n] = rec["boxes"][:n]
        labels[:n] = rec["labels"][:n]
        mask[:n] = rec["iscrowd"][:n] == 0
        out = {
            "image": canvas,
            "hw": np.array([h, w], np.int32),
            "boxes": boxes,
            "labels": labels,
            "mask": mask,
            "image_id": rec["image_id"],
        }
        if self.with_masks:
            out["bitmaps"] = self._bitmaps(rec, h, w)
        if self.keep_raw:
            out["raw_boxes"] = rec["boxes"]
            out["raw_labels"] = rec["labels"]
            out["raw_iscrowd"] = rec["iscrowd"]
            if "segmentations" in rec:
                out["raw_segmentations"] = rec["segmentations"]
        return out

    def _bitmaps(self, rec: Dict[str, Any], h: int, w: int) -> np.ndarray:
        """(mh/s, mw/s, max_objs) uint8 GT bitmaps in canvas space, matching
        the image placement in ``__getitem__`` (top-left, scale ``h/ih``)."""
        import cv2

        s = self.mask_stride
        mh, mw = self.max_hw
        out = np.zeros((mh // s, mw // s, self.max_objs), np.uint8)
        segs = rec.get("segmentations")
        if segs is None:
            return out
        seg_list = json.loads(segs.decode() if isinstance(segs, bytes) else segs)
        ih, iw = int(rec["hw"][0]), int(rec["hw"][1])
        bh, bw = max(1, round(h / s)), max(1, round(w / s))
        for i, seg in enumerate(seg_list[: self.max_objs]):
            if not seg:
                continue
            m = rasterize_polygons(seg, ih, iw)
            m = cv2.resize(m, (bw, bh), interpolation=cv2.INTER_NEAREST)
            out[:bh, :bw, i] = m
        return out


def evaluate_coco_detections(
    dataset: CocoDetection,
    predictions: Dict[int, Dict[str, np.ndarray]],
    num_classes: int = 80,
    segm: bool = False,
) -> Dict[str, float]:
    """predictions: image_id -> {boxes (N,4) original pixels, scores, labels,
    [masks (N,H,W) bool when ``segm``]}.

    Runs the COCO-protocol evaluator over the dataset's GT (the reference's
    ``run_eval`` -> COCOeval path, centernet/eval.py:179-188). ``segm=True``
    switches to mask-IoU matching (pycocotools iouType='segm'): GT bitmaps
    are rasterized from the records' stored polygon/RLE segmentations.
    """
    import json as _json

    ev = COCOEvaluator(list(range(num_classes)))
    empty = {"boxes": np.zeros((0, 4)), "scores": np.zeros(0),
             "labels": np.zeros(0)}
    for i in range(len(dataset.records)):
        rec = dataset.records[i]
        img_id = int(rec["image_id"])
        pred = predictions.get(img_id, empty)
        gt_masks = None
        if segm:
            ih, iw = int(rec["hw"][0]), int(rec["hw"][1])
            segs = rec.get("segmentations")
            seg_list = _json.loads(
                segs.decode() if isinstance(segs, bytes) else segs
            ) if segs is not None else []
            gt_masks = np.zeros((len(rec["boxes"]), ih, iw), bool)
            for gi, seg in enumerate(seg_list[: len(rec["boxes"])]):
                if seg:
                    gt_masks[gi] = rasterize_polygons(seg, ih, iw) > 0
        for c in range(num_classes):
            gm = rec["labels"] == c
            pm = np.asarray(pred["labels"]) == c
            ev.add(
                c,
                np.asarray(pred["boxes"])[pm],
                np.asarray(pred["scores"])[pm],
                rec["boxes"][gm],
                rec["iscrowd"][gm].astype(bool),
                dt_masks=(np.asarray(pred["masks"])[pm]
                          if segm and "masks" in pred else
                          np.zeros((int(pm.sum()),) + gt_masks.shape[1:], bool)
                          if segm else None),
                gt_masks=gt_masks[gm] if segm else None,
            )
    return ev.summarize()


def rasterize_polygons(
    segmentation, height: int, width: int
) -> np.ndarray:
    """COCO polygon segmentation -> (H, W) uint8 bitmap (host-side, cv2).

    Replaces pycocotools' maskUtils.frPyObjects/decode for the polygon case;
    RLE segmentations (crowd regions) are decoded with a small pure-python
    RLE reader.
    """
    import cv2

    mask = np.zeros((height, width), np.uint8)
    if isinstance(segmentation, dict):  # uncompressed RLE {counts, size}
        counts = segmentation["counts"]
        h, w = segmentation["size"]
        if isinstance(counts, list):  # uncompressed
            flat = np.zeros(h * w, np.uint8)
            pos, val = 0, 0
            for run in counts:
                if val:
                    flat[pos : pos + run] = 1
                pos += run
                val ^= 1
            mask = flat.reshape(w, h).T  # RLE is column-major
            if (h, w) != (height, width):
                mask = cv2.resize(mask, (width, height), interpolation=cv2.INTER_NEAREST)
        return mask
    for poly in segmentation:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask


def paste_masks_to_image(
    masks: np.ndarray,       # (D, m, m) float [0,1] ROI-space mask probs
    boxes: np.ndarray,       # (D, 4) xyxy absolute pixels (target image space)
    height: int,
    width: int,
    threshold: float = 0.5,
) -> np.ndarray:
    """Paste per-detection ROI masks to full image resolution -> (D, H, W)
    bool. The Mask R-CNN paste step (the mmdet/detectron ``paste_masks_in_
    image`` equivalent, absent from the reference which ships no mask model):
    bilinear-resize each 28x28 mask into its box, threshold at 0.5.
    Host-side eval utility — prediction masks arrive per-ROI from
    ``FasterRCNN.predict``."""
    import cv2

    d = len(masks)
    out = np.zeros((d, height, width), bool)
    for i in range(d):
        x1, y1, x2, y2 = boxes[i]
        x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
        x2i, y2i = int(np.ceil(x2)), int(np.ceil(y2))
        x1c, y1c = max(x1i, 0), max(y1i, 0)
        x2c, y2c = min(x2i, width), min(y2i, height)
        bw, bh = x2i - x1i, y2i - y1i
        if bw <= 0 or bh <= 0 or x2c <= x1c or y2c <= y1c:
            continue
        m = cv2.resize(masks[i].astype(np.float32), (bw, bh),
                       interpolation=cv2.INTER_LINEAR)
        out[i, y1c:y2c, x1c:x2c] = (
            m[y1c - y1i : y2c - y1i, x1c - x1i : x2c - x1i] >= threshold
        )
    return out


def example_gt_bitmaps(rec: Dict[str, Any], max_objs: int, hw) -> np.ndarray:
    """Per-object GT bitmaps (H, W, max_objs) for Mask R-CNN training.

    Requires records written with convert_coco_to_records(..., with_masks=True).
    """
    h, w = hw
    out = np.zeros((h, w, max_objs), np.float32)
    segs = rec.get("segmentations")
    if segs is None:
        return out
    import json as _json

    seg_list = _json.loads(segs.decode() if isinstance(segs, bytes) else segs)
    ih, iw = int(rec["hw"][0]), int(rec["hw"][1])
    for i, seg in enumerate(seg_list[:max_objs]):
        if not seg:
            continue
        m = rasterize_polygons(seg, ih, iw)
        out[:ih, :iw, i] = m[: min(ih, h), : min(iw, w)]
    return out
