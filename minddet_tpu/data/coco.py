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
    ann_file: str, image_dir: str, skip_empty: bool = True
) -> Iterator[Dict[str, Any]]:
    """Yield record dicts: jpeg bytes, hw, boxes xyxy, labels, iscrowd, id."""
    images, by_img, categories = load_coco_json(ann_file)
    cat_map = category_mapping(categories)
    for img in images:
        anns = by_img.get(img["id"], [])
        boxes, labels, crowd = [], [], []
        for a in anns:
            x, y, w, h = a["bbox"]
            if w <= 0 or h <= 0:
                continue
            boxes.append([x, y, x + w, y + h])
            labels.append(cat_map[a["category_id"]])
            crowd.append(a.get("iscrowd", 0))
        if skip_empty and not boxes:
            continue
        path = os.path.join(image_dir, img["file_name"])
        with open(path, "rb") as f:
            jpeg = f.read()
        yield {
            "jpeg": jpeg,
            "hw": np.array([img["height"], img["width"]], np.int32),
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int32),
            "iscrowd": np.asarray(crowd, np.int32),
            "image_id": np.asarray(img["id"], np.int64),
        }


def convert_coco_to_records(
    ann_file: str, image_dir: str, out_prefix: str, shard_size: int = 4096
) -> List[str]:
    """Offline materialization (the transfer_coco_to_mindrecord equivalent)."""
    return write_records(out_prefix, coco_examples(ann_file, image_dir), shard_size)


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
    ):
        self.records = RecordDataset(record_pattern)
        self.max_hw = max_hw
        self.max_objs = max_objs
        self.keep_raw = keep_raw

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
        if self.keep_raw:
            out["raw_boxes"] = rec["boxes"]
            out["raw_labels"] = rec["labels"]
            out["raw_iscrowd"] = rec["iscrowd"]
        return out


def evaluate_coco_detections(
    dataset: CocoDetection,
    predictions: Dict[int, Dict[str, np.ndarray]],
    num_classes: int = 80,
) -> Dict[str, float]:
    """predictions: image_id -> {boxes (N,4) original pixels, scores, labels}.

    Runs the COCO-protocol evaluator over the dataset's GT (the reference's
    ``run_eval`` -> COCOeval path, centernet/eval.py:179-188).
    """
    ev = COCOEvaluator(list(range(num_classes)))
    for i in range(len(dataset.records)):
        rec = dataset.records[i]
        img_id = int(rec["image_id"])
        pred = predictions.get(
            img_id, {"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "labels": np.zeros(0)}
        )
        for c in range(num_classes):
            gm = rec["labels"] == c
            pm = np.asarray(pred["labels"]) == c
            ev.add(
                c,
                np.asarray(pred["boxes"])[pm],
                np.asarray(pred["scores"])[pm],
                rec["boxes"][gm],
                rec["iscrowd"][gm].astype(bool),
            )
    return ev.summarize()
