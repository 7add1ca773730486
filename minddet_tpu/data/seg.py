"""Semantic-segmentation dataset: record materialization + host loading.

The reference README promises DeepLabV3/+ and UNet but ships no segmentation
data pipeline at all (the model dirs are absent; ``minddet/data/__init__.py``
is a stub). This is the full path the segmentors train from: (image, mask)
pairs -> fixed-shape ArrayRecord shards -> ``SegDataset`` host examples ->
``seg_batches`` (train.py) / ``segmentation_evaluate`` (evaluate.py).

Records store uint8 images resized to a fixed ``image_hw`` at conversion time
(masks nearest-neighbour) so every downstream batch is one static shape —
the XLA-friendly equivalent of the MindRecord materialization step the
reference's other pipelines use (SURVEY.md §1-L1).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

from minddet_tpu.core.registry import DATASETS
from minddet_tpu.data.records import RecordDataset, write_records

# shared with the detection pipeline (transforms.normalize constants)
SEG_MEAN = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
SEG_STD = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def seg_normalize(images: np.ndarray) -> np.ndarray:
    """uint8/float [0,255] images -> normalized float32 (train & eval use
    the SAME constants so checkpoints transfer between the two paths)."""
    return (np.asarray(images, np.float32) / 255.0 - SEG_MEAN) / SEG_STD


def seg_examples(
    image_dir: str,
    mask_dir: str,
    image_hw: Tuple[int, int] = (512, 512),
    ignore_label: int = 255,
) -> Iterator[Dict[str, Any]]:
    """Pair images with same-stem mask PNGs, resize both to ``image_hw``.

    Matches the VOC/Cityscapes directory convention (mask pixel value =
    class id, ``ignore_label`` for void)."""
    import cv2

    # remember the ACTUAL filename per stem: re-probing with lowercased
    # extensions would miss e.g. 'A.JPG' on case-sensitive filesystems
    stems: List[Tuple[str, str]] = []
    for f in sorted(os.listdir(image_dir)):
        stem, ext = os.path.splitext(f)
        if ext.lower() in IMG_EXTS:
            stems.append((stem, f))
    h, w = image_hw
    for stem, fname in stems:
        img_path = os.path.join(image_dir, fname)
        mask_path = None
        for e in (".png", ".bmp"):
            cand = os.path.join(mask_dir, stem + e)
            if os.path.exists(cand):
                mask_path = cand
                break
        if mask_path is None:
            continue
        img = cv2.imread(img_path, cv2.IMREAD_COLOR)  # BGR like the det path
        mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
        yield {
            "image": cv2.resize(img, (w, h),
                                interpolation=cv2.INTER_LINEAR).astype(np.uint8),
            "mask": cv2.resize(mask, (w, h),
                               interpolation=cv2.INTER_NEAREST).astype(np.uint8),
            "hw": np.array(img.shape[:2], np.int32),
            "ignore_label": np.asarray(ignore_label, np.int32),
        }


def convert_seg_to_records(
    image_dir: str,
    mask_dir: str,
    out_prefix: str,
    image_hw: Tuple[int, int] = (512, 512),
    shard_size: int = 2048,
    ignore_label: int = 255,
) -> List[str]:
    """Offline materialization for the segmentation pipeline."""
    return write_records(
        out_prefix,
        seg_examples(image_dir, mask_dir, image_hw, ignore_label),
        shard_size,
    )


@DATASETS.register_module()
class SegDataset:
    """Record-backed segmentation dataset producing train-ready examples.

    Each example: image (H, W, 3) normalized float32, mask (H, W) int32,
    valid (H, W) bool (False at ignore_label pixels). Train-time
    augmentation is a horizontal flip (applied to image+mask together);
    photometric jitter belongs on device if ever needed.
    """

    def __init__(self, record_pattern, augment: bool = False, seed: int = 0):
        self.records = RecordDataset(record_pattern)
        self.augment = augment
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rec = self.records[idx]
        img = np.asarray(rec["image"])
        mask = np.asarray(rec["mask"])
        if self.augment and self._rng.rand() < 0.5:
            img = img[:, ::-1]
            mask = mask[:, ::-1]
        ignore = int(rec.get("ignore_label", 255))
        mask = mask.astype(np.int32)
        valid = mask != ignore
        return {
            "image": seg_normalize(img),
            "mask": np.where(valid, mask, 0).astype(np.int32),
            "valid": valid,
        }
