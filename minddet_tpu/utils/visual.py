"""Detection visualization (boxes, labels, BEV point clouds).

Replaces the reference's ``centernet/src/visual.py`` (cv2 GT/pred drawing) —
same role, dataset-agnostic API.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

_PALETTE = np.array(
    [
        (216, 82, 24), (0, 113, 188), (118, 171, 47), (236, 176, 31),
        (125, 46, 141), (76, 189, 237), (161, 19, 46), (0, 166, 90),
    ],
    np.uint8,
)


def draw_detections(
    image: np.ndarray,
    boxes: np.ndarray,
    scores: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
    score_threshold: float = 0.3,
    thickness: int = 2,
) -> np.ndarray:
    """Draw xyxy boxes on an image (uint8 HWC BGR). Returns a copy."""
    import cv2

    img = np.ascontiguousarray(np.asarray(image, np.uint8))
    boxes = np.asarray(boxes).reshape(-1, 4)
    n = len(boxes)
    scores = np.ones(n) if scores is None else np.asarray(scores).reshape(-1)
    labels = np.zeros(n, int) if labels is None else np.asarray(labels, int).reshape(-1)
    for i in range(n):
        if scores[i] < score_threshold or labels[i] < 0:
            continue
        color = tuple(int(c) for c in _PALETTE[labels[i] % len(_PALETTE)])
        x1, y1, x2, y2 = (int(round(v)) for v in boxes[i])
        cv2.rectangle(img, (x1, y1), (x2, y2), color, thickness)
        name = (
            class_names[labels[i]]
            if class_names is not None and 0 <= labels[i] < len(class_names)
            else str(labels[i])
        )
        text = f"{name} {scores[i]:.2f}"
        cv2.putText(img, text, (x1, max(y1 - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, color, 1, cv2.LINE_AA)
    return img


def draw_bev(
    points: np.ndarray,
    boxes: Optional[np.ndarray] = None,
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
    resolution: int = 768,
) -> np.ndarray:
    """Render a LiDAR bird's-eye view with rotated boxes -> uint8 image."""
    import cv2

    img = np.zeros((resolution, resolution, 3), np.uint8)
    x0, y0, _, x1, y1, _ = pc_range
    sx = resolution / (x1 - x0)
    sy = resolution / (y1 - y0)
    px = ((points[:, 0] - x0) * sx).astype(int)
    py = ((points[:, 1] - y0) * sy).astype(int)
    ok = (px >= 0) & (px < resolution) & (py >= 0) & (py < resolution)
    img[py[ok], px[ok]] = (90, 90, 90)
    if boxes is not None and len(boxes):
        from minddet_tpu.ops.rotated_iou import rect_corners
        import jax.numpy as jnp

        bev = np.asarray(boxes)[:, [0, 1, 3, 4, -1]]
        corners = np.asarray(rect_corners(jnp.asarray(bev)))
        for bi, c in enumerate(corners):
            pts = np.stack([(c[:, 0] - x0) * sx, (c[:, 1] - y0) * sy], -1).astype(np.int32)
            color = tuple(int(v) for v in _PALETTE[bi % len(_PALETTE)])
            cv2.polylines(img, [pts.reshape(-1, 1, 2)], True, color, 2)
    return img
