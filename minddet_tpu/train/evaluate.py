"""Unified evaluation entry point (COCO mAP / KITTI AP / mIoU).

Replaces the reference's per-model eval scripts (``centernet/eval.py``,
``pointpillars/eval.py``, ``centerpoint/tools_ms/eval.py``). The device side
is one fused predict program (forward + decode + NMS); the host only
accumulates protocol metrics.

    python -m minddet_tpu.train.evaluate --config configs/centernet_r18_coco.yaml \
        --checkpoint runs/default/ckpt --records 'data/coco/val-*.arrayrecord'
"""

from __future__ import annotations

import argparse
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.core.config import Config
from minddet_tpu.core.metrics import logger
from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.data.coco import CocoDetection, evaluate_coco_detections
from minddet_tpu.data.transforms import eval_affine, invert_affine, warp_images

import minddet_tpu.train.train  # noqa: F401  (populates the registry)


def coco_evaluate(model, variables, records: str, image_hw, num_classes: int,
                  batch_size: int = 8, max_images: int = 0) -> Dict[str, float]:
    ds = CocoDetection(records, max_objs=128, keep_raw=True)
    n = len(ds)
    if max_images:
        n = min(n, max_images)

    @jax.jit
    def predict(image):
        return model.apply(variables, image, method=model.predict)

    predictions = {}
    for start in range(0, n - n % batch_size, batch_size):
        exs = [ds[i] for i in range(start, start + batch_size)]
        images = jnp.asarray(np.stack([e["image"] for e in exs]))
        hw = jnp.asarray(np.stack([e["hw"] for e in exs]))
        aff = eval_affine(hw, image_hw)
        warped = warp_images(images, aff, tuple(image_hw))
        out = predict(warped)
        if isinstance(out, dict):
            boxes = np.asarray(out["boxes"], np.float64)
            scores = np.asarray(out["scores"], np.float64)
            labels = np.asarray(out["labels"], np.int64)
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
            predictions[int(ex["image_id"])] = {
                "boxes": np.stack([x1, y1, x2, y2], -1),
                "scores": scores[bi],
                "labels": labels[bi],
            }
    stats = evaluate_coco_detections(ds, predictions, num_classes)
    return stats


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="minddet_tpu evaluator")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--records", required=True)
    p.add_argument("--max-images", type=int, default=0)
    p.add_argument("--options", nargs="*", default=[])
    args = p.parse_args(argv)

    cfg = Config.fromfile(args.config).merge_from_options(args.options)
    model = DETECTORS.build(dict(cfg.model))
    image_hw = tuple(cfg.train.get("image_hw", (512, 512)))

    image = jnp.zeros((1,) + image_hw + (3,))
    variables = model.init(jax.random.PRNGKey(0), image)
    if args.checkpoint:
        from minddet_tpu.core.checkpoint import load_pytree

        restored = load_pytree(args.checkpoint)
        variables = {"params": restored["params"],
                     "batch_stats": restored.get("batch_stats", {})}

    stats = coco_evaluate(
        model, variables, args.records, image_hw,
        int(cfg.model.get("num_classes", 80)), max_images=args.max_images,
    )
    for k, v in stats.items():
        logger.info("%s: %.4f", k, v)


def kitti_evaluate(
    model,
    variables,
    records: str,
    anchors,
    voxel_size,
    pc_range,
    max_voxels: int = 16000,
    max_points: int = 32,
    classes=("Car",),
    batch_size: int = 4,
    max_frames: int = 0,
    score_threshold: float = 0.3,
) -> Dict[str, Dict]:
    """PointPillars -> official KITTI AP (bbox skipped: no camera projection
    for synthetic records; reports bev + 3d, the LiDAR-native metrics).

    The device side is one fused program: voxelize + forward + decode +
    rotated NMS (the reference splits this across host numba, device graph,
    and a CPU custom op).
    """
    import jax.numpy as jnp

    from minddet_tpu.data.kitti import KittiDetection
    from minddet_tpu.data.kitti_eval import get_official_eval_result
    from minddet_tpu.ops.voxelize import voxelize_batch

    ds = KittiDetection(records)
    n = len(ds)
    if max_frames:
        n = min(n, max_frames)
    n -= n % batch_size

    @jax.jit
    def predict(points, mask):
        vox = voxelize_batch(
            points, mask, tuple(voxel_size), tuple(pc_range), max_voxels, max_points
        )
        return model.apply(
            variables, vox.voxels, vox.num_points, vox.coords, jnp.asarray(anchors),
            method=model.predict,
        )

    def to_kitti_anno(boxes7, scores, labels):
        """lidar boxes -> KITTI-eval anno dict (camera-frame identity calib)."""
        keep = scores > score_threshold
        b = boxes7[keep]
        # camera frame: x=-y_l, y=-z_l(top), z=x_l ; dims l,h,w ; ry=-yaw-pi/2
        loc = np.stack([-b[:, 1], -(b[:, 2] + b[:, 5]), b[:, 0]], -1)
        dims = np.stack([b[:, 4], b[:, 5], b[:, 3]], -1)  # l, h, w
        ry = -b[:, 6] - np.pi / 2
        name = np.asarray([classes[int(l)] if 0 <= l < len(classes) else "Car"
                           for l in labels[keep]])
        return {
            "name": name,
            "bbox": np.tile([0.0, 0.0, 200.0, 200.0], (len(b), 1)),
            "location": loc.astype(np.float32),
            "dimensions": dims.astype(np.float32),
            "rotation_y": ry.astype(np.float32),
            "alpha": np.zeros(len(b), np.float32),
            "occluded": np.zeros(len(b), np.int64),
            "truncated": np.zeros(len(b), np.float32),
            "score": scores[keep].astype(np.float32),
        }

    gt_annos, dt_annos = [], []
    for start in range(0, n, batch_size):
        exs = [ds[i] for i in range(start, start + batch_size)]
        pts = jnp.asarray(np.stack([e["points"] for e in exs]))
        msk = jnp.asarray(np.stack([e["points_mask"] for e in exs]))
        out = predict(pts, msk)
        for bi, ex in enumerate(exs):
            gm = ex["gt_mask"]
            g = ex["gt_boxes"][gm]
            gc = ex["gt_classes"][gm]
            gt = to_kitti_anno(g, np.full(len(g), 2.0), gc - 1)
            gt.pop("score")
            gt_annos.append(gt)
            dt_annos.append(
                to_kitti_anno(
                    np.asarray(out["boxes"][bi]),
                    np.asarray(out["scores"][bi]),
                    np.asarray(out["labels"][bi]),
                )
            )
    return get_official_eval_result(
        gt_annos, dt_annos, classes=classes, metrics=("bev", "3d")
    )


if __name__ == "__main__":
    main()
