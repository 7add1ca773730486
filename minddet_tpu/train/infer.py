"""Streaming inference demo: point-cloud / image stream -> detections.

The offline counterpart of the reference's ROS inference nodes
(``tools_ms/single_infernece_ros.py``, ``multi_sweep_inference_ros.py`` —
rospy is not available here and is gated the same way there). Reads a
directory of .bin point clouds (or images), runs the fused predict program
(voxelize/augment + forward + decode + NMS in one XLA program), and writes
detections + optional BEV visualizations.

    python -m minddet_tpu.train.infer --config configs/pointpillars_car_kitti.yaml \
        --input /path/to/velodyne --output out/ [--visualize]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.core.config import Config
from minddet_tpu.core.metrics import logger
from minddet_tpu.core.registry import DETECTORS

import minddet_tpu.train.train  # noqa: F401  (registry population)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="minddet_tpu streaming inference")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--input", required=True, help="dir of .bin clouds or images")
    p.add_argument("--output", default="detections")
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--max-frames", type=int, default=0)
    args = p.parse_args(argv)

    cfg = Config.fromfile(args.config)
    model = DETECTORS.build(dict(cfg.model))
    os.makedirs(args.output, exist_ok=True)

    is_lidar = cfg.model.type in ("PointPillars", "CenterPoint")
    files = sorted(glob.glob(os.path.join(args.input, "*")))
    if args.max_frames:
        files = files[: args.max_frames]
    logger.info("%d frames from %s", len(files), args.input)

    if is_lidar:
        from minddet_tpu.ops.anchors import create_anchors_3d_stride
        from minddet_tpu.ops.voxelize import voxelize_batch

        vcfg = cfg.get("voxelizer", {})
        max_pts = 32 if cfg.model.type == "PointPillars" else 20
        mv = int(vcfg.get("max_voxels", 16000))
        n_feat = 4 if cfg.model.type == "PointPillars" else 5
        max_n = 60000

        anchors = None
        if cfg.model.type == "PointPillars":
            acfg = cfg.anchors
            fm = (cfg.model.grid_ny // 2, cfg.model.grid_nx // 2)
            anchors = jnp.asarray(
                create_anchors_3d_stride(
                    fm, tuple(acfg.sizes), tuple(acfg.strides), tuple(acfg.offsets)
                ).reshape(-1, 7)
            )

        @jax.jit
        def run(points, mask, variables):
            vox = voxelize_batch(
                points, mask, tuple(cfg.model.voxel_size),
                tuple(cfg.model.pc_range), mv, max_pts,
            )
            if cfg.model.type == "PointPillars":
                return model.apply(
                    variables, vox.voxels, vox.num_points, vox.coords, anchors,
                    method=model.predict,
                )
            return model.apply(
                variables, vox.voxels, vox.num_points, vox.coords,
                method=model.predict,
            )

        points0 = np.fromfile(files[0], np.float32).reshape(-1, n_feat)
        pts = np.zeros((1, max_n, n_feat), np.float32)
        variables = None
        timings = []
        for fi, f in enumerate(files):
            raw = np.fromfile(f, np.float32).reshape(-1, n_feat)[:max_n]
            pts[0, : len(raw)] = raw
            mask = np.arange(max_n)[None] < len(raw)
            if variables is None:
                from minddet_tpu.ops.voxelize import voxelize_batch as vb

                vox = vb(jnp.asarray(pts), jnp.asarray(mask),
                         tuple(cfg.model.voxel_size), tuple(cfg.model.pc_range),
                         mv, max_pts)
                variables = model.init(
                    jax.random.PRNGKey(0), vox.voxels, vox.num_points, vox.coords
                )
                if args.checkpoint:
                    from minddet_tpu.core.checkpoint import load_pytree

                    r = load_pytree(args.checkpoint)
                    variables = {"params": r["params"],
                                 "batch_stats": r.get("batch_stats", {})}
            t0 = time.perf_counter()
            out = run(jnp.asarray(pts), jnp.asarray(mask), variables)
            boxes = np.asarray(out["boxes"][0])
            timings.append(time.perf_counter() - t0)
            dets = {
                "frame": os.path.basename(f),
                "boxes": boxes.tolist(),
                "scores": np.asarray(out["scores"][0]).tolist(),
                "labels": np.asarray(out["labels"][0]).tolist(),
            }
            with open(os.path.join(args.output, f"{fi:06d}.json"), "w") as g:
                g.write(json.dumps(dets))
            if args.visualize:
                import cv2

                from minddet_tpu.utils.visual import draw_bev

                keep = np.asarray(out["scores"][0]) > 0.3
                img = draw_bev(raw, boxes[keep], tuple(cfg.model.pc_range))
                cv2.imwrite(os.path.join(args.output, f"{fi:06d}.png"), img)
        logger.info(
            "done: %d frames, p50 latency %.1f ms",
            len(files), float(np.median(timings[1:]) * 1000) if len(timings) > 1 else -1,
        )
    else:
        raise SystemExit("image-stream inference: use train.evaluate for now")


if __name__ == "__main__":
    main()
