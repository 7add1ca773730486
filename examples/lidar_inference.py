"""Raw LiDAR points -> 3D detections in ONE fused device program.

    python examples/lidar_inference.py            # random cloud demo
    python examples/lidar_inference.py --bin scan.bin   # KITTI velodyne file
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.models.detectors.pointpillars import PointPillars


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--bin", default=None, help="KITTI velodyne .bin (x,y,z,r)")
    p.add_argument("--max-points", type=int, default=20000)
    p.add_argument("--score", type=float, default=0.3)
    args = p.parse_args()

    if args.bin:
        pts = np.fromfile(args.bin, np.float32).reshape(-1, 4)
    else:
        rng = np.random.RandomState(0)
        pts = np.stack([rng.uniform(0, 69, 8000), rng.uniform(-39, 39, 8000),
                        rng.uniform(-3, 1, 8000), rng.uniform(0, 1, 8000)],
                       -1).astype(np.float32)

    model = PointPillars(num_classes=1)
    n = min(len(pts), args.max_points)
    padded = np.zeros((1, args.max_points, 4), np.float32)
    padded[0, :n] = pts[:n]
    mask = np.zeros((1, args.max_points), bool)
    mask[0, :n] = True

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(padded), jnp.asarray(mask),
        method=model.predict_from_points)
    # (restore a trained checkpoint here via minddet_tpu.core.checkpoint /
    # utils.convert for real detections; random init demos the pipeline)

    @jax.jit
    def predict(pp, mm):
        return model.apply(variables, pp, mm,
                           method=model.predict_from_points)

    out = predict(jnp.asarray(padded), jnp.asarray(mask))
    boxes = np.asarray(out["boxes"][0])
    scores = np.asarray(out["scores"][0])
    keep = scores > args.score
    print(f"{int(keep.sum())} detections over {args.score}:")
    for b, s in zip(boxes[keep][:20], scores[keep][:20]):
        print(f"  score {s:.2f}  xyz=({b[0]:6.2f},{b[1]:6.2f},{b[2]:6.2f}) "
              f"wlh=({b[3]:.2f},{b[4]:.2f},{b[5]:.2f}) yaw={b[6]:+.2f}")


if __name__ == "__main__":
    main()
