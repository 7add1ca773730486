"""Host input-pipeline throughput: can the loader feed the measured chip?

The train benches (`bench.py`) generate batches on device, so the host
pipeline's capacity is unproven against the 161 samples/s (PointPillars)
and 81 samples/s (CenterPoint) chip rates. This measures the REAL path —
ArrayRecord shards -> per-item decode + augmentation -> threaded
DataLoader collate -> padded numpy batches — on synthetic records at
production scale, and reports samples/s per host core (TPU hosts have
tens of cores + N workers; this box has one).

    python tools/bench_loader.py --dataset kitti --batch 8 --steps 30
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fake_kitti(tmp, n=64):
    from minddet_tpu.data.records import write_records

    rs = np.random.RandomState(0)
    examples = []
    for i in range(n):
        npts = 18000
        pts = rs.uniform([0, -39.68, -3, 0], [69.12, 39.68, 1, 1],
                         (npts, 4)).astype(np.float32)
        boxes = np.zeros((12, 7), np.float32)
        boxes[:, :2] = rs.uniform(5, 40, (12, 2))
        boxes[:, 3:6] = [1.6, 3.9, 1.56]
        examples.append({
            "points": pts,
            "gt_boxes": boxes,
            "gt_classes": np.ones((12,), np.int64),
            "frame_id": np.asarray([i], np.int64),
        })
    write_records(os.path.join(tmp, "kitti"), examples)
    return os.path.join(tmp, "kitti-*.arrayrecord")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="kitti")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--workers", type=int, default=4)
    args = p.parse_args()

    import tempfile

    from minddet_tpu.data.kitti import KittiDetection
    from minddet_tpu.data.loader import DataLoader

    with tempfile.TemporaryDirectory() as tmp:
        pattern = _fake_kitti(tmp)
        ds = KittiDetection(pattern, augment=True)
        loader = DataLoader(ds, args.batch, num_workers=args.workers)
        it = iter(loader)
        for _ in range(3):  # warm caches/threads
            next(it)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            next(it)
        dt = time.perf_counter() - t0
        sps = args.batch * args.steps / dt
        ncore = os.cpu_count() or 1
        print(f"loader: {sps:.1f} samples/s on {ncore} host core(s) "
              f"({args.workers} workers, batch {args.batch}, augment on)")
        print(f"per-core: {sps / min(args.workers, ncore):.1f} samples/s "
              "— a production TPU-v5e host (many tens of cores) scales "
              "this linearly with workers")


if __name__ == "__main__":
    main()
