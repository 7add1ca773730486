#!/usr/bin/env python
"""Unified offline data-prep CLI.

One entry point for all dataset materialization, replacing the reference's
three per-model scripts (``pointpillars/src/create_data.py``,
``centerpoint/tools_ms/create_data.py``, ``centernet/src/dataset.py``'s
MindRecord mode):

    python tools/create_data.py kitti    --root KITTI --split-file train.txt \
        --out data/kitti/train
    python tools/create_data.py nuscenes --root NUSC --out data/nuscenes/train \
        --version v1.0-trainval --nsweeps 10
    python tools/create_data.py waymo    --tfrecords 'segs/*.tfrecord' \
        --out data/waymo/train
    python tools/create_data.py coco     --ann instances_train2017.json \
        --images train2017/ --out data/coco/train [--with-masks]
    python tools/create_data.py seg      --images JPEGImages/ \
        --masks SegmentationClass/ --out data/voc/train --image-hw 513 513
    python tools/create_data.py gt-database --records 'data/kitti/train-*' \
        --classes Car --out data/kitti/gt_db.pkl

Each subcommand writes ArrayRecord shards (the MindRecord role) or, for
``gt-database``, the pickled per-class object bank used by GT-AUG sampling.
"""

from __future__ import annotations

import argparse
import glob
import sys


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[1])
    sub = p.add_subparsers(dest="cmd", required=True)

    k = sub.add_parser("kitti", help="KITTI velodyne+label -> records")
    k.add_argument("--root", required=True)
    k.add_argument("--split-file", required=True)
    k.add_argument("--out", required=True)
    k.add_argument("--classes", nargs="+", default=["Car"])

    n = sub.add_parser("nuscenes", help="nuScenes tables -> 10-sweep records")
    n.add_argument("--root", required=True)
    n.add_argument("--out", required=True)
    n.add_argument("--version", default="v1.0-trainval")
    n.add_argument("--nsweeps", type=int, default=10)
    n.add_argument("--split", default="train", choices=["train", "val"])

    w = sub.add_parser("waymo", help="Waymo Frame TFRecords -> records "
                                     "(needs tensorflow + waymo proto)")
    w.add_argument("--tfrecords", required=True,
                   help="glob of segment .tfrecord files")
    w.add_argument("--out", required=True)
    w.add_argument("--max-points", type=int, default=180000)

    c = sub.add_parser("coco", help="COCO annotations + images -> records")
    c.add_argument("--ann", required=True)
    c.add_argument("--images", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--with-masks", action="store_true",
                   help="store polygon/RLE segmentations (Mask R-CNN)")

    s = sub.add_parser("seg", help="(image, mask-png) pairs -> seg records")
    s.add_argument("--images", required=True)
    s.add_argument("--masks", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--image-hw", type=int, nargs=2, default=[512, 512])
    s.add_argument("--ignore-label", type=int, default=255)

    g = sub.add_parser("gt-database",
                       help="crop per-object clouds for GT-AUG sampling")
    g.add_argument("--records", required=True, help="record glob (kitti/nusc)")
    g.add_argument("--classes", nargs="+", default=["Car"])
    g.add_argument("--out", required=True)
    g.add_argument("--min-points", type=int, default=5)

    args = p.parse_args(argv)

    if args.cmd == "kitti":
        from minddet_tpu.data.kitti import create_kitti_records
        paths = create_kitti_records(
            args.root, args.split_file, args.out, tuple(args.classes))
    elif args.cmd == "nuscenes":
        from minddet_tpu.data.nuscenes import create_nuscenes_records
        paths = create_nuscenes_records(
            args.root, args.out, version=args.version, nsweeps=args.nsweeps,
            split=args.split)
    elif args.cmd == "waymo":
        from minddet_tpu.data.waymo import convert_waymo_tfrecords
        paths = convert_waymo_tfrecords(
            sorted(glob.glob(args.tfrecords)), args.out,
            max_points=args.max_points)
    elif args.cmd == "coco":
        from minddet_tpu.data.coco import convert_coco_to_records
        paths = convert_coco_to_records(args.ann, args.images, args.out,
                                        with_masks=args.with_masks)
    elif args.cmd == "seg":
        from minddet_tpu.data.seg import convert_seg_to_records
        paths = convert_seg_to_records(
            args.images, args.masks, args.out,
            image_hw=tuple(args.image_hw), ignore_label=args.ignore_label)
    else:  # gt-database
        from minddet_tpu.data.gt_sampler import build_gt_database, save_database
        from minddet_tpu.data.records import RecordDataset
        ds = RecordDataset(args.records)
        db = build_gt_database(ds, tuple(args.classes),
                               min_points=args.min_points)
        save_database(db, args.out)
        counts = {k: len(v) for k, v in db.items()}
        print(f"gt database -> {args.out}: {counts}")
        return
    print("\n".join(paths))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
