"""One-command accuracy-parity harness (VERDICT r3 item 10).

The day real data + reference checkpoints are mounted, parity is a single
run per model: convert the checkpoint, run the full official eval protocol,
and print the measured numbers NEXT TO the reference's published table
(BASELINE.md) so drift is visible at a glance.

    python tools/parity_eval.py --model centernet \
        --ckpt centernet_r18dcn.pth --records 'data/coco/val-*.arrayrecord'
    python tools/parity_eval.py --model pointpillars_car \
        --ckpt pointpillars.pt --records 'data/kitti/val-*.arrayrecord'
    python tools/parity_eval.py --model centerpoint \
        --ckpt centerpoint.pt --records 'data/nusc/val-*.arrayrecord'

Checkpoints: torch ``.pth``/``.pt`` state dicts (the lineage the converters'
rename tables target, ``utils/convert.py``), an ``.npz`` of
``name -> array`` in the same naming, or a native MindSpore ``.ckpt`` —
parsed directly by the pure-python protobuf reader
(``utils/ms_ckpt.py``; MS names normalize to the torch lineage, so the
reference's published artifacts load with no prep-machine step).

``--ckpt`` may be omitted for a plumbing dry run (random init; expect
near-zero metrics): that mode doubles as the synthetic-records smoke test in
``tests/test_parity_harness.py``, so real-data runs don't hit an untested
code path.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_state_dict(path: str):
    if path.endswith(".ckpt"):  # native MindSpore checkpoint, no prep step
        from minddet_tpu.utils.ms_ckpt import load_ms_state_dict

        return load_ms_state_dict(path)
    if path.endswith(".npz"):
        return dict(np.load(path, allow_pickle=False).items())
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "net"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return obj


# model key -> spec. "expected": reference-published numbers (BASELINE.md
# sources cited inline); "metrics(out)" flattens each protocol's result dict
# to the comparable {name: value} rows.
_SPECS = {}


def _spec(name):
    def deco(fn):
        _SPECS[name] = fn
        return fn
    return deco


@_spec("centernet")
def _centernet(args):
    import jax
    import jax.numpy as jnp

    from minddet_tpu.models.detectors.centernet import CenterNet
    from minddet_tpu.train.evaluate import centernet_evaluate
    from minddet_tpu.utils.convert import apply_converted, convert_centernet

    model = CenterNet(num_classes=args.num_classes or 80, depth=18, dcn=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                           train=False)
    if args.ckpt:
        variables = apply_converted(
            variables, convert_centernet(_load_state_dict(args.ckpt)))
    stats = centernet_evaluate(
        model, variables, args.records, num_classes=args.num_classes or 80,
        max_images=args.max_frames)
    # minddet/models/centernet/README.md:410-421 (Ascend 910, keep-res,
    # soft-NMS, single scale)
    expected = {"AP": 28.7, "AP50": 47.2, "AP75": 29.3, "APs": 11.9,
                "APm": 31.5, "APl": 42.6, "AR@100": 44.2}
    actual = {k: 100 * float(v) if abs(v) <= 1.0 else float(v)
              for k, v in stats.items() if k in expected}
    return expected, actual


def _pointpillars(args, classes, expected):
    import jax

    from minddet_tpu.models.detectors.pointpillars import PointPillars
    from minddet_tpu.train.evaluate import kitti_evaluate
    from minddet_tpu.utils.convert import apply_converted, convert_pointpillars

    model = PointPillars(num_classes=len(classes))
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 4)),
        jnp.ones((1, 512), bool), method=model.predict_from_points)
    if args.ckpt:
        variables = apply_converted(
            variables, convert_pointpillars(_load_state_dict(args.ckpt)))
    table = kitti_evaluate(model, variables, args.records, classes=classes,
                           max_frames=args.max_frames)
    actual = {}
    for cls, per_metric in table.items():
        for metric, aps in per_metric.items():
            for diff, ap in zip(("easy", "mod", "hard"), aps):
                actual[f"{cls}.{metric}.{diff}"] = float(ap)
    return expected, actual


@_spec("pointpillars_car")
def _pp_car(args):
    # minddet/models/pointpillars/README.md:311-315 (bbox AP @IoU 0.70)
    expected = {"Car.bbox.easy": 93.63, "Car.bbox.mod": 88.72,
                "Car.bbox.hard": 87.29}
    return _pointpillars(args, ("Car",), expected)


@_spec("pointpillars_ped_cycle")
def _pp_pc(args):
    # minddet/models/pointpillars/README.md:319-325 (bbox AP @IoU 0.50)
    expected = {
        "Cyclist.bbox.easy": 86.46, "Cyclist.bbox.mod": 67.37,
        "Cyclist.bbox.hard": 64.18,
        "Pedestrian.bbox.easy": 67.38, "Pedestrian.bbox.mod": 62.54,
        "Pedestrian.bbox.hard": 59.27,
    }
    return _pointpillars(args, ("Pedestrian", "Cyclist"), expected)


@_spec("centerpoint")
def _centerpoint(args):
    import jax
    import jax.numpy as jnp

    from minddet_tpu.models.detectors.centerpoint import CenterPoint
    from minddet_tpu.train.evaluate import nuscenes_evaluate
    from minddet_tpu.utils.convert import apply_converted, convert_centerpoint

    model = CenterPoint()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 5)),
        jnp.ones((1, 512), bool), method=model.predict_from_points)
    if args.ckpt:
        variables = apply_converted(
            variables, convert_centerpoint(_load_state_dict(args.ckpt)))
    stats = nuscenes_evaluate(model, variables, args.records,
                              max_frames=args.max_frames)
    # minddet/models/centerpoint/README.md:13 (paper claim; the repo itself
    # never measures it — flagged as such in the printed table)
    expected = {"NDS": 65.5 / 100.0, "mAP": float("nan")}
    actual = {k: float(v) for k, v in stats.items() if k in ("NDS", "mAP")}
    return expected, actual


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="minddet_tpu parity harness")
    p.add_argument("--model", required=True, choices=sorted(_SPECS))
    p.add_argument("--ckpt", default=None,
                   help="reference checkpoint (.pth/.pt/.npz); omit for a "
                        "random-init plumbing dry run")
    p.add_argument("--records", required=True)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--num-classes", type=int, default=None)
    args = p.parse_args(argv)

    expected, actual = _SPECS[args.model](args)
    mode = "CONVERTED CKPT" if args.ckpt else "RANDOM INIT (dry run)"
    print(f"\n=== parity: {args.model} [{mode}] ===")
    print(f"{'metric':<28}{'reference':>12}{'ours':>12}{'delta':>10}")
    worst = 0.0
    for k in sorted(set(expected) | set(actual)):
        e = expected.get(k, float("nan"))
        a = actual.get(k, float("nan"))
        d = a - e
        if np.isfinite(d) and args.ckpt:
            worst = max(worst, abs(d))
        print(f"{k:<28}{e:>12.2f}{a:>12.2f}{d:>+10.2f}")
    if args.ckpt:
        print(f"worst |delta|: {worst:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
