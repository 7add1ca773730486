"""Unified training entry point — one CLI for the whole zoo.

Replaces the reference's three per-model ``train.py`` scripts
(``centernet/train.py``, ``pointpillars/train.py``,
``centerpoint/tools_ms/train.py``) with a single registry-driven launcher::

    python -m minddet_tpu.train.train --config configs/centernet_r18_coco.yaml \
        [--options model.depth=50 train.batch_size=8] [--synthetic]

Distributed: multi-host runs call ``jax.distributed.initialize()`` (no rank
tables, no HCCL config files — TPU topology discovery is automatic; SURVEY.md
§2.5), then each host feeds its data shard; the mesh handles the rest.
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.core.config import Config
from minddet_tpu.core.checkpoint import CheckpointManager
from minddet_tpu.core.lr_schedules import build_schedule
from minddet_tpu.core.metrics import MetricWriter, logger
from minddet_tpu.core.optim import build_optimizer
from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.parallel.mesh import MeshSpec, create_mesh
from minddet_tpu.train.loop import TrainState, Trainer, make_train_step

# import zoo so the registry is populated
import minddet_tpu.models.detectors.centernet  # noqa: F401
import minddet_tpu.models.detectors.centerpoint  # noqa: F401
import minddet_tpu.models.detectors.faster_rcnn  # noqa: F401
import minddet_tpu.models.detectors.pointpillars  # noqa: F401
import minddet_tpu.models.detectors.ssd  # noqa: F401
import minddet_tpu.models.detectors.yolov3  # noqa: F401
import minddet_tpu.models.detectors.yolov8  # noqa: F401
import minddet_tpu.models.detectors.yolox  # noqa: F401
import minddet_tpu.models.segmentors  # noqa: F401


def synthetic_detection_batches(
    batch_size: int, image_hw, num_classes: int, max_objs: int = 16, seed: int = 0
) -> Iterator[Dict[str, np.ndarray]]:
    """Random images + boxes in the uniform 2D-detector batch layout."""
    rng = np.random.RandomState(seed)
    h, w = image_hw
    step = 0
    while True:
        step += 1
        n = rng.randint(2, max_objs, batch_size)
        boxes = np.zeros((batch_size, max_objs, 4), np.float32)
        classes = rng.randint(0, num_classes, (batch_size, max_objs)).astype(np.int32)
        mask = np.zeros((batch_size, max_objs), bool)
        for i in range(batch_size):
            xy = rng.uniform(0, [w * 0.7, h * 0.7], (n[i], 2))
            wh = rng.uniform([w * 0.05, h * 0.05], [w * 0.3, h * 0.3], (n[i], 2))
            boxes[i, : n[i]] = np.concatenate([xy, xy + wh], -1)
            mask[i, : n[i]] = True
        yield {
            "image": rng.rand(batch_size, h, w, 3).astype(np.float32),
            "gt_boxes": boxes,
            "gt_classes": classes,
            "gt_mask": mask,
            "step": np.asarray(step, np.int32),
        }


def coco_batches(cfg, batch_size: int, image_hw, seed: int = 0, aug: str = "affine"):
    """Record-backed COCO pipeline: host decode -> device fused augmentation.

    ``aug``: "affine" (CenterNet-style scale/shift/flip/color) or "mosaic"
    (YOLO-style 4-image mosaic + mixup; quadruples the padded box count).
    """
    from minddet_tpu.data.coco import CocoDetection
    from minddet_tpu.data.loader import DataLoader, DistributedSampler
    from minddet_tpu.data.transforms import (
        centernet_train_transform,
        mixup,
        mosaic,
        normalize,
    )

    ds = CocoDetection(cfg.data.records, max_objs=cfg.data.get("max_objs", 128))
    sampler = DistributedSampler(
        len(ds), num_shards=jax.process_count(), shard_id=jax.process_index(),
        seed=seed,
    )
    loader = DataLoader(ds, batch_size, sampler=sampler,
                        num_workers=cfg.data.get("workers", 4))
    key = jax.random.PRNGKey(seed)
    step = 0
    for raw in loader:
        key_i = jax.random.fold_in(key, step)
        if aug == "mosaic":
            k1, k2 = jax.random.split(key_i)
            m = mosaic(
                k1, jnp.asarray(raw["image"]) / 255.0, jnp.asarray(raw["hw"]),
                jnp.asarray(raw["boxes"]), jnp.asarray(raw["mask"]),
                tuple(image_hw),
            )
            labels4 = jnp.concatenate(
                [jnp.roll(jnp.asarray(raw["labels"]), -q, axis=0) for q in range(4)],
                axis=1,
            )
            mx = mixup(k2, m["image"], m["boxes"], m["mask"])
            labels8 = jnp.concatenate([labels4, jnp.roll(labels4, -1, axis=0)], axis=1)
            yield {
                "image": normalize(mx["image"]),
                "gt_boxes": mx["boxes"],
                "gt_classes": labels8,
                "gt_mask": mx["mask"],
                "step": np.asarray(step, np.int32),
            }
        else:
            out = centernet_train_transform(
                key_i, jnp.asarray(raw["image"]), jnp.asarray(raw["hw"]),
                jnp.asarray(raw["boxes"]), tuple(image_hw),
            )
            yield {
                "image": out["image"],
                "gt_boxes": out["boxes"],
                "gt_classes": jnp.asarray(raw["labels"]),
                "gt_mask": jnp.asarray(raw["mask"]),
                "step": np.asarray(step, np.int32),
            }
        step += 1


def loss_method_for(model) -> Any:
    """Uniform loss entry: prefer ``loss_from_gt`` (CenterNet) else ``loss``."""
    return getattr(model, "loss_from_gt", None) or model.loss


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="minddet_tpu trainer")
    p.add_argument("--config", required=True)
    p.add_argument("--options", nargs="*", default=[])
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic data (smoke runs / perf)")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--workdir", default="runs/default")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace (XPlane/Perfetto) of the run")
    args = p.parse_args(argv)

    if int(os.environ.get("MINDDET_NUM_PROCESSES", "1")) > 1:
        jax.distributed.initialize()

    cfg = Config.fromfile(args.config).merge_from_options(args.options)
    mcfg = dict(cfg.model)
    model = DETECTORS.build(mcfg)

    tcfg = cfg.train
    mesh = create_mesh(MeshSpec(data=-1, fsdp=int(tcfg.get("fsdp", 1))))
    logger.info("mesh: %s devices, axes %s", mesh.size, dict(mesh.shape))

    steps = args.steps or int(tcfg.get("total_steps", 1000))
    schedule = build_schedule(dict(tcfg.lr_schedule))
    tx = build_optimizer(dict(tcfg.optimizer), schedule)

    image_hw = tuple(tcfg.get("image_hw", (512, 512)))
    batch_size = int(tcfg.get("batch_size", 8))
    num_classes = int(mcfg.get("num_classes", 80))
    if args.synthetic or "data" not in cfg:
        batches = synthetic_detection_batches(batch_size, image_hw, num_classes)
    else:
        batches = coco_batches(
            cfg, batch_size, image_hw, aug=tcfg.get("aug", "affine")
        )

    sample = next(iter(batches))
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}
    loss_m = loss_method_for(model)
    variables = model.init(rngs, jax.tree_util.tree_map(jnp.asarray, sample),
                           method=loss_m)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}), tx
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info("model %s: %.2fM params", mcfg.get("type"), n_params / 1e6)

    def loss_apply(vs, batch, train=True):
        step_seed = batch.pop("step", jnp.zeros((), jnp.int32))
        rng = jax.random.fold_in(jax.random.PRNGKey(17), step_seed)
        return model.apply(
            vs, batch, train=train, method=loss_m, mutable=["batch_stats"],
            rngs={"sampling": rng},
        )

    step_fn = make_train_step(loss_apply)
    ckpt = CheckpointManager(
        os.path.join(args.workdir, "ckpt"),
        keep_max=int(tcfg.get("keep_checkpoint_max", 5)),
        save_interval_steps=int(tcfg.get("save_every", 1000)),
    )
    trainer = Trainer(
        state, step_fn, mesh=mesh,
        metric_writer=MetricWriter(args.workdir),
        checkpoint_manager=ckpt,
        log_every=int(tcfg.get("log_every", 50)),
    )
    from minddet_tpu.core.metrics import profiler_trace

    with profiler_trace(os.path.join(args.workdir, "trace") if args.profile else None):
        trainer.fit(batches, num_steps=steps, batch_size=batch_size)
    logger.info("done: %d steps", steps)


if __name__ == "__main__":
    main()
