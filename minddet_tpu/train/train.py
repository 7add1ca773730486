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
import minddet_tpu.models.detectors.yolov4  # noqa: F401
import minddet_tpu.models.detectors.yolov5  # noqa: F401
import minddet_tpu.models.detectors.yolov7  # noqa: F401
import minddet_tpu.models.detectors.yolov8  # noqa: F401
import minddet_tpu.models.detectors.yolox  # noqa: F401
import minddet_tpu.models.segmentors  # noqa: F401


def synthetic_detection_batches(
    batch_size: int, image_hw, num_classes: int, max_objs: int = 16, seed: int = 0,
    with_masks: bool = False, mask_stride: int = 4,
) -> Iterator[Dict[str, np.ndarray]]:
    """Random images + boxes in the uniform 2D-detector batch layout.

    ``with_masks`` adds ``gt_bitmaps`` (B, H/s, W/s, max_objs) — ellipses
    inscribed in each box, so an overfit run has a learnable non-box shape."""
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
        out = {
            "image": rng.rand(batch_size, h, w, 3).astype(np.float32),
            "gt_boxes": boxes,
            "gt_classes": classes,
            "gt_mask": mask,
            "step": np.asarray(step, np.int32),
        }
        if with_masks:
            s = mask_stride
            bm = np.zeros((batch_size, h // s, w // s, max_objs), np.float32)
            yy, xx = np.mgrid[: h // s, : w // s]
            for i in range(batch_size):
                for o in range(n[i]):
                    x1, y1, x2, y2 = boxes[i, o] / s
                    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
                    rx = max((x2 - x1) / 2, 1e-3)
                    ry = max((y2 - y1) / 2, 1e-3)
                    bm[i, :, :, o] = (
                        ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0
                    )
            out["gt_bitmaps"] = bm
        yield out


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
        warp_images,
    )

    with_masks = bool(cfg.data.get("with_masks", False))
    mask_stride = int(cfg.data.get("mask_stride", 4))
    if with_masks and aug == "mosaic":
        raise ValueError("mask training uses the affine pipeline, not mosaic")
    ds = CocoDetection(
        cfg.data.records, max_objs=cfg.data.get("max_objs", 128),
        with_masks=with_masks, mask_stride=mask_stride,
    )
    if cfg.data.get("group_by_aspect", False):
        # aspect-grouped batches (the reference's GroupSampler /
        # DistributedGroupSampler, det3d_ms/datasets/loader/sampler.py:34-157
        # + build_loader.py:37,64): every batch is landscape- or
        # portrait-pure, so the device affine warps a shape-coherent batch
        from minddet_tpu.data.loader import GroupSampler, aspect_flags

        flags = aspect_flags(
            [ds.records[i]["hw"] for i in range(len(ds.records))])
        sampler = GroupSampler(
            flags, batch_size, num_shards=jax.process_count(),
            shard_id=jax.process_index(), seed=seed,
        )
    else:
        sampler = DistributedSampler(
            len(ds), num_shards=jax.process_count(),
            shard_id=jax.process_index(), seed=seed,
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
            batch = {
                "image": out["image"],
                "gt_boxes": out["boxes"],
                "gt_classes": jnp.asarray(raw["labels"]),
                "gt_mask": jnp.asarray(raw["mask"]),
                "step": np.asarray(step, np.int32),
            }
            if with_masks:
                # GT bitmaps live at 1/mask_stride of both spaces, so the
                # image affine transfers with its translation scaled down:
                # x_in/s = A_lin @ (x_out/s) + A_t/s
                aff = out["affine"]
                aff_s = jnp.concatenate(
                    [aff[:, :, :2], aff[:, :, 2:] / mask_stride], axis=2)
                batch["gt_bitmaps"] = warp_images(
                    jnp.asarray(raw["bitmaps"]).astype(jnp.float32),
                    aff_s,
                    (image_hw[0] // mask_stride, image_hw[1] // mask_stride),
                )
            yield batch
        step += 1


def synthetic_points_batches(
    batch_size: int, pc_range, num_points: int = 12000, max_gt: int = 12,
    num_classes: int = 1, seed: int = 0, num_features: int = 4,
    box_dim: int = 7,
) -> Iterator[Dict[str, np.ndarray]]:
    """Random point clouds + lidar boxes in the uniform 3D batch layout.

    ``box_dim=7`` for anchor models ([x,y,z,w,l,h,yaw]); ``box_dim=9`` adds
    (vx, vy) before yaw for CenterPoint; ``num_features=5`` adds the sweep
    time channel."""
    rng = np.random.RandomState(seed)
    x0, y0, z0, x1, y1, z1 = pc_range
    step = 0
    while True:
        step += 1
        feats = [rng.uniform(x0, x1, (batch_size, num_points)),
                 rng.uniform(y0, y1, (batch_size, num_points)),
                 rng.uniform(z0, z1, (batch_size, num_points)),
                 rng.uniform(0, 1, (batch_size, num_points))]
        while len(feats) < num_features:
            feats.append(rng.uniform(0, 0.45, (batch_size, num_points)))
        pts = np.stack(feats, -1).astype(np.float32)
        n = rng.randint(1, max_gt, batch_size)
        boxes = np.zeros((batch_size, max_gt, box_dim), np.float32)
        mask = np.zeros((batch_size, max_gt), bool)
        for i in range(batch_size):
            c = rng.uniform([x0 + 5, y0 + 5], [x1 - 5, y1 - 5], (n[i], 2))
            cols = [c, np.full((n[i], 1), z0 + 1.2),
                    np.tile([1.6, 3.9, 1.56], (n[i], 1))]
            if box_dim == 9:
                cols.append(rng.uniform(-2, 2, (n[i], 2)))  # vx, vy
            cols.append(rng.uniform(-np.pi, np.pi, (n[i], 1)))
            boxes[i, : n[i]] = np.concatenate(cols, -1)
            mask[i, : n[i]] = True
        yield {
            "points": pts,
            "points_mask": np.ones((batch_size, num_points), bool),
            "gt_boxes": boxes,
            "gt_classes": rng.randint(
                1, num_classes + 1, (batch_size, max_gt)
            ).astype(np.int32),
            "gt_mask": mask,
            "step": np.asarray(step, np.int32),
        }


def kitti_batches(cfg, batch_size: int, seed: int = 0):
    """Full KITTI training recipe, host side: records -> GT-database paste ->
    per-object noise -> global flip/rot/scale/translate. Voxelize +
    anchor-mask + target assignment run on device inside the jitted step
    (``PointPillars.loss_from_gt``). Mirrors ``prep_pointcloud``
    (pointpillars/src/data/preprocess.py:12-251) with the numba stages
    replaced by native host ops + XLA.
    """
    from minddet_tpu.data.gt_sampler import (
        DataBaseSampler,
        build_gt_database,
        load_database,
    )
    from minddet_tpu.data.kitti import KittiDetection
    from minddet_tpu.data.loader import DataLoader, DistributedSampler

    dcfg = cfg.data
    classes = tuple(dcfg.get("classes", ("Car",)))
    class_ids = {c: i + 1 for i, c in enumerate(classes)}
    sampler_obj = None
    scfg = dcfg.get("gt_sampler", None)
    if scfg:
        path = scfg.get("database", None)
        if path and os.path.exists(path):
            db = load_database(path)
        else:  # build from the train records (create_gt_database equivalent)
            db = build_gt_database(KittiDetection(dcfg.records), classes)
        sampler_obj = DataBaseSampler(
            db, {str(k): int(v) for k, v in dict(scfg.get(
                "max_per_class", {"Car": 15})).items()}, class_ids,
        )
    noise = dcfg.get("object_noise", {})
    ds = KittiDetection(
        dcfg.records,
        max_points=int(dcfg.get("max_points", 20000)),
        max_gt=int(dcfg.get("max_gt", 40)),
        gt_sampler=sampler_obj,
        augment=bool(dcfg.get("augment", True)),
        object_noise=dict(noise) if noise is not None else None,
        seed=seed,
    )
    sampler = DistributedSampler(
        len(ds), num_shards=jax.process_count(), shard_id=jax.process_index(),
        seed=seed,
    )
    loader = DataLoader(ds, batch_size, sampler=sampler,
                        num_workers=dcfg.get("workers", 4))
    for step, raw in enumerate(loader):
        raw["step"] = np.asarray(step, np.int32)
        yield raw


def nuscenes_batches(cfg, batch_size: int, seed: int = 0):
    """nuScenes pipeline: merged-sweep records -> CBGS-balanced sampling ->
    GT-AUG database paste -> global flip/rot/scale/translate (host);
    voxelize + per-task heatmap targets run on device
    (``CenterPoint.loss_from_gt``). Mirrors the reference recipe
    (db_sampler + Preprocess, configs_ms/nusc/pp/...sweep.py:94-137,
    det3d_ms/datasets/pipelines/preprocess.py:85-112)."""
    from minddet_tpu.data.gt_sampler import (
        DataBaseSampler,
        build_gt_database,
        load_database,
    )
    from minddet_tpu.data.loader import DataLoader, DistributedSampler
    from minddet_tpu.data.nuscenes import DETECTION_CLASSES, NuScenesDetection

    dcfg = cfg.data
    sampler_obj = None
    scfg = dcfg.get("gt_sampler", None)
    if scfg:
        path = scfg.get("database", None)
        if path and os.path.exists(path):
            db = load_database(path)
        else:  # build from the train records (withvelo-db equivalent)
            db = build_gt_database(
                NuScenesDetection(dcfg.records), DETECTION_CLASSES,
                min_points=dict(scfg.get("min_points", {})) or 5,
            )
        sampler_obj = DataBaseSampler(
            db,
            {str(k): int(v) for k, v in dict(scfg.get(
                "max_per_class", {"car": 2})).items()},
            {c: i + 1 for i, c in enumerate(DETECTION_CLASSES)},
        )
    ds = NuScenesDetection(
        dcfg.records,
        max_points=int(dcfg.get("max_points", 120000)),
        max_gt=int(dcfg.get("max_gt", 500)),
        cbgs=bool(dcfg.get("cbgs", True)),
        augment=bool(dcfg.get("augment", True)),
        gt_sampler=sampler_obj,
        seed=seed,
    )
    sampler = DistributedSampler(
        len(ds), num_shards=jax.process_count(), shard_id=jax.process_index(),
        seed=seed,
    )
    loader = DataLoader(ds, batch_size, sampler=sampler,
                        num_workers=dcfg.get("workers", 4))
    for step, raw in enumerate(loader):
        raw.pop("gt_attrs", None)  # attributes feed eval, not the loss
        # tracking metadata feeds the tracking eval route, not the loss —
        # leaving it in would ship dead inputs into the jitted step (and
        # change its cache key vs pre-tracking record sets)
        for k in ("scene", "timestamp", "global_from_lidar", "gt_track_ids"):
            raw.pop(k, None)
        raw["step"] = np.asarray(step, np.int32)
        yield raw


def waymo_batches(cfg, batch_size: int, seed: int = 0):
    """Waymo pipeline: converted records -> optional GT-AUG paste -> global
    flip/rot/scale/translate (host); voxelize + CenterPoint target
    assignment run on device (``CenterPoint.loss_from_gt``). Mirrors the
    reference route (``det3d_ms/datasets/waymo/waymo.py:7`` through the same
    Preprocess pipeline the nuScenes recipe uses)."""
    from minddet_tpu.data.gt_sampler import (
        DataBaseSampler,
        build_gt_database,
        load_database,
    )
    from minddet_tpu.data.loader import DataLoader, DistributedSampler
    from minddet_tpu.data.waymo import WAYMO_CLASSES, WaymoDetection

    dcfg = cfg.data
    sampler_obj = None
    scfg = dcfg.get("gt_sampler", None)
    if scfg:
        path = scfg.get("database", None)
        if path and os.path.exists(path):
            db = load_database(path)
        else:
            db = build_gt_database(
                WaymoDetection(dcfg.records), WAYMO_CLASSES,
                min_points=dict(scfg.get("min_points", {})) or 5,
            )
        sampler_obj = DataBaseSampler(
            db,
            {str(k): int(v) for k, v in dict(scfg.get(
                "max_per_class", {"VEHICLE": 15})).items()},
            {c: i + 1 for i, c in enumerate(WAYMO_CLASSES)},
        )
    ds = WaymoDetection(
        dcfg.records,
        max_points=int(dcfg.get("max_points", 160000)),
        max_gt=int(dcfg.get("max_gt", 200)),
        augment=bool(dcfg.get("augment", True)),
        gt_sampler=sampler_obj,
        seed=seed,
    )
    sampler = DistributedSampler(
        len(ds), num_shards=jax.process_count(), shard_id=jax.process_index(),
        seed=seed,
    )
    loader = DataLoader(ds, batch_size, sampler=sampler,
                        num_workers=dcfg.get("workers", 4))
    for step, raw in enumerate(loader):
        raw.pop("gt_num_points", None)  # eval-protocol field, not a target
        raw["step"] = np.asarray(step, np.int32)
        yield raw


def synthetic_seg_batches(
    batch_size: int, image_hw, num_classes: int, seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Random images with blocky class-region masks (smoke runs / perf)."""
    rng = np.random.RandomState(seed)
    h, w = image_hw
    step = 0
    while True:
        step += 1
        # coarse 8x8 class grid upsampled -> learnable contiguous regions
        coarse = rng.randint(0, num_classes, (batch_size, 8, 8))
        mask = np.repeat(np.repeat(coarse, -(-h // 8), 1), -(-w // 8), 2)
        mask = mask[:, :h, :w].astype(np.int32)
        image = rng.rand(batch_size, h, w, 3).astype(np.float32)
        # paint a class-dependent hue so the mask is recoverable from pixels
        image += 0.5 * np.stack(
            [np.cos(mask * 2.1), np.sin(mask * 1.3), np.cos(mask * 0.7)], -1)
        yield {
            "image": image.astype(np.float32),
            "mask": mask,
            "valid": np.ones((batch_size, h, w), bool),
            "step": np.asarray(step, np.int32),
        }


def seg_batches(cfg, batch_size: int, seed: int = 0):
    """Segmentation records -> normalized image + mask + valid batches.

    The host side is the whole pipeline (flip augmentation happens on
    uint8 images before normalization); the device just consumes fixed
    shapes. Reference has no segmentation data path to mirror — this fills
    the README-promised DeepLabV3+/UNet gap."""
    from minddet_tpu.data.loader import DataLoader, DistributedSampler
    from minddet_tpu.data.seg import SegDataset

    dcfg = cfg.data
    ds = SegDataset(dcfg.records, augment=bool(dcfg.get("augment", True)),
                    seed=seed)
    sampler = DistributedSampler(
        len(ds), num_shards=jax.process_count(), shard_id=jax.process_index(),
        seed=seed,
    )
    loader = DataLoader(ds, batch_size, sampler=sampler,
                        num_workers=dcfg.get("workers", 4))
    for step, raw in enumerate(loader):
        raw["step"] = np.asarray(step, np.int32)
        yield raw


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
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in the workdir")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace (XPlane/Perfetto) of the run")
    p.add_argument("--data-url", default=None,
                   help="cloud-train: stage this (gs://, s3://, obs:// or "
                        "local) directory into <workdir>/data before "
                        "training and point data.records at it (the "
                        "reference's ModelArts train_cloud.py data_url)")
    p.add_argument("--train-url", default=None,
                   help="cloud-train: mirror the workdir (checkpoints, "
                        "metrics) to this destination when training ends "
                        "(train_cloud.py train_url)")
    args = p.parse_args(argv)

    # env-driven multi-host init must run BEFORE any backend query
    # (parallel/launch.py ordering contract)
    from minddet_tpu.parallel.launch import initialize_distributed

    initialize_distributed()

    cfg = Config.fromfile(args.config).merge_from_options(args.options)
    if args.data_url:
        from minddet_tpu.utils.cloud import sync_dir

        local_data = sync_dir(args.data_url, os.path.join(args.workdir, "data"))
        if "data" in cfg and cfg.data.get("records"):
            cfg.data["records"] = os.path.join(
                local_data, os.path.basename(str(cfg.data["records"])))
        logger.info("cloud-train: staged %s -> %s", args.data_url, local_data)
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
    data_type = cfg.data.get("type", "coco") if "data" in cfg else "coco"
    if args.synthetic or "data" not in cfg:
        if data_type in ("kitti", "nuscenes", "waymo"):
            pc_range = tuple(mcfg.get("pc_range", (0, -39.68, -3, 69.12, 39.68, 1)))
            # CenterPoint consumes 9D velocity boxes (waymo pads vel with 0)
            is_cp = data_type in ("nuscenes", "waymo")
            if is_cp:
                num_classes = int(sum(mcfg.get("task_num_classes", (10,))))
            batches = synthetic_points_batches(
                batch_size, pc_range, num_classes=num_classes,
                num_features=int(cfg.data.get("num_features", 5 if is_cp else 4))
                if "data" in cfg else (5 if is_cp else 4),
                box_dim=9 if is_cp else 7,
            )
        elif data_type == "seg" or mcfg.get("type") in ("UNet", "DeepLabV3Plus"):
            batches = synthetic_seg_batches(batch_size, image_hw, num_classes)
        else:
            batches = synthetic_detection_batches(
                batch_size, image_hw, num_classes,
                with_masks=bool(getattr(model, "with_mask", False)),
                mask_stride=int(getattr(model, "mask_stride", 4)),
            )
    elif data_type == "kitti":
        batches = kitti_batches(cfg, batch_size)
    elif data_type == "nuscenes":
        batches = nuscenes_batches(cfg, batch_size)
    elif data_type == "waymo":
        batches = waymo_batches(cfg, batch_size)
    elif data_type == "seg":
        batches = seg_batches(cfg, batch_size)
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
    save_every = int(tcfg.get("save_every", 1000))
    ckpt = CheckpointManager(
        os.path.join(args.workdir, "ckpt"),
        keep_max=int(tcfg.get("keep_checkpoint_max", 5)),
        save_interval_steps=save_every,
    )
    start_step = 0
    if args.resume and ckpt.latest_step() is not None:
        import flax

        template = flax.serialization.to_state_dict(
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state, "step": state.step}
        )
        restored = ckpt.restore(template)
        state = state.replace(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=flax.serialization.from_state_dict(
                state.params, restored["params"]),
            batch_stats=flax.serialization.from_state_dict(
                state.batch_stats, restored["batch_stats"]),
            opt_state=flax.serialization.from_state_dict(
                state.opt_state, restored["opt_state"]),
        )
        start_step = int(restored["step"])
        logger.info("resumed from step %d", start_step)
    trainer = Trainer(
        state, step_fn, mesh=mesh,
        metric_writer=MetricWriter(args.workdir),
        checkpoint_manager=ckpt,
        log_every=int(tcfg.get("log_every", 50)),
        save_every=save_every,
    )
    from minddet_tpu.core.metrics import profiler_trace

    with profiler_trace(os.path.join(args.workdir, "trace") if args.profile else None):
        trainer.fit(batches, num_steps=steps, batch_size=batch_size,
                    start_step=start_step)
    logger.info("done: %d steps", steps)
    if args.train_url:
        from minddet_tpu.parallel.launch import is_main_process
        from minddet_tpu.utils.cloud import upload_dir

        if is_main_process():  # rank-0 upload, like the reference's gating
            upload_dir(args.workdir, args.train_url)
            logger.info("cloud-train: uploaded %s -> %s",
                        args.workdir, args.train_url)


if __name__ == "__main__":
    main()
