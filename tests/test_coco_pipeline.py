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
