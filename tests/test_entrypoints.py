"""Entry points: config load/override, train CLI smoke, export roundtrip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddet_tpu.core.config import Config, ConfigDict


def test_config_yaml_and_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  type: CenterNet\n  depth: 18\ntrain:\n  batch_size: 4\n")
    cfg = Config.fromfile(str(p)).merge_from_options(
        ["model.depth=50", "train.lr=0.01", "model.dcn=false"]
    )
    assert cfg.model.depth == 50
    assert cfg.model.dcn is False
    assert abs(cfg.train.lr - 0.01) < 1e-9
    assert cfg.model.type == "CenterNet"


def test_config_base_inheritance(tmp_path):
    (tmp_path / "base.yaml").write_text("model:\n  type: SSD\n  num_classes: 80\n")
    (tmp_path / "child.yaml").write_text("_base_: base.yaml\nmodel:\n  num_classes: 20\n")
    cfg = Config.fromfile(str(tmp_path / "child.yaml"))
    assert cfg.model.type == "SSD" and cfg.model.num_classes == 20


def test_py_config(tmp_path):
    (tmp_path / "c.py").write_text("model = dict(type='UNet', num_classes=3)\nlr = 0.1\n")
    cfg = Config.fromfile(str(tmp_path / "c.py"))
    assert cfg.model["type"] == "UNet"
    assert cfg.lr == 0.1


def test_registry_has_full_zoo():
    import minddet_tpu.train.train  # noqa: F401  (imports populate registry)
    from minddet_tpu.core.registry import DETECTORS

    expected = {
        "CenterNet", "PointPillars", "CenterPoint", "FasterRCNN", "MaskRCNN",
        "SSD", "YOLOX", "YOLOv8", "YOLOv3", "DeepLabV3Plus", "UNet",
    }
    assert expected <= set(DETECTORS.module_dict)


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    """3 synthetic steps of the real CLI on a tiny CenterNet."""
    from minddet_tpu.train.train import main

    cfgp = tmp_path / "tiny.yaml"
    cfgp.write_text(
        """
model:
  type: CenterNet
  num_classes: 4
  depth: 18
  dcn: false
train:
  image_hw: [64, 64]
  batch_size: 8
  log_every: 1
  save_every: 1000000
  optimizer:
    type: adam
  lr_schedule:
    type: warmup_cosine
    learning_rate: 1.0e-4
    total_steps: 10
"""
    )
    main([
        "--config", str(cfgp), "--synthetic", "--steps", "3",
        "--workdir", str(tmp_path / "run"),
    ])
    metrics_file = tmp_path / "run" / "metrics.jsonl"
    assert metrics_file.exists()
    lines = [json.loads(l) for l in metrics_file.read_text().splitlines()]
    assert len(lines) >= 2
    assert np.isfinite(lines[-1]["loss"])


@pytest.mark.slow
def test_export_roundtrip(tmp_path):
    from minddet_tpu.train.export import export_predict_fn, load_exported

    def fn(x):
        return {"y": jnp.tanh(x) * 2.0}

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8).astype(np.float32))
    path = str(tmp_path / "model.stablehlo")
    export_predict_fn(fn, (x,), path)
    assert os.path.getsize(path) > 100
    loaded = load_exported(path)
    out = loaded(x)
    np.testing.assert_allclose(
        np.asarray(out["y"]), np.tanh(np.asarray(x)) * 2.0, atol=1e-6
    )


def test_cloud_train_workflow(tmp_path):
    """--data-url stages records into the workdir, --train-url mirrors the
    results out (the reference's ModelArts train_cloud.py roles), with the
    staged input data excluded from the upload."""
    import cv2

    from minddet_tpu.data.coco import convert_coco_to_records
    from minddet_tpu.train.train import main

    # source "bucket": a directory of records (local paths share the same
    # code path as gs://'s fsspec mirror)
    src = tmp_path / "bucket"
    src.mkdir()
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    # >= batch_size images: the loader (correctly) refuses a shard smaller
    # than one batch under drop_last
    for i in range(8):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        images.append({"id": i + 1, "file_name": f"{i}.jpg",
                       "height": 64, "width": 64})
        annotations.append({"id": i + 1, "image_id": i + 1,
                            "bbox": [8.0, 8.0, 20.0, 20.0],
                            "category_id": 1, "iscrowd": 0, "area": 400.0})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "c1"}],
    }))
    convert_coco_to_records(str(ann), str(img_dir), str(src / "rec"))

    cfgp = tmp_path / "cfg.yaml"
    cfgp.write_text(
        """
model:
  type: CenterNet
  num_classes: 1
  depth: 18
  dcn: false
data:
  type: coco
  records: 'rec-*.arrayrecord'
  workers: 1
train:
  image_hw: [64, 64]
  batch_size: 8
  log_every: 1
  save_every: 1000000
  optimizer: {type: adam}
  lr_schedule: {type: warmup_cosine, learning_rate: 1.0e-4, total_steps: 2}
"""
    )
    workdir = tmp_path / "run"
    dest = tmp_path / "results"
    main([
        "--config", str(cfgp), "--steps", "2", "--workdir", str(workdir),
        "--data-url", str(src), "--train-url", str(dest),
    ])
    # staged locally and trained from the staged copy
    assert list((workdir / "data").glob("rec-*.arrayrecord"))
    # results mirrored out, staged data excluded
    assert (dest / "metrics.jsonl").exists()
    assert not (dest / "data").exists()
