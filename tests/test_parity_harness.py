"""Dry run of the one-command parity harness on synthetic records
(VERDICT r3 item 10): the exact code path a real-data parity run takes —
model build, optional checkpoint conversion, full protocol eval, printed
reference-vs-ours table — exercised end to end with random init."""

import importlib.util
import json
import os

import cv2
import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_parity_main():
    spec = importlib.util.spec_from_file_location(
        "parity_eval", os.path.join(_REPO, "tools", "parity_eval.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main


def _make_coco(tmp_path, n_images=4):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        h, w = 80, 100
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        images.append({"id": i + 1, "file_name": name,
                       "height": h, "width": w})
        for _ in range(2):
            x, y = rng.uniform(0, w - 30), rng.uniform(0, h - 30)
            bw, bh = rng.uniform(10, 25), rng.uniform(10, 25)
            annotations.append({
                "id": aid, "image_id": i + 1,
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "category_id": int(rng.choice([1, 3])),
                "iscrowd": 0, "area": float(bw * bh),
            })
            aid += 1
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": c, "name": f"c{c}"} for c in (1, 3)]}
    f = tmp_path / "instances.json"
    f.write_text(json.dumps(ann))
    return str(f), str(img_dir)


@pytest.mark.slow
def test_parity_harness_centernet_dry_run(tmp_path, capsys):
    from minddet_tpu.data.coco import convert_coco_to_records

    main = _load_parity_main()
    ann, imgs = _make_coco(tmp_path)
    convert_coco_to_records(ann, imgs, str(tmp_path / "rec"))
    rc = main([
        "--model", "centernet", "--records",
        str(tmp_path / "rec-*.arrayrecord"), "--num-classes", "2",
        "--max-frames", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "RANDOM INIT (dry run)" in out
    assert "reference" in out and "ours" in out
    # the reference column carries the published COCO table
    assert "28.70" in out
