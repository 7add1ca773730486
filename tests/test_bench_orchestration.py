"""Parent orchestration of bench.py driven with fake benches (BENCH_FAKE).

The real benches need the TPU; the budgeting/salvage logic around them is
what must not break unattended at round end: the one-process core chunk,
immediate per-line printing, partial-stdout salvage when a chunk hits its
cap, the bench_incomplete marker, and the headline-printed-LAST contract
(the driver's parsed metric is the last JSON line).
"""

import json
import os
import subprocess
import sys

import pytest

_BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


_NAMES = ("centernet_train", "decode_nms", "pointpillars_train",
          "centerpoint_train", "yolov8s_infer", "faster_rcnn_infer")


def _run(budget, fake_spec, timeout=120):
    env = dict(os.environ)
    spec = {n: {"est": 2, **fake_spec.get(n, {})} for n in _NAMES}
    env["BENCH_FAKE"] = json.dumps(spec)
    env["BENCH_BUDGET_S"] = str(budget)
    proc = subprocess.run([sys.executable, _BENCH], env=env,
                          capture_output=True, text=True, timeout=timeout)
    lines = [json.loads(ln) for ln in proc.stdout.strip().splitlines()]
    return proc, lines


def test_all_benches_land_and_headline_prints_last():
    proc, lines = _run(120, {})
    assert proc.returncode == 0
    metrics = [ln["metric"] for ln in lines]
    assert "bench_incomplete" not in metrics
    assert metrics[-1] == "centernet_r18dcn_train_img_per_sec_per_chip"
    assert len(set(metrics)) == 6


def test_secondary_chunk_salvages_partials_when_capped():
    # headline + decode finish instantly, pointpillars sleeps past the
    # budget: the secondary chunk is killed mid-sleep but decode's
    # already-printed line is salvaged and the marker names what never ran
    spec = {"pointpillars_train": {"sleep": 300}}
    proc, lines = _run(25, spec, timeout=180)
    metrics = [ln["metric"] for ln in lines]
    assert proc.returncode == 0  # headline landed
    assert metrics[-1] == "centernet_r18dcn_train_img_per_sec_per_chip"
    assert "decode_rotated_nms_p50_ms" in metrics
    marker = [ln for ln in lines if ln["metric"] == "bench_incomplete"]
    assert marker and "pointpillars_train" in marker[0]["unit"]
    assert "decode_nms" not in marker[0]["unit"]


@pytest.mark.slow
def test_headline_hang_still_lands_decode():
    # the headline child hangs to its cap; the ~90 s tail reserve means the
    # secondary chunk still runs and decode lands (exit 1: headline missing)
    spec = {"centernet_train": {"sleep": 600}}
    proc, lines = _run(90, spec, timeout=180)
    metrics = [ln["metric"] for ln in lines]
    assert proc.returncode == 1
    assert "decode_rotated_nms_p50_ms" in metrics
    marker = [ln for ln in lines if ln["metric"] == "bench_incomplete"]
    assert marker and "centernet_train" in marker[0]["unit"]


def test_failed_bench_does_not_stop_the_chunk():
    spec = {"decode_nms": {"fail": True}}
    proc, lines = _run(120, spec)
    metrics = [ln["metric"] for ln in lines]
    assert proc.returncode == 0
    assert "pointpillars_train_samples_per_sec_per_chip" in metrics
    marker = [ln for ln in lines if ln["metric"] == "bench_incomplete"]
    assert marker and "decode_nms" in marker[0]["unit"]
    assert metrics[-1] == "centernet_r18dcn_train_img_per_sec_per_chip"


def test_device_init_spec_cache_repo_fallback_and_invalidation(
        tmp_path, monkeypatch):
    import importlib.util
    import shutil

    spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    import numpy as np

    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    (tmp_path / "minddet_tpu" / "core").mkdir(parents=True)
    src_py = tmp_path / "minddet_tpu" / "core" / "m.py"
    src_py.write_text("x = 1\n")

    calls = []

    def make():
        calls.append(1)
        return {"params": {"w": np.full((2, 3), 0.5, np.float32),
                           "b": np.zeros(4, np.float32)}}

    v1 = bench._device_init("demo", make)
    v2 = bench._device_init("demo", make)
    assert len(calls) == 1  # second call regenerated from the cached spec
    import jax

    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v2))
    # constant leaves regenerate EXACTLY
    np.testing.assert_array_equal(np.asarray(v2["params"]["b"]),
                                  np.zeros(4, np.float32))
    assert np.asarray(v2["params"]["w"]).shape == (2, 3)

    # the committed bench_cache/ pack: move the spec out of .jax_cache into
    # a CLONE of the tree at a different absolute path — the repo-relative
    # fingerprint must still match and the repo candidate must be read
    clone = tmp_path / "clone"
    (clone / "minddet_tpu" / "core").mkdir(parents=True)
    (clone / "minddet_tpu" / "core" / "m.py").write_text("x = 1\n")
    (clone / "bench_cache").mkdir()
    shutil.move(str(tmp_path / ".jax_cache" / "bench_spec_demo.json"),
                str(clone / "bench_cache" / "bench_spec_demo.json"))
    monkeypatch.setattr(bench, "_REPO", str(clone))
    bench._device_init("demo", make)
    assert len(calls) == 1  # repo-pack hit despite the new absolute path

    # in-scope source change invalidates (cold init runs again)
    (clone / "minddet_tpu" / "core" / "m.py").write_text("x = 2\n")
    bench._device_init("demo", make)
    assert len(calls) == 2
    # OUT-of-scope change does NOT (per-bench fingerprints, VERDICT r4 1b)
    (clone / "minddet_tpu" / "data").mkdir()
    (clone / "minddet_tpu" / "data" / "x.py").write_text("y = 1\n")
    bench._device_init("demo", make)
    assert len(calls) == 2
