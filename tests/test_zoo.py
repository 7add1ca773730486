"""Zoo-wide smoke + behavior tests: SSD, YOLOX, YOLOv8, YOLOv3, DeepLab, UNet.

Each model: init, forward shapes, loss finiteness + grad flow, predict shapes.
Tiny inputs keep CPU time bounded; shape math is resolution-independent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddet_tpu.models.detectors.ssd import SSD, ssd_anchors
from minddet_tpu.models.detectors.yolov3 import YOLOv3
from minddet_tpu.models.detectors.yolov4 import YOLOv4
from minddet_tpu.models.detectors.yolov5 import YOLOv5, yolov5_assign
from minddet_tpu.models.detectors.yolov7 import YOLOv7
from minddet_tpu.models.detectors.yolov8 import YOLOv8, dfl_decode
from minddet_tpu.models.detectors.yolox import YOLOX, simota_assign, yolo_grid
from minddet_tpu.models.segmentors import (
    DeepLabV3,
    DeepLabV3Plus,
    UNet,
    miou,
    segmentation_loss,
)
from minddet_tpu.ops.box import elementwise_ciou, elementwise_iou


def _det_batch(rng, b, hw, g=3):
    return {
        "image": jnp.asarray(rng.rand(b, hw, hw, 3).astype(np.float32)),
        "gt_boxes": jnp.asarray(
            np.stack([np.array([[8, 8, 40, 40], [30, 20, 60, 60], [5, 40, 25, 60]][:g], np.float32)] * b)
        ),
        "gt_classes": jnp.asarray(np.tile(np.arange(g, dtype=np.int32)[None], (b, 1))),
        "gt_mask": jnp.ones((b, g), bool),
    }


def _check_loss_grads(model, variables, batch, expected_parts, rngs=None):
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        kwargs = {"rngs": rngs} if rngs else {}
        (total, parts), _ = model.apply(
            {"params": p, **others}, batch, train=True,
            method=model.loss, mutable=["batch_stats"], **kwargs,
        )
        return total, parts

    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total)), parts
    assert expected_parts <= set(parts)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)
    return parts


# ---------------------------------------------------------------------------
# SSD
# ---------------------------------------------------------------------------

def test_ssd_anchors_counts():
    anchors, counts = ssd_anchors(300, (19, 10, 5, 3, 2, 1))
    assert anchors.shape[0] == sum(counts)
    assert counts[0] == 19 * 19 * 6
    # anchors live roughly in image space
    assert anchors[:, :2].min() > -300 and anchors[:, 2:].max() < 600


@pytest.mark.slow
def test_ssd_end_to_end():
    model = SSD(num_classes=4, image_size=96)
    rng = np.random.RandomState(0)
    batch = _det_batch(rng, 1, 96)
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    cls, reg = model.apply(variables, batch["image"])
    a = model.anchors()[0].shape[0]
    assert cls.shape == (1, a, 5) and reg.shape == (1, a, 4)
    _check_loss_grads(model, variables, batch, {"cls_loss", "reg_loss"})
    out = model.apply(variables, batch["image"], 0.0, 0.45, 8, 64, method=model.predict)
    assert out["boxes"].shape == (1, 8, 4)


# ---------------------------------------------------------------------------
# YOLO family
# ---------------------------------------------------------------------------

def test_yolo_grid():
    pts, sts = yolo_grid((64, 64), (8, 16, 32))
    assert pts.shape[0] == 8 * 8 + 4 * 4 + 2 * 2
    np.testing.assert_allclose(pts[0], [4.0, 4.0])
    assert set(np.unique(sts)) == {8.0, 16.0, 32.0}


def test_simota_assigns_center_anchor():
    pts, sts = yolo_grid((32, 32), (8,))
    pts, sts = jnp.asarray(pts), jnp.asarray(sts)
    a = pts.shape[0]
    boxes = jnp.concatenate([pts - 8, pts + 8], -1)  # each anchor a 16px box
    gt = jnp.array([[8.0, 8.0, 24.0, 24.0], [0, 0, 0, 0]])
    out = simota_assign(
        boxes, jnp.zeros((a,)), jnp.zeros((a, 3)), pts, sts,
        gt, jnp.array([1, 0]), jnp.array([True, False]),
    )
    fg = np.asarray(out["fg"])
    assert fg.sum() >= 1
    # the assigned anchors must be near the gt center (16, 16)
    centers = np.asarray(pts)[fg]
    assert np.all(np.linalg.norm(centers - 16.0, axis=1) < 24)


@pytest.mark.slow
def test_yolox_end_to_end():
    model = YOLOX(num_classes=4, image_hw=(64, 64))
    rng = np.random.RandomState(1)
    batch = _det_batch(rng, 1, 64)
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    reg, obj, cls = model.apply(variables, batch["image"])
    a = 8 * 8 + 4 * 4 + 2 * 2
    assert reg.shape == (1, a, 4) and obj.shape == (1, a) and cls.shape == (1, a, 4)
    _check_loss_grads(model, variables, batch, {"iou_loss", "obj_loss", "cls_loss"})
    out = model.apply(variables, batch["image"], 0.0, 0.65, 8, 64, method=model.predict)
    assert out["boxes"].shape == (1, 8, 4)


@pytest.mark.slow
def test_yolov8_end_to_end():
    model = YOLOv8(num_classes=4, image_hw=(64, 64))
    rng = np.random.RandomState(2)
    batch = _det_batch(rng, 1, 64)
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    dfl, cls = model.apply(variables, batch["image"])
    a = 8 * 8 + 4 * 4 + 2 * 2
    assert dfl.shape == (1, a, 4, 16) and cls.shape == (1, a, 4)
    _check_loss_grads(model, variables, batch, {"iou_loss", "cls_loss", "dfl_loss"})
    out = model.apply(variables, batch["image"], 0.0, 0.7, 8, 64, method=model.predict)
    assert out["boxes"].shape == (1, 8, 4)


def test_dfl_decode_monotonic():
    pts = jnp.array([[32.0, 32.0]])
    sts = jnp.array([8.0])
    logits = jnp.zeros((1, 1, 4, 16))
    # uniform distribution -> expectation 7.5 bins * 8 stride = 60 each side
    box = dfl_decode(logits, pts[None], sts[None])
    np.testing.assert_allclose(np.asarray(box[0, 0]), [-28, -28, 92, 92], atol=1e-3)


@pytest.mark.slow
def test_yolov3_end_to_end():
    model = YOLOv3(num_classes=4, image_hw=(64, 64))
    rng = np.random.RandomState(3)
    batch = _det_batch(rng, 1, 64)
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    outs = model.apply(variables, batch["image"])
    assert outs[0].shape == (1, 2, 2, 3, 9)   # stride 32
    assert outs[2].shape == (1, 8, 8, 3, 9)   # stride 8
    _check_loss_grads(model, variables, batch, {"l0_obj", "l2_box"})
    out = model.apply(variables, batch["image"], 0.0, 0.45, 8, 64, method=model.predict)
    assert out["boxes"].shape == (1, 8, 4)


# ---------------------------------------------------------------------------
# Anchor family (v4/v5/v7)
# ---------------------------------------------------------------------------

def test_ciou_golden():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    # identical boxes: CIoU == IoU == 1
    np.testing.assert_allclose(np.asarray(elementwise_ciou(a, a)), [1.0], atol=1e-6)
    # disjoint, same shape: IoU 0, penalty = center_dist^2/diag^2 (v-term zero)
    b = jnp.array([[20.0, 0.0, 30.0, 10.0]])
    # centers (5,5) and (25,5): d2=400; enclosure (0,0)-(30,10): diag2=1000
    np.testing.assert_allclose(np.asarray(elementwise_ciou(a, b)), [-0.4], atol=1e-6)
    # aspect mismatch adds the (detached-alpha) v penalty
    c = jnp.array([[0.0, 0.0, 20.0, 5.0]])
    iou = float(elementwise_iou(a, c)[0])
    v = (4 / np.pi**2) * (np.arctan(20 / 5) - np.arctan(1)) ** 2
    # same enclosure diag for both: rho2 = (5-10)^2 + (5-2.5)^2 = 31.25, diag2 = 500
    expect = iou - 31.25 / 500 - (v / (1 - iou + v)) * v
    np.testing.assert_allclose(np.asarray(elementwise_ciou(a, c)), [expect], rtol=1e-5)


def test_yolov5_assign_cross_grid():
    anchors = jnp.array([[16.0, 16.0], [200.0, 200.0]])
    # GT centered at (12, 20) on an 8-stride 4x4 grid: cell (x=1, y=2),
    # frac (0.5, 0.5) -> neighbors x+1 and y+1 (frac >= 0.5 picks the +1 side)
    gt = jnp.array([[4.0, 12.0, 20.0, 28.0]])  # 16x16 box
    pos, tbox, tcls = yolov5_assign(
        gt, jnp.array([3]), jnp.array([True]), anchors, 8.0, (4, 4)
    )
    pos = np.asarray(pos).reshape(4, 4, 2)
    # anchor 0 (16x16, ratio 1) matches; anchor 1 (200x200, ratio 12.5) gated out
    assert pos[..., 1].sum() == 0
    assert pos[2, 1, 0] == 1.0           # center cell
    assert pos[2, 2, 0] == 1.0           # x neighbor
    assert pos[3, 1, 0] == 1.0           # y neighbor
    assert pos[..., 0].sum() == 3
    tb = np.asarray(tbox).reshape(4, 4, 2, 4)
    np.testing.assert_allclose(tb[2, 1, 0], [4, 12, 20, 28])
    assert np.asarray(tcls).reshape(4, 4, 2)[2, 1, 0] == 3
    # masked-out GT assigns nothing
    pos0, _, _ = yolov5_assign(
        gt, jnp.array([3]), jnp.array([False]), anchors, 8.0, (4, 4)
    )
    assert np.asarray(pos0).sum() == 0


@pytest.mark.slow
def test_yolov5_end_to_end():
    model = YOLOv5(num_classes=4, image_hw=(64, 64))
    rng = np.random.RandomState(6)
    batch = _det_batch(rng, 1, 64)
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    outs = model.apply(variables, batch["image"])
    assert outs[0].shape == (1, 8, 8, 3, 9)   # stride 8
    assert outs[2].shape == (1, 2, 2, 3, 9)   # stride 32
    _check_loss_grads(model, variables, batch, {"box_loss", "obj_loss", "cls_loss"})
    out = model.apply(variables, batch["image"], 0.0, 0.45, 8, 64, method=model.predict)
    assert out["boxes"].shape == (1, 8, 4)


@pytest.mark.slow
def test_yolov4_end_to_end():
    model = YOLOv4(num_classes=4, image_hw=(64, 64), width_mult=0.25)
    rng = np.random.RandomState(7)
    batch = _det_batch(rng, 1, 64)
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    outs = model.apply(variables, batch["image"])
    assert outs[0].shape == (1, 8, 8, 3, 9)
    _check_loss_grads(model, variables, batch, {"box_loss", "obj_loss", "cls_loss"})
    out = model.apply(variables, batch["image"], 0.0, 0.45, 8, 64, method=model.predict)
    assert out["boxes"].shape == (1, 8, 4)


@pytest.mark.slow
def test_yolov7_end_to_end():
    model = YOLOv7(num_classes=4, image_hw=(64, 64), width_mult=0.25)
    rng = np.random.RandomState(8)
    batch = _det_batch(rng, 1, 64)
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    outs = model.apply(variables, batch["image"])
    assert outs[0].shape == (1, 8, 8, 3, 9)
    _check_loss_grads(model, variables, batch, {"box_loss", "obj_loss", "cls_loss"})
    out = model.apply(variables, batch["image"], 0.0, 0.45, 8, 64, method=model.predict)
    assert out["boxes"].shape == (1, 8, 4)


# ---------------------------------------------------------------------------
# Segmentation
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_deeplab_end_to_end():
    model = DeepLabV3Plus(num_classes=5, depth=18)
    rng = np.random.RandomState(4)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 5, (1, 64, 64)))
    variables = model.init(jax.random.PRNGKey(0), image)
    logits = model.apply(variables, image)
    assert logits.shape == (1, 64, 64, 5)
    batch = {"image": image, "mask": mask}
    _check_loss_grads(model, variables, batch, {"ce"})
    pred = model.apply(variables, image, method=model.predict)
    assert pred.shape == (1, 64, 64)


def test_unet_end_to_end():
    model = UNet(num_classes=3, widths=(8, 16, 32))
    rng = np.random.RandomState(5)
    image = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 3, (1, 32, 32)))
    variables = model.init(jax.random.PRNGKey(0), image)
    logits = model.apply(variables, image)
    assert logits.shape == (1, 32, 32, 3)
    batch = {"image": image, "mask": mask}
    _check_loss_grads(model, variables, batch, {"ce"})


def test_segmentation_loss_and_miou():
    logits = jnp.zeros((1, 4, 4, 3)).at[..., 1].set(10.0)
    mask = jnp.ones((1, 4, 4), jnp.int32)
    total, parts = segmentation_loss(logits, mask)
    assert float(total) < 0.01  # perfect prediction
    m = miou(jnp.argmax(logits, -1), mask, 3)
    np.testing.assert_allclose(float(m), 1.0)
    m2 = miou(jnp.zeros((1, 4, 4), jnp.int32), mask, 3)
    np.testing.assert_allclose(float(m2), 0.0)


# ---------------------------------------------------------------------------
# Fast-lane smoke: every detector/segmentor family forward+loss, unmarked so
# the default CI lane (-m "not slow") always exercises the whole zoo.
# ---------------------------------------------------------------------------

def test_zoo_fast_smoke_all_families():
    rng = np.random.RandomState(7)
    batch64 = _det_batch(rng, 1, 64)

    def loss_of(model, batch):
        variables = model.init(jax.random.PRNGKey(0), batch["image"])
        (total, _), _ = model.apply(
            variables, batch, train=True, method=model.loss,
            mutable=["batch_stats"],
        )
        assert np.isfinite(float(total)), type(model).__name__
        return float(total)

    loss_of(SSD(num_classes=4, image_size=96), _det_batch(rng, 1, 96))
    loss_of(YOLOX(num_classes=4, image_hw=(64, 64)), batch64)
    loss_of(YOLOv8(num_classes=4, image_hw=(64, 64)), batch64)
    loss_of(YOLOv3(num_classes=4, image_hw=(64, 64)), batch64)
    loss_of(YOLOv5(num_classes=4, image_hw=(64, 64)), batch64)
    loss_of(YOLOv4(num_classes=4, image_hw=(64, 64), width_mult=0.25), batch64)
    loss_of(YOLOv7(num_classes=4, image_hw=(64, 64), width_mult=0.25), batch64)

    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 5, (1, 64, 64)))
    for cls in (DeepLabV3Plus, DeepLabV3):
        model = cls(num_classes=5, depth=18)
        variables = model.init(jax.random.PRNGKey(0), image)
        # plain v3 must not own decoder params; v3+ must
        has_dec = any(k.startswith("dec") for k in variables["params"])
        assert has_dec == (cls is DeepLabV3Plus)
        (total, _), _ = model.apply(
            variables, {"image": image, "mask": mask}, train=True,
            method=model.loss, mutable=["batch_stats"],
        )
        assert np.isfinite(float(total))
        pred = model.apply(variables, image, method=model.predict)
        assert pred.shape == (1, 64, 64)
