"""Faster/Mask R-CNN: ROIAlign golden tests, RPN proposals, loss grads, predict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddet_tpu.models.detectors.faster_rcnn import FasterRCNN
from minddet_tpu.ops.anchors2d import (
    grid_anchors,
    match_anchors,
    multilevel_anchors,
    rpn_targets,
    sample_balanced,
)
from minddet_tpu.ops.box import decode_deltas, encode_deltas
from minddet_tpu.ops.roi_align import multilevel_roi_align, roi_align

pytestmark = pytest.mark.slow  # full-model suites; deselect with -m 'not slow'


def test_delta_coder_roundtrip():
    rng = np.random.RandomState(0)
    anchors = np.concatenate(
        [rng.uniform(0, 100, (20, 2)), rng.uniform(110, 200, (20, 2))], 1
    ).astype(np.float32)
    boxes = anchors + rng.uniform(-10, 10, anchors.shape).astype(np.float32)
    d = encode_deltas(jnp.asarray(boxes), jnp.asarray(anchors), stds=(0.1, 0.1, 0.2, 0.2))
    back = decode_deltas(d, jnp.asarray(anchors), stds=(0.1, 0.1, 0.2, 0.2))
    np.testing.assert_allclose(np.asarray(back), boxes, rtol=1e-4, atol=1e-3)


def test_grid_anchors_centers():
    a = grid_anchors((2, 2), stride=16, scales=(1.0,), ratios=(1.0,))
    a = np.asarray(a)
    assert a.shape == (4, 4)
    centers = (a[:, :2] + a[:, 2:]) / 2
    np.testing.assert_allclose(centers[0], [8, 8])
    np.testing.assert_allclose(centers[-1], [24, 24])
    np.testing.assert_allclose(a[0, 2] - a[0, 0], 16.0)  # scale*stride


def test_roi_align_constant_region():
    feat = np.zeros((1, 16, 16, 2), np.float32)
    feat[0, 4:8, 4:8, 0] = 1.0
    out = roi_align(jnp.asarray(feat), jnp.array([[[4.0, 4.0, 8.0, 8.0]]]), (2, 2))
    # bins touching the region edge interpolate toward the zero border —
    # exact bilinear values
    np.testing.assert_allclose(
        np.asarray(out)[0, 0, :, :, 0],
        [[1.0, 0.75], [0.75, 0.5625]],
        atol=1e-5,
    )
    out2 = roi_align(jnp.asarray(feat), jnp.array([[[10.0, 10.0, 14.0, 14.0]]]), (2, 2))
    np.testing.assert_allclose(np.asarray(out2)[0, 0, :, :, 0], 0.0, atol=1e-5)


def test_roi_align_bilinear_value():
    # linear ramp along x: sampled value == x coordinate
    feat = np.tile(np.arange(16, dtype=np.float32)[None, None, :, None], (1, 16, 1, 1))
    out = roi_align(jnp.asarray(feat), jnp.array([[[2.0, 2.0, 6.0, 6.0]]]), (1, 1), 1)
    # single bin, single sample at center (4.0, 4.0) -> value 4.0
    np.testing.assert_allclose(float(out[0, 0, 0, 0, 0]), 4.0, atol=1e-4)


def test_multilevel_roi_align_level_selection():
    feats = [jnp.ones((1, 32, 32, 3)) * 1, jnp.ones((1, 16, 16, 3)) * 2]
    small = [4.0, 4.0, 40.0, 40.0]   # ~36px -> level 0
    large = [0.0, 0.0, 120.0, 120.0]  # ~120px -> level 1 (in 16x16@8 bounds)
    out = multilevel_roi_align(
        feats, jnp.array([[small, large]]), strides=(4, 8),
        canonical_scale=56.0, canonical_level=0,
    )
    np.testing.assert_allclose(np.asarray(out)[0, 0].mean(), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out)[0, 1].mean(), 2.0, atol=1e-4)


def test_match_and_sample():
    anchors = jnp.asarray(grid_anchors((8, 8), 8, scales=(1.0,), ratios=(1.0,)))
    gt = jnp.array([[16.0, 16.0, 24.0, 24.0], [0, 0, 0, 0]])
    mask = jnp.array([True, False])
    labels, match = match_anchors(anchors, gt, mask, pos_iou=0.7, neg_iou=0.3)
    labels = np.asarray(labels)
    assert (labels == 1).sum() >= 1
    assert (labels == 0).sum() > 40
    w = sample_balanced(jax.random.PRNGKey(0), jnp.asarray(labels), 16, 0.5)
    assert 0 < float(jnp.sum(w)) <= 16


def test_rpn_targets_shapes():
    anchors = jnp.asarray(multilevel_anchors((64, 64), (8, 16)))
    gt = jnp.array([[10.0, 10.0, 30.0, 30.0]])
    t = rpn_targets(jax.random.PRNGKey(1), anchors, gt, jnp.array([True]))
    assert t["deltas"].shape == (anchors.shape[0], 4)
    assert float(jnp.sum(t["reg_weights"])) >= 1


@pytest.fixture(scope="module")
def frcnn():
    model = FasterRCNN(
        num_classes=5, depth=18, image_hw=(64, 64),
        rpn_pre_nms=64, rpn_post_nms=32, roi_samples=16,
    )
    init_batch = {
        "image": jnp.zeros((1, 64, 64, 3)),
        "gt_boxes": jnp.array([[[8.0, 8.0, 30.0, 30.0]]]),
        "gt_classes": jnp.zeros((1, 1), jnp.int32),
        "gt_mask": jnp.ones((1, 1), bool),
    }
    # init through `loss` so ROI-head params (input-dim dependent) exist
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        init_batch,
        method=model.loss,
    )
    return model, variables


def test_frcnn_loss_and_grads(frcnn):
    model, variables = frcnn
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32)),
        "gt_boxes": jnp.array(
            [[[8.0, 8.0, 30.0, 30.0], [40.0, 40.0, 60.0, 56.0]]] * 2
        ),
        "gt_classes": jnp.array([[1, 3]] * 2),
        "gt_mask": jnp.ones((2, 2), bool),
    }
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        (total, parts), _ = model.apply(
            {"params": p, **others}, batch, train=True,
            method=model.loss, mutable=["batch_stats"],
            rngs={"sampling": jax.random.PRNGKey(2)},
        )
        return total, parts

    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert set(parts) == {"rpn_cls", "rpn_reg", "roi_cls", "roi_reg"}
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # gradient reaches both stages
    assert float(jnp.max(jnp.abs(grads["backbone"]["conv1"]["kernel"]))) > 0
    assert float(jnp.max(jnp.abs(grads["box_head"]["fc1"]["kernel"]))) > 0


def test_frcnn_predict_shapes(frcnn):
    model, variables = frcnn
    out = model.apply(
        variables, jnp.zeros((1, 64, 64, 3)), 0.0, 0.5, 10,
        method=model.predict,
    )
    assert out["boxes"].shape == (1, 10, 4)
    assert out["scores"].shape == (1, 10)
    assert out["labels"].shape == (1, 10)
    b = np.asarray(out["boxes"])
    assert b.min() >= 0 and b.max() <= 64
