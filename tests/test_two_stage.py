"""CenterPoint two-stage: BEV feature extraction + proposal refinement.

The reference only ships the hook (``forward_two_stage`` returns boxes +
BEV features for a second stage that does not exist in its tree;
``SECOND_STAGE`` registry has zero members). Here the stage is real —
these tests pin the extractor's sampling geometry, the stage-2 loss
targets, gradient flow into the BEV map, and the fused refined-predict
program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.models.detectors.centerpoint import CenterPointTwoStage
from minddet_tpu.models.heads.second_stage import (
    BEVFeatureExtractor,
    BEVRefineHead,
    bev_sample_points,
)

PCR = (-6.4, -6.4, -5.0, 6.4, 6.4, 3.0)


def _model(**kw):
    return CenterPointTwoStage(
        task_num_classes=(1, 2), grid_ny=64, grid_nx=64,
        voxel_size=(0.2, 0.2, 8.0), pc_range=PCR,
        pfn_filters=(16,), rpn_layer_nums=(1, 1, 1),
        rpn_filters=(16, 32, 64), rpn_up_filters=(16, 16, 16),
        max_voxels=256, max_points_per_voxel=8, out_size_factor=4,
        num_proposals=16, refine_hidden=32, **kw)


def _batch(b=2, n=512, g=3, seed=0):
    rs = np.random.RandomState(seed)
    pts = rs.uniform([PCR[0], PCR[1], -2.0, 0.0, 0.0],
                     [PCR[3], PCR[4], 0.5, 1.0, 1.0],
                     (b, n, 5)).astype(np.float32)
    boxes = np.zeros((b, g, 9), np.float32)
    boxes[..., :2] = rs.uniform(-4.0, 4.0, (b, g, 2))
    boxes[..., 2] = -1.0
    boxes[..., 3:6] = [1.8, 4.2, 1.6]
    boxes[..., 8] = rs.uniform(-np.pi, np.pi, (b, g))
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rs.randint(1, 4, (b, g)), jnp.int32),
        "gt_mask": jnp.ones((b, g), bool),
    }


def test_bev_sample_points_geometry():
    # axis-aligned box at origin: center + face midpoints at +-w/2, +-l/2
    box = jnp.asarray([[[0.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0, 0.0, 0.0]]])
    pts = np.asarray(bev_sample_points(box))[0, 0]
    assert pts.shape == (5, 2)
    np.testing.assert_allclose(pts[0], [0.0, 0.0], atol=1e-6)
    # 4 face midpoints: (+-1, 0) across width, (0, +-2) along length
    got = {tuple(np.round(p, 5)) for p in pts[1:]}
    assert got == {(-1.0, 0.0), (1.0, 0.0), (0.0, 2.0), (0.0, -2.0)}
    # 90-degree yaw rotates the face set
    boxr = box.at[..., 8].set(jnp.pi / 2)
    ptsr = np.asarray(bev_sample_points(boxr))[0, 0]
    gotr = {tuple(np.round(p, 5)) for p in ptsr[1:]}
    assert gotr == {(0.0, -1.0), (0.0, 1.0), (-2.0, 0.0), (2.0, 0.0)}


def test_extractor_samples_expected_cell():
    # a delta feature at cell (y=5, x=9) is recovered by a box centered there
    ext = BEVFeatureExtractor(pc_range=PCR, voxel_size=(0.2, 0.2, 8.0),
                              out_size_factor=4)
    bev = jnp.zeros((1, 16, 16, 4))
    bev = bev.at[0, 5, 9].set(jnp.asarray([1.0, 2.0, 3.0, 4.0]))
    cx = 9 * 4 * 0.2 + PCR[0]
    cy = 5 * 4 * 0.2 + PCR[1]
    # tiny dims: all five sample points land inside the same cell
    boxes = jnp.asarray([[[cx, cy, 0.0, 1e-4, 1e-4, 1.0, 0.0, 0.0, 0.0]]])
    feats = ext.apply({}, bev, boxes)
    assert feats.shape == (1, 1, 20)
    np.testing.assert_allclose(np.asarray(feats).reshape(5, 4),
                               np.tile([1.0, 2.0, 3.0, 4.0], (5, 1)),
                               rtol=1e-3, atol=1e-3)


def test_refine_head_shapes_and_stats():
    head = BEVRefineHead(hidden=16)
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 8, 20), jnp.float32)
    vs = head.init({"params": jax.random.PRNGKey(0)}, feats)
    (score, deltas), mut = head.apply(vs, feats, train=True,
                                      mutable=["batch_stats"])
    assert score.shape == (2, 8) and deltas.shape == (2, 8, 7)
    assert "batch_stats" in mut


def test_two_stage_loss_and_grad_flow():
    model = _model()
    batch = _batch()
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch,
                    method=model.loss_from_gt)
    # stage-2 scopes exist alongside the flat single-stage tree
    assert "extractor" not in vs["params"]  # extractor has no params
    assert "refine" in vs["params"]
    (total, parts), _ = model.apply(vs, batch, train=True,
                                    method=model.loss_from_gt,
                                    mutable=["batch_stats"])
    assert np.isfinite(float(total))
    assert "stage2_score" in parts and "stage2_box" in parts
    assert float(parts["stage2_score"]) > 0.0

    # gradients reach BOTH the refine head and the shared RPN through the
    # extractor's bilinear samples (joint training)
    def loss_fn(params):
        (t, _), _ = model.apply(
            {"params": params, "batch_stats": vs["batch_stats"]}, batch,
            train=True, method=model.loss_from_gt, mutable=["batch_stats"])
        return t

    g = jax.grad(loss_fn)(vs["params"])
    g_refine = np.max(np.abs(np.asarray(g["refine"]["score"]["kernel"])))
    assert g_refine > 0.0
    g_rpn = max(float(np.max(np.abs(np.asarray(x))))
                for x in jax.tree_util.tree_leaves(g["rpn"]))
    assert g_rpn > 0.0


def test_predict_refined_shapes_and_score_combination():
    model = _model()
    batch = _batch()
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch,
                    method=model.loss_from_gt)
    out = jax.jit(
        lambda v, p, m: model.apply(v, p, m, method=model.predict_refined,
                                    nms_pre=32, nms_post=8)
    )(vs, batch["points"], batch["points_mask"])
    t = len(model.task_num_classes)
    assert out["boxes"].shape == (2, t * 8, 9)
    assert out["scores"].shape == (2, t * 8)
    assert out["labels"].shape == (2, t * 8)
    scores = np.asarray(out["scores"])
    labels = np.asarray(out["labels"])
    assert np.all(scores[labels < 0] == 0.0)
    assert np.all(scores >= 0.0) and np.all(scores <= 1.0)
    assert np.all(np.isfinite(np.asarray(out["boxes"])))


def test_stage2_score_target_formula():
    # clip(2*iou - 0.5): iou 0.25 -> 0, 0.55 -> 0.6, 0.9 -> 1.0
    iou = jnp.asarray([0.25, 0.55, 0.9])
    np.testing.assert_allclose(
        np.asarray(jnp.clip(2.0 * iou - 0.5, 0.0, 1.0)),
        [0.0, 0.6, 1.0], atol=1e-6)


def test_single_stage_checkpoint_loads_into_two_stage():
    from minddet_tpu.models.detectors.centerpoint import CenterPoint

    kw = dict(task_num_classes=(1, 2), grid_ny=64, grid_nx=64,
              voxel_size=(0.2, 0.2, 8.0), pc_range=PCR,
              pfn_filters=(16,), rpn_layer_nums=(1, 1, 1),
              rpn_filters=(16, 32, 64), rpn_up_filters=(16, 16, 16),
              max_voxels=256, max_points_per_voxel=8, out_size_factor=4)
    batch = _batch()
    single = CenterPoint(**kw)
    vs1 = single.init({"params": jax.random.PRNGKey(0)}, batch,
                      method=single.loss_from_gt)
    two = _model()
    vs2 = two.init({"params": jax.random.PRNGKey(0)}, batch,
                   method=two.loss_from_gt)
    # flat scope: every single-stage param key exists unchanged in the
    # two-stage tree with identical shapes
    flat1 = dict(jax.tree_util.tree_leaves_with_path(vs1["params"]))
    flat2 = dict(jax.tree_util.tree_leaves_with_path(vs2["params"]))
    missing = [k for k in flat1 if k not in flat2]
    assert not missing
    for k in flat1:
        assert flat1[k].shape == flat2[k].shape, k


def test_decode_boxes_analytic_peak():
    """A planted heatmap peak decodes to its exact world box, wins the
    global top-k, and carries the task-offset class label."""
    from minddet_tpu.models.heads.center_head import CenterHead

    head = CenterHead(task_num_classes=(1, 2))
    h = w = 8
    vs, osf = (0.2, 0.2, 8.0), 4
    pcr = PCR

    def blank(c):
        return {
            "hm": jnp.full((1, h, w, c), -8.0),
            "reg": jnp.zeros((1, h, w, 2)),
            "height": jnp.zeros((1, h, w, 1)),
            "dim": jnp.zeros((1, h, w, 3)),
            "rot": jnp.zeros((1, h, w, 2)),
            "vel": jnp.zeros((1, h, w, 2)),
        }

    t0, t1 = blank(1), blank(2)
    # peak in task 1, class index 1 (global label 1 + 1 = 2), cell (3, 5)
    t1["hm"] = t1["hm"].at[0, 3, 5, 1].set(6.0)
    t1["reg"] = t1["reg"].at[0, 3, 5].set(jnp.asarray([0.25, 0.75]))
    t1["height"] = t1["height"].at[0, 3, 5, 0].set(-1.2)
    t1["dim"] = t1["dim"].at[0, 3, 5].set(jnp.log(jnp.asarray([1.5, 4.0, 1.6])))
    t1["rot"] = t1["rot"].at[0, 3, 5].set(
        jnp.asarray([jnp.sin(0.3), jnp.cos(0.3)]))
    t1["vel"] = t1["vel"].at[0, 3, 5].set(jnp.asarray([2.0, -1.0]))

    boxes, scores, labels = head.decode_boxes(
        [t0, t1], pc_range=pcr, voxel_size=vs, out_size_factor=osf, k=4)
    b = np.asarray(boxes)[0, 0]
    np.testing.assert_allclose(b[0], (5 + 0.25) * osf * vs[0] + pcr[0],
                               rtol=1e-5)
    np.testing.assert_allclose(b[1], (3 + 0.75) * osf * vs[1] + pcr[1],
                               rtol=1e-5)
    np.testing.assert_allclose(b[2], -1.2, rtol=1e-5)
    np.testing.assert_allclose(b[3:6], [1.5, 4.0, 1.6], rtol=1e-4)
    np.testing.assert_allclose(b[6:8], [2.0, -1.0], rtol=1e-5)
    np.testing.assert_allclose(b[8], 0.3, rtol=1e-4)
    assert int(np.asarray(labels)[0, 0]) == 2
    assert float(np.asarray(scores)[0, 0]) > 0.99


def test_export_3d_refined_roundtrip(tmp_path):
    """predict_refined exports to StableHLO and the reloaded program
    reproduces the live detections (the reference's CenterPoint MINDIR
    export role, tools_ms/mindir.py:7-35 / eval_mindir.py:118)."""
    from minddet_tpu.train.export import export_detector_3d, load_exported

    model = _model()
    batch = _batch()
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch,
                    method=model.loss_from_gt)
    path = str(tmp_path / "cp2s.stablehlo")
    export_detector_3d(model, vs, batch["points"], batch["points_mask"],
                       path, refined=True, nms_pre=32, nms_post=8)
    live = model.apply(vs, batch["points"], batch["points_mask"],
                       method=model.predict_refined, nms_pre=32, nms_post=8)
    reloaded = load_exported(path)(batch["points"], batch["points_mask"])
    for k in ("boxes", "scores", "labels"):
        np.testing.assert_allclose(np.asarray(reloaded[k]),
                                   np.asarray(live[k]), rtol=1e-5, atol=1e-5)
