"""PointPillars end-to-end: shapes, loss grads, predict path (tiny grid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddet_tpu.models.detectors.pointpillars import (
    PointPillars,
    add_sin_difference,
    get_direction_target,
    prepare_loss_weights,
)
from minddet_tpu.ops.anchors import assign_targets_batch, create_anchors_3d_stride
from minddet_tpu.ops.voxelize import voxelize_batch

pytestmark = pytest.mark.slow  # full-model suites; deselect with -m 'not slow'

VS = (0.2, 0.2, 4.0)
PCR = (0.0, -3.2, -3.0, 6.4, 3.2, 1.0)  # tiny 32x32 grid
NY = NX = 32
MAXV, MAXP = 256, 8


@pytest.fixture(scope="module")
def setup():
    model = PointPillars(
        num_classes=1, grid_ny=NY, grid_nx=NX, voxel_size=VS, pc_range=PCR,
        rpn_filters=(32, 64, 128), rpn_up_filters=(32, 32, 32),
    )
    rng = np.random.RandomState(0)
    b, n = 2, 400
    pts = np.stack(
        [
            rng.uniform(0.2, 6.2, (b, n)),
            rng.uniform(-3.0, 3.0, (b, n)),
            rng.uniform(-2.5, 0.5, (b, n)),
            rng.uniform(0, 1, (b, n)),
        ],
        axis=-1,
    ).astype(np.float32)
    vox = voxelize_batch(jnp.asarray(pts), jnp.ones((b, n), bool), VS, PCR, MAXV, MAXP)
    anchors = jnp.asarray(
        create_anchors_3d_stride(
            (NY // 2, NX // 2), anchor_strides=(0.4, 0.4, 0.0),
            anchor_offsets=(0.2, -3.0, -1.78),
        ).reshape(-1, 7)
    )
    variables = model.init(
        jax.random.PRNGKey(0), vox.voxels, vox.num_points, vox.coords, train=False
    )
    return model, variables, vox, anchors


def test_forward_shapes(setup):
    model, variables, vox, anchors = setup
    out = model.apply(variables, vox.voxels, vox.num_points, vox.coords)
    a = anchors.shape[0]
    assert out["box_preds"].shape == (2, a, 7)
    assert out["cls_preds"].shape == (2, a, 1)
    assert out["dir_preds"].shape == (2, a, 2)


def test_loss_and_grads(setup):
    model, variables, vox, anchors = setup
    gt = jnp.zeros((2, 3, 7))
    gt = gt.at[:, 0].set(jnp.array([3.0, 0.0, -1.8, 1.6, 3.9, 1.56, 0.3]))
    gt_cls = jnp.ones((2, 3), jnp.int32)
    gt_mask = jnp.zeros((2, 3), bool).at[:, 0].set(True)
    m_th = jnp.full((anchors.shape[0],), 0.4)
    u_th = jnp.full((anchors.shape[0],), 0.3)
    t = assign_targets_batch(anchors, gt, gt_cls, gt_mask, m_th, u_th, None)
    assert int(jnp.sum(t["labels"] > 0)) > 0

    batch = {
        "voxels": vox.voxels, "num_points": vox.num_points, "coords": vox.coords,
        "anchors": anchors, "labels": t["labels"], "reg_targets": t["bbox_targets"],
    }
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        (total, parts), _ = model.apply(
            {"params": p, **others}, batch, train=True,
            method=model.loss, mutable=["batch_stats"],
        )
        return total, parts

    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total)) and float(total) > 0
    assert {"loc_loss", "cls_loss", "dir_loss"} <= set(parts)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_predict_shapes_and_validity(setup):
    model, variables, vox, anchors = setup
    out = model.apply(
        variables, vox.voxels, vox.num_points, vox.coords, anchors,
        None, 0.0, 64, 16, 0.1,
        method=model.predict,
    )
    assert out["boxes"].shape == (2, 16, 7)
    assert out["scores"].shape == (2, 16)
    assert out["labels"].shape == (2, 16)
    s = np.asarray(out["scores"])
    assert np.all(s >= 0) and np.all(s <= 1)


def test_sin_difference_identity():
    p = jnp.array([[[1.0, 2, 3, 4, 5, 6, 0.7]]])
    t = jnp.array([[[1.0, 2, 3, 4, 5, 6, 0.7]]])
    sp, st = add_sin_difference(p, t)
    np.testing.assert_allclose(np.asarray(sp[..., -1]), np.asarray(st[..., -1]), atol=1e-6)


def test_direction_target():
    anchors = jnp.array([[[0, 0, 0, 1, 1, 1, 0.0]]] )
    reg = jnp.array([[[0, 0, 0, 0, 0, 0, 0.5]]])  # rot_gt = 0.5 > 0
    d = get_direction_target(anchors, reg)
    np.testing.assert_allclose(np.asarray(d[0, 0]), [0.0, 1.0])
    reg = jnp.array([[[0, 0, 0, 0, 0, 0, -0.5]]])
    d = get_direction_target(anchors, reg)
    np.testing.assert_allclose(np.asarray(d[0, 0]), [1.0, 0.0])


def test_prepare_loss_weights_normalization():
    labels = jnp.array([[1, 1, 0, 0, -1]])
    cls_w, reg_w, cared = prepare_loss_weights(labels)
    np.testing.assert_allclose(np.asarray(reg_w[0]), [0.5, 0.5, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(cls_w[0]), [0.5, 0.5, 0.5, 0.5, 0])
    np.testing.assert_array_equal(np.asarray(cared[0]), [1, 1, 1, 1, 0])


def test_loss_from_gt_device_pipeline():
    """Fused voxelize + anchor-mask + assign + loss in one traced program."""
    import numpy as np

    from minddet_tpu.train.train import synthetic_points_batches

    pcr = (0.0, -10.24, -3.0, 20.48, 10.24, 1.0)
    model = PointPillars(
        num_classes=1, grid_ny=128, grid_nx=128,
        voxel_size=(0.16, 0.16, 4.0), pc_range=pcr,
        anchor_sizes=((1.6, 3.9, 1.56),), anchor_strides=((0.32, 0.32, 0.0),),
        anchor_offsets=((0.16, -10.08, -1.78),),
        max_voxels=2000, max_points_per_voxel=16,
        rpn_filters=(32, 64, 128), rpn_up_filters=(32, 32, 32),
    )
    batch = next(synthetic_points_batches(2, pcr, num_points=2000, seed=1))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           method=model.loss_from_gt)
    (total, parts), _ = model.apply(
        variables, batch, train=True, method=model.loss_from_gt,
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(total))
    assert {"loc_loss", "cls_loss", "dir_loss"} <= set(parts)
    # anchor set matches the head's flat prediction count
    gen = model.bind(variables).anchor_set()
    assert gen["anchors"].shape == (64 * 64 * 2, 7)
    out = model.apply(variables, batch["points"], batch["points_mask"],
                      method=model.predict_from_points)
    assert out["boxes"].shape == (2, 300, 7)


def test_stream_predict_matches_padded_path():
    """``predict_from_points`` (stream pillar path + occupancy-channel anchor
    mask) must reproduce ``predict`` fed the padded voxelization plus the
    coordinate-derived BEV-occupancy anchor mask of the same cloud."""
    from minddet_tpu.ops.anchors import anchors_bev_area_mask
    from minddet_tpu.ops.box import rbbox_to_near_bbox

    model = PointPillars(
        num_classes=1, grid_ny=NY, grid_nx=NX, voxel_size=VS, pc_range=PCR,
        rpn_filters=(32, 64, 128), rpn_up_filters=(32, 32, 32),
        max_voxels=MAXV, max_points_per_voxel=MAXP,
        anchor_strides=((0.4, 0.4, 0.0),), anchor_offsets=((0.2, -3.0, -1.78),),
        # the padded comparator (voxelize_batch) drops overflow first-come;
        # MAXV can be < occupied cells here, so pin the stream path to the
        # same order — sorted-vs-first-come parity is test_voxelize's job
        voxel_drop_order="first_come",
    )
    rng = np.random.RandomState(5)
    b, n = 2, 350
    pts = np.stack(
        [
            rng.uniform(0.2, 6.2, (b, n)),
            rng.uniform(-3.0, 3.0, (b, n)),
            rng.uniform(-2.5, 0.5, (b, n)),
            rng.uniform(0, 1, (b, n)),
        ],
        axis=-1,
    ).astype(np.float32)
    points = jnp.asarray(pts)
    mask = jnp.asarray(rng.rand(b, n) < 0.9)
    variables = model.init(
        jax.random.PRNGKey(2), points, mask, nms_pre=64, nms_post=16,
        method=model.predict_from_points)

    stream = model.apply(variables, points, mask, 0.0, 64, 16, 0.1,
                         method=model.predict_from_points)

    gen = model.anchor_set()  # pure config, no params
    vox = voxelize_batch(points, mask, VS, PCR, MAXV, MAXP)
    anchors_bv = rbbox_to_near_bbox(gen["anchors"][:, [0, 1, 3, 4, 6]])
    amask = jax.vmap(
        lambda c: anchors_bev_area_mask(
            c, anchors_bv, (NY, NX), VS, PCR, model.anchor_area_threshold,
        )
    )(vox.coords)
    padded = model.apply(variables, vox.voxels, vox.num_points, vox.coords,
                         gen["anchors"], amask, 0.0, 64, 16, 0.1,
                         method=model.predict)

    s_s, s_p = np.asarray(stream["scores"]), np.asarray(padded["scores"])
    i_s, i_p = s_s.argmax(1), s_p.argmax(1)
    np.testing.assert_allclose(
        s_s[np.arange(b), i_s], s_p[np.arange(b), i_p], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stream["boxes"])[np.arange(b), i_s],
        np.asarray(padded["boxes"])[np.arange(b), i_p], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.sort(s_s, 1), np.sort(s_p, 1),
                               rtol=1e-3, atol=1e-4)
