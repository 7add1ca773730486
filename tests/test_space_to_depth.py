"""Space-to-depth RPN path == standard path with the SAME parameters.

The s2d variant (SECONDRPN.input_space_to_depth /
PointPillars.rpn_space_to_depth) exists as a perf lever for the block0
data-formatting wall (VERDICT r3 item 6); it must be a pure layout change:
identical outputs, identical parameter tree.
"""

import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.models.detectors.pointpillars import PointPillars
from minddet_tpu.models.necks.second_rpn import (
    SECONDRPN,
    depth_to_space,
    space_to_depth,
)


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 12, 5), jnp.float32)
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


def test_rpn_s2d_matches_standard():
    kw = dict(layer_nums=(2, 2), layer_strides=(2, 2), num_filters=(8, 16),
              upsample_strides=(1, 2), num_upsample_filters=(8, 8))
    rpn = SECONDRPN(**kw)
    rpn_s2d = SECONDRPN(input_space_to_depth=True, **kw)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 24, 6), jnp.float32)
    variables = rpn.init(jax.random.PRNGKey(0), x, train=False)
    # identical parameter tree either way (checkpoint compatibility)
    v2 = rpn_s2d.init(jax.random.PRNGKey(0), space_to_depth(x), train=False)
    assert jax.tree_util.tree_structure(variables) == (
        jax.tree_util.tree_structure(v2))
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves_with_path(v2)):
        assert p1 == p2 and a.shape == b.shape

    out = rpn.apply(variables, x, train=False)
    out_s2d = rpn_s2d.apply(variables, space_to_depth(x), train=False)
    np.testing.assert_allclose(np.asarray(out_s2d), np.asarray(out),
                               atol=2e-5, rtol=2e-5)
    # train mode: same outputs AND same batch-stats updates
    o1, m1 = rpn.apply(variables, x, train=True, mutable=["batch_stats"])
    o2, m2 = rpn_s2d.apply(variables, space_to_depth(x), train=True,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               atol=2e-5, rtol=2e-5)
    for (k1, s1), (k2, s2) in zip(
            jax.tree_util.tree_leaves_with_path(m1),
            jax.tree_util.tree_leaves_with_path(m2)):
        assert k1 == k2
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                                   atol=2e-5, rtol=2e-5)


def _small_pp(**kw):
    return PointPillars(
        num_classes=1, grid_ny=32, grid_nx=32,
        voxel_size=(0.2, 0.2, 4.0), pc_range=(0.0, -3.2, -3.0, 6.4, 3.2, 1.0),
        rpn_filters=(16, 32, 64), rpn_up_filters=(16, 16, 16),
        anchor_strides=((0.4, 0.4, 0.0),), anchor_offsets=((0.2, -3.0, -1.78),),
        max_voxels=256, max_points_per_voxel=8, **kw,
    )


def test_pointpillars_s2d_loss_and_predict_match():
    rng = np.random.RandomState(2)
    pts = np.stack([rng.uniform(0.2, 6.2, (2, 600)),
                    rng.uniform(-3, 3, (2, 600)),
                    rng.uniform(-2.5, 0.5, (2, 600)),
                    rng.uniform(0, 1, (2, 600))], -1).astype(np.float32)
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((2, 600), bool),
        "gt_boxes": jnp.asarray(
            [[[3.0, 0.0, -1.8, 1.6, 3.9, 1.56, 0.1]]] * 2, jnp.float32),
        "gt_classes": jnp.ones((2, 1), jnp.int32),
        "gt_mask": jnp.ones((2, 1), bool),
    }
    m0 = _small_pp()
    m1 = _small_pp(rpn_space_to_depth=True)
    variables = m0.init({"params": jax.random.PRNGKey(0)}, batch,
                        method=m0.loss_from_gt)
    (l0, p0), _ = m0.apply(variables, batch, method=m0.loss_from_gt,
                           mutable=["batch_stats"])
    (l1, p1), _ = m1.apply(variables, batch, method=m1.loss_from_gt,
                           mutable=["batch_stats"])
    np.testing.assert_allclose(float(l1), float(l0), atol=1e-4, rtol=1e-5)
    for k in p0:
        np.testing.assert_allclose(float(p1[k]), float(p0[k]),
                                   atol=1e-4, rtol=1e-5)

    o0 = m0.apply(variables, batch["points"], batch["points_mask"],
                  method=m0.predict_from_points, score_threshold=0.0)
    o1 = m1.apply(variables, batch["points"], batch["points_mask"],
                  method=m1.predict_from_points, score_threshold=0.0)
    np.testing.assert_allclose(np.asarray(o1["boxes"]),
                               np.asarray(o0["boxes"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(o1["scores"]),
                               np.asarray(o0["scores"]), atol=1e-4)


def test_centerpoint_s2d_loss_matches():
    from minddet_tpu.models.detectors.centerpoint import CenterPoint

    kw = dict(
        task_num_classes=(1, 2), grid_ny=64, grid_nx=64,
        voxel_size=(0.4, 0.4, 8.0),
        pc_range=(-12.8, -12.8, -5.0, 12.8, 12.8, 3.0),
        max_voxels=512, max_points_per_voxel=8, max_objs=16,
        rpn_filters=(16, 32, 64), rpn_up_filters=(16, 16, 16),
    )
    rng = np.random.RandomState(3)
    batch = {
        "points": jnp.asarray(np.concatenate(
            [rng.uniform(-10, 10, (2, 500, 3)),
             rng.uniform(0, 1, (2, 500, 2))], -1), jnp.float32),
        "points_mask": jnp.ones((2, 500), bool),
        "gt_boxes": jnp.asarray(
            [[[1.0, 2.0, -0.5, 1.8, 4.2, 1.6, 0.5, -0.5, 0.3],
              [-3.0, 4.0, -0.5, 0.6, 0.8, 1.7, 0.0, 0.0, -0.2]]] * 2,
            jnp.float32),
        "gt_classes": jnp.asarray([[1, 2]] * 2, jnp.int32),
        "gt_mask": jnp.ones((2, 2), bool),
    }
    m0 = CenterPoint(**kw)
    m1 = CenterPoint(rpn_space_to_depth=True, **kw)
    variables = m0.init({"params": jax.random.PRNGKey(0)}, batch,
                        method=m0.loss_from_gt)
    (l0, _), _ = m0.apply(variables, batch, method=m0.loss_from_gt,
                          mutable=["batch_stats"])
    (l1, _), _ = m1.apply(variables, batch, method=m1.loss_from_gt,
                          mutable=["batch_stats"])
    np.testing.assert_allclose(float(l1), float(l0), atol=1e-4, rtol=1e-5)


def test_rpn_unrolled_matches_scanned():
    """rpn_scan_inner=False (r4 perf A/B lever) is a pure compilation-shape
    change: identical outputs and batch-stats updates from the same params."""
    kw = dict(layer_nums=(3, 2), layer_strides=(2, 2), num_filters=(8, 16),
              upsample_strides=(1, 2), num_upsample_filters=(8, 8))
    scanned = SECONDRPN(scan_inner=True, **kw)
    unrolled = SECONDRPN(scan_inner=False, **kw)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 24, 6), jnp.float32)
    variables = scanned.init(jax.random.PRNGKey(0), x, train=False)

    out_s = scanned.apply(variables, x, train=False)
    out_u = unrolled.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s),
                               atol=2e-5, rtol=2e-5)
    o1, m1 = scanned.apply(variables, x, train=True, mutable=["batch_stats"])
    o2, m2 = unrolled.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               atol=2e-5, rtol=2e-5)
    for (k1, s1), (k2, s2) in zip(
            jax.tree_util.tree_leaves_with_path(m1),
            jax.tree_util.tree_leaves_with_path(m2)):
        assert k1 == k2
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                                   atol=2e-5, rtol=2e-5)

    # parameter grads match too (the scan body's custom-VJP batch stats
    # recompute the f32 cast instead of saving it — must be grad-exact)
    def loss(rpn):
        def f(params):
            out = rpn.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])[0]
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    g_s = jax.grad(loss(scanned))(variables["params"])
    g_u = jax.grad(loss(unrolled))(variables["params"])
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_u),
            jax.tree_util.tree_leaves_with_path(g_s)):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-3, rtol=2e-4)

    # per-block threshold: block0 (3 layers) unrolls, block1 (2 layers)
    # would scan at min=2 but unrolls at min=4 — either way outputs and
    # batch-stats updates are identical to the fully scanned form
    mixed = SECONDRPN(scan_inner=True, scan_min_layers=4, **kw)
    out_m = mixed.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_s),
                               atol=2e-5, rtol=2e-5)
    o3, m3 = mixed.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o1),
                               atol=2e-5, rtol=2e-5)
    for (k1, s1), (k3, s3) in zip(
            jax.tree_util.tree_leaves_with_path(m1),
            jax.tree_util.tree_leaves_with_path(m3)):
        assert k1 == k3
        np.testing.assert_allclose(np.asarray(s3), np.asarray(s1),
                                   atol=2e-5, rtol=2e-5)
