"""Anchor generation, BEV-occupancy masking, and target assignment tests."""

import jax.numpy as jnp
import numpy as np

from minddet_tpu.ops.anchors import (
    ClassAnchorConfig,
    anchors_bev_area_mask,
    assign_targets,
    create_anchors_3d_stride,
    generate_anchors,
)
from minddet_tpu.ops.box import rbbox_to_near_bbox, second_box_decode


def test_anchor_grid_layout():
    a = create_anchors_3d_stride(
        (4, 6), sizes=(1.6, 3.9, 1.56), anchor_strides=(0.4, 0.4, 0.0),
        anchor_offsets=(0.2, -39.8, -1.78),
    )
    assert a.shape == (4, 6, 1, 2, 7)
    np.testing.assert_allclose(a[0, 0, 0, 0, :3], [0.2, -39.8, -1.78])
    np.testing.assert_allclose(a[0, 1, 0, 0, 0], 0.6)  # x advances with nx
    np.testing.assert_allclose(a[1, 0, 0, 0, 1], -39.4)  # y advances with ny
    np.testing.assert_allclose(a[..., 3:6].reshape(-1, 3)[0], [1.6, 3.9, 1.56])
    assert set(np.unique(a[..., 6])) == {0.0, np.float32(np.pi / 2)}


def test_generate_anchors_multiclass():
    cfgs = [
        ClassAnchorConfig("Car", (1.6, 3.9, 1.56), (0.4, 0.4, 0.0), (0.2, -39.8, -1.78),
                          matched_threshold=0.6, unmatched_threshold=0.45),
        ClassAnchorConfig("Pedestrian", (0.6, 0.8, 1.73), (0.4, 0.4, 0.0), (0.2, -39.8, -1.465),
                          matched_threshold=0.35, unmatched_threshold=0.2),
    ]
    out = generate_anchors((4, 4), cfgs)
    assert out["anchors"].shape == (4 * 4 * 4, 7)  # 2 classes x 2 rotations
    assert out["matched_threshold"].shape == (64,)
    np.testing.assert_allclose(np.unique(out["matched_threshold"]), [0.35, 0.6])


def test_assign_targets_basic():
    # anchors on a tiny grid, one GT exactly matching an anchor
    anchors = jnp.asarray(
        create_anchors_3d_stride((8, 8), anchor_strides=(1.0, 1.0, 0.0),
                                 anchor_offsets=(0.5, 0.5, -1.0)).reshape(-1, 7)
    )
    gt = jnp.zeros((3, 7)).at[0].set(jnp.array([3.5, 4.5, -1.0, 1.6, 3.9, 1.56, 0.0]))
    gt_classes = jnp.array([1, 0, 0])
    gt_mask = jnp.array([True, False, False])
    m_th = jnp.full((anchors.shape[0],), 0.6)
    u_th = jnp.full((anchors.shape[0],), 0.45)
    out = assign_targets(anchors, gt, gt_classes, gt_mask, m_th, u_th)
    labels = np.asarray(out["labels"])
    assert (labels == 1).sum() >= 1  # the exactly-matching anchor is positive
    assert (labels == 0).sum() > 0  # far anchors are background
    # positive anchors decode back to the GT box
    pos = np.where(labels == 1)[0]
    dec = second_box_decode(out["bbox_targets"][pos], anchors[pos])
    np.testing.assert_allclose(np.asarray(dec), np.tile(np.asarray(gt[0]), (len(pos), 1)), atol=1e-4)
    # reg weights only on positives
    np.testing.assert_array_equal(
        np.asarray(out["reg_weights"]) > 0, labels > 0
    )


def test_assign_targets_force_match():
    """A GT overlapping no anchor above threshold still gets its best anchor."""
    anchors = jnp.asarray(
        create_anchors_3d_stride((6, 6), anchor_strides=(2.0, 2.0, 0.0),
                                 anchor_offsets=(1.0, 1.0, -1.0)).reshape(-1, 7)
    )
    # small offset box with low IoU to every anchor
    gt = jnp.zeros((1, 7)).at[0].set(jnp.array([2.0, 2.0, -1.0, 0.5, 0.5, 1.0, 0.0]))
    out = assign_targets(
        anchors, gt, jnp.array([2]), jnp.array([True]),
        jnp.full((anchors.shape[0],), 0.6), jnp.full((anchors.shape[0],), 0.45),
    )
    labels = np.asarray(out["labels"])
    assert (labels == 2).sum() >= 1


def test_assign_no_gt_all_background():
    anchors = jnp.asarray(
        create_anchors_3d_stride((4, 4)).reshape(-1, 7)
    )
    out = assign_targets(
        anchors, jnp.zeros((2, 7)), jnp.zeros(2, jnp.int32), jnp.zeros(2, bool),
        jnp.full((anchors.shape[0],), 0.6), jnp.full((anchors.shape[0],), 0.45),
    )
    assert np.all(np.asarray(out["labels"]) == 0)


def test_anchors_mask_from_occupancy():
    # pillars present only in one corner of an 8x8 grid
    coords = jnp.array([[0, 1, 1], [0, 2, 1], [-1, -1, -1]])  # (gz,gy,gx)
    anchors_bev = rbbox_to_near_bbox(
        jnp.array(
            [
                [0.3, 0.3, 0.4, 0.4, 0.0],   # over the occupied cells
                [1.5, 1.5, 0.4, 0.4, 0.0],   # empty region
            ]
        )
    )
    mask = anchors_bev_area_mask(
        coords, anchors_bev, (8, 8), (0.2, 0.2, 4.0), (0.0, 0.0, -3.0, 1.6, 1.6, 1.0),
        area_threshold=0.5,
    )
    got = np.asarray(mask)
    assert got[0] and not got[1]


def test_distance_similarity_assignment():
    from minddet_tpu.ops.anchors import assign_targets, distance_similarity

    anchors = jnp.asarray(np.array([
        [0.0, 0.0, 1.6, 3.9, 0.0, 0, 0],
        [1.0, 0.0, 1.6, 3.9, 0.0, 0, 0],
        [8.0, 8.0, 1.6, 3.9, 0.0, 0, 0],
    ], np.float32)[:, [0, 1, 5, 2, 3, 6, 4]])  # -> [x,y,z,w,l,h,yaw]
    gt = jnp.asarray(np.array([[0.2, 0.1, 0.0, 1.6, 3.9, 1.5, 0.0]], np.float32))
    sim = distance_similarity(
        anchors[:, [0, 1, 3, 4, 6]], gt[:, [0, 1, 3, 4, 6]], distance_norm=2.0
    )
    assert float(sim[0, 0]) > float(sim[1, 0]) > float(sim[2, 0])
    out = assign_targets(
        anchors, gt, jnp.array([1], jnp.int32), jnp.array([True]),
        jnp.full(3, 0.8), jnp.full(3, 0.4), None, similarity="distance",
        distance_norm=2.0,
    )
    labels = np.asarray(out["labels"])
    assert labels[0] == 1     # ~0.22 m away: sim ~0.89 > matched 0.8
    assert labels[2] == 0     # far anchor: negative similarity -> background


def test_grid_area_mask_matches_generic():
    """Strided box-filter fast path == per-anchor integral-image queries on
    the production KITTI car layout (496x432 grid, stride-2 anchor grid)."""
    from minddet_tpu.ops.anchors import (
        ClassAnchorConfig,
        generate_anchors,
        make_grid_area_mask,
    )

    grid = (496, 432)
    vs = (0.16, 0.16, 4.0)
    pcr = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    feature_size = (248, 216)
    cfgs = [ClassAnchorConfig(
        name="car", sizes=(1.6, 3.9, 1.56), strides=(0.32, 0.32, 0.0),
        offsets=(0.16, -39.52, -1.78))]
    gen = generate_anchors(feature_size, cfgs)
    anchors_bv = rbbox_to_near_bbox(
        jnp.asarray(gen["anchors"])[:, [0, 1, 3, 4, 6]])

    rs = np.random.RandomState(0)
    n = 600
    coords = np.stack([
        np.zeros(n, np.int64),
        rs.randint(0, grid[0], n),
        rs.randint(0, grid[1], n),
    ], 1)
    coords[-50:] = -1  # padding entries
    coords = jnp.asarray(coords)

    ref = np.asarray(anchors_bev_area_mask(
        coords, anchors_bv, grid, vs, pcr, area_threshold=1.0))
    fn = make_grid_area_mask(grid, vs, pcr, feature_size, cfgs, 1.0)
    assert fn is not None, "production layout must qualify for the fast path"
    got = np.asarray(fn(coords))
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)


def test_grid_area_mask_rejects_irregular_layouts():
    from minddet_tpu.ops.anchors import ClassAnchorConfig, make_grid_area_mask

    base = dict(sizes=(1.6, 3.9, 1.56), offsets=(0.16, -39.52, -1.78))
    bad_stride = [ClassAnchorConfig(name="x", strides=(0.3, 0.32, 0.0), **base)]
    assert make_grid_area_mask((496, 432), (0.16, 0.16, 4.0),
                               (0.0, -39.68, -3.0, 69.12, 39.68, 1.0),
                               (248, 216), bad_stride) is None
    bad_rot = [ClassAnchorConfig(name="x", strides=(0.32, 0.32, 0.0),
                                 rotations=(0.3,), **base)]
    assert make_grid_area_mask((496, 432), (0.16, 0.16, 4.0),
                               (0.0, -39.68, -3.0, 69.12, 39.68, 1.0),
                               (248, 216), bad_rot) is None
