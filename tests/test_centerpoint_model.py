"""CenterPoint: targets, multi-task head shapes, loss grads, predict (tiny)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddet_tpu.models.detectors.centerpoint import CenterPoint
from minddet_tpu.ops.targets import centerpoint_targets_batch
from minddet_tpu.ops.voxelize import voxelize_batch

pytestmark = pytest.mark.slow  # full-model suites; deselect with -m 'not slow'

VS = (0.4, 0.4, 8.0)
PCR = (-6.4, -6.4, -5.0, 6.4, 6.4, 3.0)  # 32x32 grid
NY = NX = 32
OSF = 4  # feature map 8x8
TASKS = (1, 2)
MAXV, MAXP, MAXO = 128, 8, 16


def _targets(gt, cls, mask, ncls):
    return centerpoint_targets_batch(
        gt, cls, mask, (NY // OSF, NX // OSF), ncls, PCR, VS, OSF, 0.1, 1.0, MAXO
    )


@pytest.fixture(scope="module")
def setup():
    model = CenterPoint(
        task_num_classes=TASKS, grid_ny=NY, grid_nx=NX, voxel_size=VS,
        pc_range=PCR, rpn_filters=(32, 64, 128), rpn_up_filters=(32, 32, 32),
        out_size_factor=OSF,
    )
    rng = np.random.RandomState(0)
    b, n = 2, 300
    pts = np.stack(
        [
            rng.uniform(-6, 6, (b, n)),
            rng.uniform(-6, 6, (b, n)),
            rng.uniform(-2, 1, (b, n)),
            rng.uniform(0, 1, (b, n)),
            rng.uniform(0, 0.5, (b, n)),  # 5th feature (sweep dt)
        ],
        axis=-1,
    ).astype(np.float32)
    vox = voxelize_batch(jnp.asarray(pts), jnp.ones((b, n), bool), VS, PCR, MAXV, MAXP)
    variables = model.init(
        jax.random.PRNGKey(0), vox.voxels, vox.num_points, vox.coords
    )
    return model, variables, vox


def _task_targets(b=2):
    rng = np.random.RandomState(1)
    example = {"hm": [], "anno_box": [], "ind": [], "mask": [], "cat": []}
    for ncls in TASKS:
        gt = np.zeros((b, MAXO, 9), np.float32)
        cls = np.zeros((b, MAXO), np.int32)
        mask = np.zeros((b, MAXO), bool)
        for i in range(b):
            gt[i, 0] = [rng.uniform(-4, 4), rng.uniform(-4, 4), -1.0,
                        1.9, 4.5, 1.7, 0.1, -0.2, 0.4]
            cls[i, 0] = rng.randint(0, ncls)
            mask[i, 0] = True
        t = _targets(jnp.asarray(gt), jnp.asarray(cls), jnp.asarray(mask), ncls)
        for k in example:
            example[k].append(t[k])
    return example


def test_targets_shapes_and_peak():
    example = _task_targets()
    assert example["hm"][0].shape == (2, 8, 8, 1)
    assert example["hm"][1].shape == (2, 8, 8, 2)
    assert float(jnp.max(example["hm"][0])) == 1.0
    assert example["anno_box"][0].shape == (2, MAXO, 10)
    # sin^2 + cos^2 = 1 for the valid object
    ab = np.asarray(example["anno_box"][0][0, 0])
    np.testing.assert_allclose(ab[8] ** 2 + ab[9] ** 2, 1.0, atol=1e-5)


def test_forward_shapes(setup):
    model, variables, vox = setup
    preds = model.apply(variables, vox.voxels, vox.num_points, vox.coords)
    assert len(preds) == len(TASKS)
    for t, ncls in enumerate(TASKS):
        assert preds[t]["hm"].shape == (2, 8, 8, ncls)
        assert preds[t]["reg"].shape == (2, 8, 8, 2)
        assert preds[t]["dim"].shape == (2, 8, 8, 3)
        assert preds[t]["vel"].shape == (2, 8, 8, 2)
        assert preds[t]["rot"].shape == (2, 8, 8, 2)
        assert preds[t]["height"].shape == (2, 8, 8, 1)


def test_loss_and_grads(setup):
    model, variables, vox = setup
    example = _task_targets()
    batch = {
        "voxels": vox.voxels, "num_points": vox.num_points, "coords": vox.coords,
        **example,
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
    assert "task0_hm" in parts and "task1_loc" in parts
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)


def test_predict(setup):
    model, variables, vox = setup
    out = model.apply(
        variables, vox.voxels, vox.num_points, vox.coords,
        0.0, 32, 8, 0.2,
        method=model.predict,
    )
    t = len(TASKS)
    assert out["boxes"].shape == (2, t * 8, 9)
    assert out["scores"].shape == (2, t * 8)
    assert out["labels"].shape == (2, t * 8)
    # labels are global (task-offset) class ids in [0, 3) or -1
    lb = np.asarray(out["labels"])
    assert lb.max() < sum(TASKS) and lb.min() >= -1


def test_unflip_task_map_roundtrips_each_axis():
    """Analytic double-flip check: build the map a flipped-world network
    would produce for one object and assert unflip recovers the original."""
    from minddet_tpu.models.detectors.centerpoint import unflip_task_map

    h, w = 8, 6
    iy, ix = 2, 4
    ry, rx = 0.3, 0.7
    s, c = 0.6, 0.8
    vx, vy = 1.5, -2.5

    def maps(iy, ix, rx, ry, s, c, vx, vy):
        # hm localizes the object; the regression maps are filled uniformly
        # (their affine unflip transforms apply to every cell, peak or not)
        z = lambda ch: np.zeros((1, h, w, ch), np.float32)
        hm, hei = z(1), z(1)
        hm[0, iy, ix, 0] = 1.0
        hei[0, iy, ix, 0] = 0.9
        reg = np.broadcast_to(np.float32([rx, ry]), (1, h, w, 2)).copy()
        rot = np.broadcast_to(np.float32([s, c]), (1, h, w, 2)).copy()
        vel = np.broadcast_to(np.float32([vx, vy]), (1, h, w, 2)).copy()
        return {k: jnp.asarray(v) for k, v in
                [("hm", hm), ("reg", reg), ("rot", rot), ("vel", vel),
                 ("height", hei)]}

    orig = maps(iy, ix, rx, ry, s, c, vx, vy)
    cases = [
        # (fx, fy) and the object as seen in that flipped world
        (False, True, maps(h - 1 - iy, ix, rx, 1 - ry, -s, c, vx, -vy)),
        (True, False, maps(iy, w - 1 - ix, 1 - rx, ry, s, -c, -vx, vy)),
        (True, True, maps(h - 1 - iy, w - 1 - ix, 1 - rx, 1 - ry, -s, -c,
                          -vx, -vy)),
    ]
    for fx, fy, flipped in cases:
        back = unflip_task_map(flipped, fx, fy)
        for k in orig:
            np.testing.assert_allclose(
                np.asarray(back[k]), np.asarray(orig[k]), atol=1e-6,
                err_msg=f"key={k} fx={fx} fy={fy}")


def test_predict_tta_double_flip_smoke():
    """TTA path runs fused and returns the same structure as plain predict;
    on the symmetric range the gate accepts, and scores stay finite."""
    model = CenterPoint(
        task_num_classes=TASKS, grid_ny=NY, grid_nx=NX, voxel_size=VS,
        pc_range=PCR, rpn_filters=(32, 64, 128), rpn_up_filters=(32, 32, 32),
        out_size_factor=OSF, max_voxels=MAXV, max_points_per_voxel=MAXP,
    )
    rs = np.random.RandomState(0)
    n = 400
    pts = rs.uniform(-4.9, 4.9, (1, n, 2))
    z = rs.uniform(-2.5, 0.5, (1, n, 1))
    feat = rs.rand(1, n, 2)
    points = jnp.asarray(np.concatenate([pts, z, feat], -1).astype(np.float32))
    mask = jnp.ones((1, n), bool)
    variables = model.init(
        jax.random.PRNGKey(0), points, mask, nms_pre=32, nms_post=8,
        method=model.predict_from_points)
    plain = model.apply(variables, points, mask, nms_pre=32, nms_post=8,
                        method=model.predict_from_points)
    tta = model.apply(variables, points, mask, nms_pre=32, nms_post=8,
                      method=model.predict_tta_double_flip)
    for k in plain:
        assert tta[k].shape == plain[k].shape, k
    assert np.isfinite(np.asarray(tta["scores"])).all()


def test_stream_predict_matches_padded_path():
    """``predict_from_points`` (stream pillar path) must reproduce
    ``predict`` on the padded voxelization of the same cloud: identical
    decoration/PFN/scatter proven at ops level (test_voxelize), this pins
    the detector-level wiring (canvas orientation, caps, head plumbing)."""
    model = CenterPoint(
        task_num_classes=TASKS, grid_ny=NY, grid_nx=NX, voxel_size=VS,
        pc_range=PCR, rpn_filters=(32, 64, 128), rpn_up_filters=(32, 32, 32),
        out_size_factor=OSF, max_voxels=MAXV, max_points_per_voxel=MAXP,
        # the padded comparator (voxelize_batch) drops overflow first-come;
        # MAXV=128 < occupied cells here, so pin the stream path to the same
        # order — sorted-vs-first-come equivalence is test_voxelize's job
        voxel_drop_order="first_come",
    )
    rng = np.random.RandomState(7)
    b, n = 2, 350
    pts = np.stack(
        [
            rng.uniform(-6, 6, (b, n)),
            rng.uniform(-6, 6, (b, n)),
            rng.uniform(-2, 1, (b, n)),
            rng.uniform(0, 1, (b, n)),
            rng.uniform(0, 0.5, (b, n)),
        ],
        axis=-1,
    ).astype(np.float32)
    points = jnp.asarray(pts)
    mask = jnp.asarray(rng.rand(b, n) < 0.9)
    variables = model.init(
        jax.random.PRNGKey(3), points, mask, nms_pre=32, nms_post=8,
        method=model.predict_from_points)

    stream = model.apply(variables, points, mask, 0.0, 32, 8, 0.2,
                         method=model.predict_from_points)
    vox = voxelize_batch(points, mask, VS, PCR, MAXV, MAXP)
    padded = model.apply(variables, vox.voxels, vox.num_points, vox.coords,
                         0.0, 32, 8, 0.2, method=model.predict)

    for k in ("boxes", "scores", "labels"):
        assert stream[k].shape == padded[k].shape, k
    # top-1 per sample must agree exactly (near-tie NMS reorder can permute
    # the tail; the winner is fp-stable at these magnitudes)
    s_s, s_p = np.asarray(stream["scores"]), np.asarray(padded["scores"])
    i_s, i_p = s_s.argmax(1), s_p.argmax(1)
    np.testing.assert_allclose(
        s_s[np.arange(b), i_s], s_p[np.arange(b), i_p], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stream["boxes"])[np.arange(b), i_s],
        np.asarray(padded["boxes"])[np.arange(b), i_p], rtol=1e-3, atol=1e-3)
    assert (np.asarray(stream["labels"])[np.arange(b), i_s]
            == np.asarray(padded["labels"])[np.arange(b), i_p]).all()
    # full score SETS agree to tolerance (order-free comparison)
    np.testing.assert_allclose(np.sort(s_s, 1), np.sort(s_p, 1),
                               rtol=1e-3, atol=1e-4)


def test_sephead_fused_matches_per_branch():
    """fuse_branches is a pure trace-time rewrite: identical outputs,
    batch-stats updates, and parameter gradients vs the per-branch path."""
    from minddet_tpu.models.heads.center_head import CenterHead

    kw = dict(task_num_classes=(1, 2), share_conv_channel=16,
              dtype=jnp.float32)
    head_f = CenterHead(**kw)
    head_u = CenterHead(fuse_branches=False, **kw)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 24), jnp.float32)
    variables = head_u.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        head_f.init(jax.random.PRNGKey(0), x)
    ) == jax.tree_util.tree_structure(variables)

    for train in (False, True):
        out_u, m_u = head_u.apply(variables, x, train=train,
                                  mutable=["batch_stats"])
        out_f, m_f = head_f.apply(variables, x, train=train,
                                  mutable=["batch_stats"])
        for t in range(2):
            assert set(out_f[t]) == set(out_u[t])
            for k in out_u[t]:
                np.testing.assert_allclose(np.asarray(out_f[t][k]),
                                           np.asarray(out_u[t][k]),
                                           atol=2e-5, rtol=2e-5)
        for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_leaves_with_path(m_u),
                jax.tree_util.tree_leaves_with_path(m_f)):
            assert p1 == p2
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-5, rtol=2e-5)

    def loss(head):
        def f(params):
            outs = head.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])[0]
            return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                       for t in outs for o in t.values())
        return f

    g_u = jax.grad(loss(head_u))(variables["params"])
    g_f = jax.grad(loss(head_f))(variables["params"])
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_u),
            jax.tree_util.tree_leaves_with_path(g_f)):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-3, rtol=1e-4)
