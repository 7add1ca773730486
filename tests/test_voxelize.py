"""Voxelizer golden tests against an independent numpy hash-grid reference."""

import jax.numpy as jnp
import numpy as np

from minddet_tpu.ops.voxelize import (
    decorate_pillar_features,
    grid_size,
    voxelize,
    voxelize_batch,
)

VS = (0.16, 0.16, 4.0)
PCR = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)


def _np_voxelize(points, voxel_size, pcr, max_voxels, max_points):
    """Independent reference: dict-based hash grid, first-come order."""
    nx, ny, nz = grid_size(pcr, voxel_size)
    voxels = {}
    order = []
    for p in points:
        g = np.floor((p[:3] - np.array(pcr[:3])) / np.array(voxel_size)).astype(int)
        if not (0 <= g[0] < nx and 0 <= g[1] < ny and 0 <= g[2] < nz):
            continue
        key = (g[2], g[1], g[0])
        if key not in voxels:
            if len(voxels) >= max_voxels:
                continue
            voxels[key] = []
            order.append(key)
        if len(voxels[key]) < max_points:
            voxels[key].append(p)
    return voxels, order


def _rand_points(rng, n=2000):
    pts = np.stack(
        [
            rng.uniform(-5, 75, n),
            rng.uniform(-45, 45, n),
            rng.uniform(-4, 2, n),
            rng.uniform(0, 1, n),
        ],
        axis=-1,
    ).astype(np.float32)
    return pts


def test_voxelize_matches_numpy_reference():
    rng = np.random.RandomState(0)
    pts = _rand_points(rng)
    mask = np.ones(len(pts), bool)
    out = voxelize(jnp.asarray(pts), jnp.asarray(mask), VS, PCR, 16000, 32)
    ref_vox, ref_order = _np_voxelize(pts, VS, PCR, 16000, 32)

    assert int(out.num_voxels) == len(ref_vox)
    coords = np.asarray(out.coords)
    counts = np.asarray(out.num_points)
    voxels = np.asarray(out.voxels)
    got = {}
    for i in range(int(out.num_voxels)):
        key = tuple(coords[i])
        got[key] = voxels[i, : counts[i]]
    assert set(got.keys()) == set(ref_vox.keys())
    for key in ref_vox:
        ref_pts = np.stack(ref_vox[key])
        got_pts = got[key]
        assert got_pts.shape == ref_pts.shape, key
        # same point set (order within voxel = input order in both)
        np.testing.assert_allclose(got_pts, ref_pts, atol=1e-5)


def test_voxelize_respects_max_points():
    # 50 identical points -> one voxel with max_points kept
    pts = np.tile(np.array([[10.0, 0.0, -1.0, 0.5]], np.float32), (50, 1))
    out = voxelize(jnp.asarray(pts), jnp.ones(50, bool), VS, PCR, 100, 32)
    assert int(out.num_voxels) == 1
    assert int(out.num_points[0]) == 32


def test_voxelize_respects_max_voxels():
    rng = np.random.RandomState(1)
    pts = _rand_points(rng, 500)
    out = voxelize(jnp.asarray(pts), jnp.ones(500, bool), VS, PCR, 10, 32)
    assert int(out.num_voxels) <= 10
    assert int(jnp.sum(out.coords[:, 0] >= 0)) <= 10


def test_voxelize_masks_invalid_points():
    pts = np.array(
        [[10.0, 0.0, -1.0, 0.1], [10.0, 0.0, -1.0, 0.2], [200.0, 0.0, 0.0, 0.3]],
        np.float32,
    )
    mask = np.array([True, False, True])  # 2nd masked, 3rd out of range
    out = voxelize(jnp.asarray(pts), jnp.asarray(mask), VS, PCR, 10, 5)
    assert int(out.num_voxels) == 1
    assert int(out.num_points[0]) == 1


def test_heavy_drop_duplicates_are_oob():
    """Stress the unique_indices=True invariant: duplicate (slot, rank)
    scatter pairs exist only among out-of-bounds (dropped) updates. Heavy
    dropping — tiny max_voxels/max_points, many overflow and out-of-range
    points — must still reproduce the numpy reference exactly; a backend that
    applied OOB updates or resolved duplicates differently would diverge."""
    rng = np.random.RandomState(7)
    # 4000 points crammed into a handful of cells: ~50% duplicates of a few
    # centers (rank overflow), ~25% far out of range (tail-slot overflow)
    centers = rng.uniform([0, -10, -2], [20, 10, 0], (6, 3))
    dup = centers[rng.randint(0, 6, 2000)] + rng.normal(0, 0.01, (2000, 3))
    spread = np.stack([rng.uniform(-5, 75, 1000), rng.uniform(-45, 45, 1000),
                       rng.uniform(-4, 2, 1000)], -1)
    oob = np.stack([rng.uniform(100, 300, 1000), rng.uniform(50, 90, 1000),
                    rng.uniform(5, 9, 1000)], -1)
    xyz = np.concatenate([dup, spread, oob]).astype(np.float32)
    pts = np.concatenate([xyz, rng.rand(4000, 1).astype(np.float32)], -1)
    perm = rng.permutation(4000)
    pts = pts[perm]
    out = voxelize(jnp.asarray(pts), jnp.ones(4000, bool), VS, PCR, 32, 4)
    ref_vox, _ = _np_voxelize(pts, VS, PCR, 32, 4)
    coords = np.asarray(out.coords)
    counts = np.asarray(out.num_points)
    voxels = np.asarray(out.voxels)
    assert int(out.num_voxels) == len(ref_vox)
    got = {tuple(coords[i]): voxels[i, : counts[i]]
           for i in range(int(out.num_voxels))}
    assert set(got) == set(ref_vox)
    for key, ref_pts in ref_vox.items():
        np.testing.assert_allclose(got[key], np.stack(ref_pts), atol=1e-5)


def test_voxelize_batch_shapes():
    rng = np.random.RandomState(2)
    pts = np.stack([_rand_points(rng, 300) for _ in range(4)])
    mask = np.ones((4, 300), bool)
    out = voxelize_batch(jnp.asarray(pts), jnp.asarray(mask), VS, PCR, 1000, 16)
    assert out.voxels.shape == (4, 1000, 16, 4)
    assert out.coords.shape == (4, 1000, 3)
    assert out.num_points.shape == (4, 1000)


import pytest


@pytest.mark.parametrize("filters", [(16,), (16, 16)])
def test_stream_path_matches_dense_canvas(filters):
    """The stream pillar path (sorted stream -> PFN -> one canvas scatter)
    must reproduce the dense path (voxels tensor -> PFN -> scatter) exactly:
    same decoration, same masked-BN statistics, same per-pillar max, same
    cell placement. The two-layer case exercises the non-last concat-back
    (CenterPoint's two-PFN flavor)."""
    import jax

    from minddet_tpu.models.readers.pillar_encoder import (
        PillarFeatureNet,
        PointPillarsScatter,
    )
    from minddet_tpu.ops.voxelize import voxelize_stream_batch

    rng = np.random.RandomState(11)
    b, n = 2, 600
    pts = np.stack([_rand_points(rng, n) for _ in range(b)])
    mask = rng.rand(b, n) < 0.9
    vs, pcr = (0.32, 0.32, 4.0), (0.0, -6.4, -3.0, 12.8, 6.4, 1.0)
    nx, ny, _ = grid_size(pcr, vs)
    mv, mp = 300, 8

    pfn = PillarFeatureNet(num_filters=filters, masked_bn=True)
    scat = PointPillarsScatter(ny=ny, nx=nx)

    # dense path
    from minddet_tpu.ops.voxelize import decorate_pillar_features

    vox = voxelize_batch(jnp.asarray(pts), jnp.asarray(mask), vs, pcr, mv, mp)
    feats_d = decorate_pillar_features(
        vox.voxels, vox.num_points, vox.coords, vs, pcr)
    variables = pfn.init(jax.random.PRNGKey(0), feats_d, vox.num_points,
                         train=True)
    pill_d, _ = pfn.apply(variables, feats_d, vox.num_points, train=True,
                          mutable=["batch_stats"])
    canvas_d = scat.apply({}, pill_d, vox.coords)

    # stream path with the SAME params
    sv = voxelize_stream_batch(jnp.asarray(pts), jnp.asarray(mask), vs, pcr,
                               mv, mp)
    h, updated = pfn.apply(variables, sv.feats, sv.keep, sv.first, sv.last,
                           train=True, bound=mp,
                           mutable=["batch_stats"], method=pfn.stream)

    def scatter_one(rows_i, idx_i):
        flat = jnp.zeros((ny * nx + 1, rows_i.shape[-1]), rows_i.dtype)
        return flat.at[idx_i].set(rows_i, mode="drop",
                                  unique_indices=True)[:-1]

    canvas_s = jax.vmap(scatter_one)(h, sv.canvas_idx).reshape(b, ny, nx, -1)
    np.testing.assert_allclose(np.asarray(canvas_s), np.asarray(canvas_d),
                               rtol=2e-4, atol=2e-4)
    # batch stats must match too (identical valid-point statistics)
    _, updated_d = pfn.apply(variables, feats_d, vox.num_points, train=True,
                             mutable=["batch_stats"])
    for va, vb in zip(jax.tree_util.tree_leaves(updated),
                      jax.tree_util.tree_leaves(updated_d)):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-4, atol=1e-5)


def test_decorate_features():
    rng = np.random.RandomState(3)
    pts = _rand_points(rng, 200)
    out = voxelize(jnp.asarray(pts), jnp.ones(200, bool), VS, PCR, 500, 8)
    feats = decorate_pillar_features(
        out.voxels[None], out.num_points[None], out.coords[None], VS, PCR
    )
    # 4 raw + 3 cluster offsets + 2 center offsets (xy only, reference layout)
    assert feats.shape == (1, 500, 8, 9)
    f = np.asarray(feats)[0]
    counts = np.asarray(out.num_points)
    # padded slots must be exactly zero
    for v in range(500):
        np.testing.assert_array_equal(f[v, counts[v]:], 0.0)
    # cluster offsets sum to ~0 over the points of each pillar
    v0 = int(np.argmax(counts))
    c = counts[v0]
    np.testing.assert_allclose(f[v0, :c, 4:7].sum(axis=0), 0.0, atol=1e-3)


def test_bounded_seg_ops_match_bruteforce():
    """Distance-bounded segmented scan/broadcast: exact at every row within
    ``bound`` of its segment head (resp. last-kept row), including segments
    LONGER than the bound (exactly the voxelizer's overflow shape)."""
    from minddet_tpu.ops.voxelize import (
        _seg_bcast_bounded,
        _seg_sum_bounded,
        seg_running_max,
    )

    rng = np.random.RandomState(17)
    n, c, bound = 400, 5, 8
    # random segment layout incl. runs longer than bound
    first = np.zeros(n, bool)
    first[0] = True
    i = 0
    while i < n:
        step = rng.randint(1, 20)  # some segments exceed bound=8
        i += step
        if i < n:
            first[i] = True
    x = rng.randn(n, c).astype(np.float32)

    seg_id = np.cumsum(first) - 1
    run_max = np.empty_like(x)
    run_sum = np.empty_like(x)
    for s in range(seg_id.max() + 1):
        idx = np.where(seg_id == s)[0]
        run_max[idx] = np.maximum.accumulate(x[idx], axis=0)
        run_sum[idx] = np.cumsum(x[idx], axis=0)

    got_max = np.asarray(seg_running_max(jnp.asarray(first), jnp.asarray(x),
                                         bound=bound))
    got_sum = np.asarray(_seg_sum_bounded(jnp.asarray(first), jnp.asarray(x),
                                          bound))
    # rows within `bound` of their segment head must be exact
    pos_in_seg = np.arange(n) - np.maximum.accumulate(
        np.where(first, np.arange(n), -1))
    ok = pos_in_seg < bound
    assert ok.sum() > n // 2
    np.testing.assert_allclose(got_max[ok], run_max[ok], rtol=1e-6)
    np.testing.assert_allclose(got_sum[ok], run_sum[ok], rtol=1e-5, atol=1e-5)

    # broadcast: value at a flagged row reaches the <=bound-1 preceding rows
    sel = np.zeros(n, bool)
    sel[np.where(first)[0][1:] - 1] = True  # segment-end rows
    sel[-1] = True
    vals = rng.randn(n, c).astype(np.float32)
    got_b = np.asarray(_seg_bcast_bounded(jnp.asarray(sel), jnp.asarray(vals),
                                          bound))
    nxt = np.full(n, -1)
    j = -1
    for i in range(n - 1, -1, -1):
        if sel[i]:
            j = i
        nxt[i] = j
    for i in range(n):
        if nxt[i] >= 0 and nxt[i] - i < bound:
            np.testing.assert_allclose(got_b[i], vals[nxt[i]], rtol=1e-6)

    # unbounded path unchanged (scan fallback)
    got_unb = np.asarray(seg_running_max(jnp.asarray(first), jnp.asarray(x)))
    np.testing.assert_allclose(got_unb, run_max, rtol=1e-6)


def test_stream_sorted_drop_order_matches_when_no_overflow():
    """drop_order="sorted" (TPU default in the detectors: one sort, sorted
    scatter/gather hints) differs from "first_come" ONLY in which pillars
    drop past max_voxels; with capacity for every pillar the resulting
    canvas is identical. Exercises the real consumer contract of each mode:
    first_come scatters last rows by sentinel-masked ids, sorted
    scatter-ADDs last-masked rows at per-row ascending ids
    (scatter_stream_canvas_sorted, incl. its custom VJP's sorted gather)."""
    import jax

    from minddet_tpu.ops.voxelize import (
        scatter_stream_canvas_sorted,
        seg_running_max,
        voxelize_stream_batch,
    )

    rng = np.random.RandomState(7)
    b, n = 2, 500
    pts = np.stack([_rand_points(rng, n) for _ in range(b)])
    mask = rng.rand(b, n) < 0.9
    vs, pcr = (0.32, 0.32, 4.0), (0.0, -6.4, -3.0, 12.8, 6.4, 1.0)
    nx, ny, _ = grid_size(pcr, vs)

    def canvas(drop_order):
        def build(pts_in):
            sv = voxelize_stream_batch(pts_in, jnp.asarray(mask),
                                       vs, pcr, 2000, 6, drop_order)
            red = jax.vmap(lambda f, x: seg_running_max(f, x, bound=6))(
                sv.first, sv.feats)
            if drop_order == "sorted":
                red = red * sv.last[..., None].astype(red.dtype)
                return scatter_stream_canvas_sorted(
                    red, sv.canvas_idx, ny * nx)

            def one(rows_i, idx_i):
                flat = jnp.zeros((ny * nx + 1, rows_i.shape[-1]),
                                 rows_i.dtype)
                return flat.at[idx_i].set(
                    rows_i, mode="drop", unique_indices=True)[:-1]

            return jax.vmap(one)(red, sv.canvas_idx)

        out = build(jnp.asarray(pts))
        # drive the custom VJP too: d(sum(canvas^2))/d(points) must agree
        g = jax.grad(lambda p: jnp.sum(build(p) ** 2))(jnp.asarray(pts))
        return np.asarray(out), np.asarray(g)

    c_s, g_s = canvas("sorted")
    c_f, g_f = canvas("first_come")
    np.testing.assert_allclose(c_s, c_f, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(g_s, g_f, rtol=1e-5, atol=1e-5)


def test_stream_sorted_drop_order_overflow_keeps_lowest_ids():
    """Past max_voxels, sorted mode keeps the lowest cell ids (first_come
    keeps first-appearance order — the reference numba semantic), and the
    sorted mode's per-row canvas_idx comes out NONDECREASING (the
    indices_are_sorted contract of scatter_stream_canvas_sorted)."""
    from minddet_tpu.ops.voxelize import voxelize_stream

    vs, pcr = (1.0, 1.0, 4.0), (0.0, 0.0, -3.0, 8.0, 8.0, 1.0)
    nx, ny, _ = grid_size(pcr, vs)
    # three pillars appearing in order: cell ids 50, 3, 20
    pts = np.array([[2.5, 6.5, 0.0, 1.0],   # gy=6, gx=2 -> 50
                    [3.5, 0.5, 0.0, 1.0],   # gy=0, gx=3 -> 3
                    [4.5, 2.5, 0.0, 1.0]],  # gy=2, gx=4 -> 20
                   np.float32)
    mask = np.ones(3, bool)

    sv_s = voxelize_stream(jnp.asarray(pts), jnp.asarray(mask), vs, pcr,
                           2, 4, "sorted")
    kept_s = sorted(int(i) for i, l in zip(np.asarray(sv_s.canvas_idx),
                                           np.asarray(sv_s.last)) if l)
    assert kept_s == [3, 20]  # lowest ids survive
    idx_s = [int(i) for i in np.asarray(sv_s.canvas_idx)]
    assert idx_s == sorted(idx_s)  # nondecreasing, sentinels in the tail

    sv_f = voxelize_stream(jnp.asarray(pts), jnp.asarray(mask), vs, pcr,
                           2, 4, "first_come")
    kept_f = sorted(int(i) for i, l in zip(np.asarray(sv_f.canvas_idx),
                                           np.asarray(sv_f.last)) if l)
    assert kept_f == [3, 50]  # first-appearance order survives


def test_compact_scatter_matches_sorted_scatter():
    """scatter_stream_canvas_compact (gather last rows to max_voxels slots,
    then scatter V rows) must reproduce scatter_stream_canvas_sorted
    (scatter-ADD all N last-masked rows) exactly, forward AND through the
    custom VJPs — including under max_voxels overflow, where empty tail
    slots must contribute nothing. Also drives the unsorted-cells variant
    (the detectors' space-to-depth remap)."""
    import jax

    from minddet_tpu.ops.voxelize import (
        compact_stream_indices,
        scatter_stream_canvas_compact,
        scatter_stream_canvas_sorted,
        seg_running_max,
        voxelize_stream_batch,
    )

    rng = np.random.RandomState(11)
    b, n = 2, 500
    pts = np.stack([_rand_points(rng, n) for _ in range(b)])
    mask = rng.rand(b, n) < 0.9
    vs, pcr = (0.32, 0.32, 4.0), (0.0, -6.4, -3.0, 12.8, 6.4, 1.0)
    nx, ny, _ = grid_size(pcr, vs)
    cells = ny * nx

    for max_voxels in (2000, 100):  # no-overflow and heavy-overflow
        def build(pts_in, mode):
            sv = voxelize_stream_batch(pts_in, jnp.asarray(mask),
                                       vs, pcr, max_voxels, 6, "sorted")
            red = jax.vmap(lambda f, x: seg_running_max(f, x, bound=6))(
                sv.first, sv.feats)
            if mode == "sorted":
                masked = red * sv.last[..., None].astype(red.dtype)
                return scatter_stream_canvas_sorted(
                    masked, sv.canvas_idx, cells)
            slotsrc, cellid = jax.vmap(
                lambda f, l, c: compact_stream_indices(
                    f, l, c, max_voxels, cells)
            )(sv.first, sv.last, sv.canvas_idx)
            if mode == "compact_remap":
                # permute cells like the s2d remap does (not monotone);
                # compare against the same permutation of the reference
                y, x_ = cellid // nx, cellid % nx
                rid = ((y // 2) * (nx // 2) + x_ // 2) * 4 + (
                    (y % 2) * 2 + x_ % 2)
                cellid = jnp.where(cellid < cells, rid, cells)
                return scatter_stream_canvas_compact(
                    red, slotsrc, cellid, cells, sorted_cells=False)
            return scatter_stream_canvas_compact(
                red, slotsrc, cellid, cells)

        outs, grads = {}, {}
        for mode in ("sorted", "compact", "compact_remap"):
            outs[mode] = np.asarray(build(jnp.asarray(pts), mode))
            grads[mode] = np.asarray(jax.grad(
                lambda p, m=mode: jnp.sum(build(p, m) ** 2))(jnp.asarray(pts)))

        np.testing.assert_array_equal(outs["sorted"], outs["compact"])
        np.testing.assert_allclose(grads["sorted"], grads["compact"],
                                   rtol=1e-6, atol=1e-6)
        # the remapped variant is a permutation of rows: same multiset of
        # values, identical grads (sum-of-squares is permutation-invariant)
        np.testing.assert_array_equal(
            np.sort(outs["compact"].reshape(b, -1), axis=1),
            np.sort(outs["compact_remap"].reshape(b, -1), axis=1))
        np.testing.assert_allclose(grads["compact"], grads["compact_remap"],
                                   rtol=1e-6, atol=1e-6)
