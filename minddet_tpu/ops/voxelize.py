"""Device-side point-cloud voxelization with static shapes.

The reference voxelizes on the host with numba hash-grid kernels
(``pointpillars/src/core/point_cloud/point_cloud_ops.py:20-114``,
``centerpoint/det3d_ms/ops/point_cloud/point_cloud_ops.py:6-180``) — a
per-sample python/JIT loop in the input pipeline. Here the same contract
(max_voxels / max_points_per_voxel caps, first-come-first-kept points) runs as
one sorted-scatter XLA program on device, so voxelization fuses into the
jitted train step and the host only ships raw padded points.

Algorithm (per sample, vmapped over batch):
  1. grid index per point; invalid/ out-of-range points get id = +inf-ish.
  2. stable-sort point order by voxel id (keeps first-come point priority).
  3. first-occurrence flags -> cumsum = voxel slot per point (capped).
  4. rank of each point inside its voxel via a forward-fill of the first
     occurrence position.
  5. scatter points to (max_voxels, max_points, F), coords, counts.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class VoxelizeOutput(NamedTuple):
    voxels: jnp.ndarray      # (max_voxels, max_points, F)
    num_points: jnp.ndarray  # (max_voxels,) int32
    coords: jnp.ndarray      # (max_voxels, 3) int32 [gz, gy, gx], -1 = empty
    num_voxels: jnp.ndarray  # () int32


def grid_size(point_cloud_range: Sequence[float], voxel_size: Sequence[float]) -> Tuple[int, int, int]:
    """(nx, ny, nz) from range/size, rounded like the reference."""
    import numpy as np

    pcr = np.asarray(point_cloud_range, np.float64)
    vs = np.asarray(voxel_size, np.float64)
    g = np.round((pcr[3:] - pcr[:3]) / vs).astype(int)
    return int(g[0]), int(g[1]), int(g[2])


@functools.partial(
    jax.jit,
    static_argnames=("voxel_size", "point_cloud_range", "max_voxels", "max_points"),
)
def voxelize(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    voxel_size: Tuple[float, float, float],
    point_cloud_range: Tuple[float, float, float, float, float, float],
    max_voxels: int = 16000,
    max_points: int = 32,
) -> VoxelizeOutput:
    """points (N, F>=3) with validity mask (N,) -> pillars/voxels.

    Matches ``points_to_voxel``'s reverse-index behavior: coords are
    (gz, gy, gx) and the first ``max_points`` points per voxel (in input
    order) are kept; voxels beyond ``max_voxels`` are dropped in
    first-appearance order.
    """
    n, f = points.shape
    vs = jnp.asarray(voxel_size, jnp.float32)
    pcr = jnp.asarray(point_cloud_range, jnp.float32)
    nx, ny, nz = grid_size(point_cloud_range, voxel_size)

    g = jnp.floor((points[:, :3] - pcr[:3]) / vs).astype(jnp.int32)  # (N, 3) gx,gy,gz
    in_range = (
        (g[:, 0] >= 0) & (g[:, 0] < nx)
        & (g[:, 1] >= 0) & (g[:, 1] < ny)
        & (g[:, 2] >= 0) & (g[:, 2] < nz)
        & points_mask.astype(bool)
    )
    vid = (g[:, 2] * ny + g[:, 1]) * nx + g[:, 0]
    big = nx * ny * nz + 1
    vid = jnp.where(in_range, vid, big)

    # Stable sort keeps input order within a voxel (first-come priority).
    # PERF: the payload (point features + grid coords + original index)
    # rides INSIDE multi-operand lax.sort instead of being gathered with
    # points[order] afterwards — XLA lowers an (N, F) gather to a ~165 ns/row
    # dynamic-slice loop (3.5 ms at KITTI scale, round-3 xplane trace), while
    # extra sort operands move through the on-chip sort network for ~free.
    pos = jnp.arange(n, dtype=jnp.int32)
    pcols = tuple(points[:, i] for i in range(f))
    gcols = (g[:, 0], g[:, 1], g[:, 2])
    sorted1 = jax.lax.sort(
        (vid, pos) + pcols + gcols, num_keys=1, is_stable=True
    )
    svid, order = sorted1[0], sorted1[1]

    first = jnp.concatenate(
        [jnp.ones((1,), bool), svid[1:] != svid[:-1]]
    ) & (svid < big)
    # Voxel slots must follow FIRST-APPEARANCE order (the reference's numba
    # hash grid keeps the first max_voxels voxels it encounters in point
    # order, point_cloud_ops.py:20-114) — not ascending voxel id. Forward-
    # fill each voxel's first point's ORIGINAL index (stable sort => the
    # group head carries the minimal original index) with a segment-ffill
    # scan (gather-free), then re-sort the groups by that key: ties (same
    # voxel) keep their order, groups get first-come order. Invalid points
    # are keyed to n so they stay in the tail.
    def _ffill(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)

    _, firstidx = jax.lax.associative_scan(
        _ffill, (first, jnp.where(first, order, 0))
    )
    firstidx = jnp.where(svid < big, firstidx, n)
    sorted2 = jax.lax.sort(
        (firstidx, svid) + sorted1[2:], num_keys=1, is_stable=True
    )
    svid = sorted2[1]
    spoints = jnp.stack(sorted2[2 : 2 + f], axis=-1)
    sgx, sgy, sgz = sorted2[2 + f : 2 + f + 3]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), svid[1:] != svid[:-1]]
    ) & (svid < big)
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1  # voxel slot per sorted point
    # forward-fill position of each voxel's first point -> rank inside voxel
    first_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, pos, -1)
    )
    rank = pos - first_pos

    keep = (svid < big) & (slot < max_voxels) & (rank < max_points)
    # dropped points keep their (nondecreasing) slot and get an out-of-bounds
    # rank, so mode="drop" discards them while the index sequence stays
    # lexicographically sorted and the surviving pairs are unique — the hints
    # keep XLA from emitting the conflict-resolving scatter lowering.
    # INVARIANT (load-bearing for unique_indices=True): duplicate (slot, rank)
    # pairs exist ONLY among updates that are out of bounds — overflow points
    # share rank==max_points per slot and out-of-range points share the tail
    # slot — and XLA discards OOB updates before uniqueness matters. A backend
    # that applied OOB updates or reordered the drop would corrupt voxels;
    # tests/test_voxelize.py::test_heavy_drop_duplicates_are_oob pins this.
    rank_c = jnp.where(keep, rank, max_points)

    voxels = jnp.zeros((max_voxels + 1, max_points, f), points.dtype)
    voxels = voxels.at[slot, rank_c].set(
        spoints, mode="drop", indices_are_sorted=True,
        unique_indices=True,
    )

    counts = jnp.zeros((max_voxels + 1,), jnp.int32)
    counts = counts.at[slot].add(
        keep.astype(jnp.int32), mode="drop", indices_are_sorted=True
    )

    coords_full = jnp.stack([sgz, sgy, sgx], axis=-1)  # gz, gy, gx
    coords = jnp.full((max_voxels + 1, 3), -1, jnp.int32)
    coords = coords.at[jnp.where(first & keep, slot, max_voxels + 1)].set(
        coords_full, mode="drop"
    )
    num_voxels = jnp.minimum(jnp.max(slot) + 1, max_voxels).astype(jnp.int32)
    return VoxelizeOutput(
        voxels[:max_voxels], counts[:max_voxels], coords[:max_voxels], num_voxels
    )


voxelize_batch = jax.vmap(voxelize, in_axes=(0, 0, None, None, None, None))


# ---------------------------------------------------------------------------
# Stream voxelization: per-point sorted stream + segmented-scan decoration,
# skipping the padded (V, P, F) voxels tensor entirely. The round-3 xplane
# trace showed the voxels scatter costs ~46 ns/row (3.4 ms/step at KITTI
# scale) and the PFN then computes on 512k mostly-padded rows; the stream
# path feeds the PFN the ~18k real points directly and scatters ONCE (the
# finished pillar features straight onto the canvas).
# ---------------------------------------------------------------------------


class StreamVoxels(NamedTuple):
    feats: jnp.ndarray       # (N, F + 5) decorated, zeroed where ~keep
    keep: jnp.ndarray        # (N,) point kept (valid, slot/rank in caps)
    first: jnp.ndarray       # (N,) kept-group head flags (segment starts)
    last: jnp.ndarray        # (N,) group's LAST KEPT row (rank == count-1)
    canvas_idx: jnp.ndarray  # (N,) gy*nx+gx at each group's last KEPT row, else OOB
    num_voxels: jnp.ndarray  # () int32


def _shift(x: jnp.ndarray, d: int, axis: int, fill) -> jnp.ndarray:
    """Shift ``x`` by ``d`` along ``axis`` (positive = toward higher index),
    filling vacated rows with ``fill``. Static slice + pad — fuses cleanly."""
    n = x.shape[axis]
    if d > 0:
        kept = jax.lax.slice_in_dim(x, 0, n - d, axis=axis)
        pad_idx, at_start = d, True
    else:
        kept = jax.lax.slice_in_dim(x, -d, n, axis=axis)
        pad_idx, at_start = -d, False
    pad_shape = list(x.shape)
    pad_shape[axis] = pad_idx
    pad = jnp.full(pad_shape, fill, x.dtype)
    parts = (pad, kept) if at_start else (kept, pad)
    return jnp.concatenate(parts, axis=axis)


def _seg_scan_bounded(comb_v, identity, first, x, bound: int, axis: int = 0,
                      reverse: bool = False):
    """Segmented inclusive scan truncated at distance ``bound``: exact for
    every row within ``bound`` rows of its segment head (reverse: tail).

    Hillis–Steele with static shifts — ceil(log2(bound)) fused
    shift+select levels instead of the full-length associative_scan's
    ~log2(N) materialized slice/pad/concat levels (the round-3 xplane trace
    billed those at ~5.7 ms/step at KITTI scale). Rows further than
    ``bound`` from their segment head get partial values; callers must only
    consume rows inside the bound (the voxelizer's per-pillar point cap
    guarantees this for kept rows)."""
    f = first
    if x.ndim == f.ndim + 1:
        f = f[..., None]
    v = x
    d = 1
    sgn = -1 if reverse else 1
    while d < bound:
        fs = _shift(f, sgn * d, axis, True)
        vs = _shift(v, sgn * d, axis, identity)
        v = jnp.where(f, v, comb_v(vs, v))
        f = f | fs
        d *= 2
    return v


def _seg_bcast_bounded(sel, vals, bound: int, axis: int = 0):
    """Broadcast each segment's value at its ``sel``-flagged row BACKWARD to
    the ≤``bound`` preceding rows (first-flag-in-window semantics). Rows with
    no flagged row within ``bound`` ahead get garbage — callers must mask."""
    f = sel
    if vals.ndim == f.ndim + 1:
        f = f[..., None]
    v = jnp.where(f, vals, jnp.zeros_like(vals))
    d = 1
    while d < bound:
        fs = _shift(f, -d, axis, False)
        vs = _shift(v, -d, axis, 0)
        v = jnp.where(f, v, vs)
        f = f | fs
        d *= 2
    return v


def _seg_sum_bounded(first, x, bound: int, axis: int = 0):
    """Bounded-distance segmented cumsum (see ``_seg_scan_bounded``)."""
    return _seg_scan_bounded(jnp.add, 0, first, x, bound, axis)


def seg_running_max(first: jnp.ndarray, x: jnp.ndarray, axis: int = 0,
                    bound: int | None = None):
    """Inclusive segmented running max: resets where ``first``; at each
    segment's last KEPT row the value is the full segment maximum. Used by
    the stream PFN to reduce per-point features into pillar features.

    With ``bound`` (the voxelizer's per-pillar point cap): exact only for
    rows within ``bound`` of their segment head — which covers every KEPT
    row, at ceil(log2(bound)) fused levels instead of log2(N)."""
    if bound is not None:
        neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) \
            else jnp.iinfo(x.dtype).min
        return _seg_scan_bounded(jnp.maximum, neg, first, x, bound, axis)

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.maximum(va, vb))

    f = first[..., None] if x.ndim == first.ndim + 1 else first
    _, out = jax.lax.associative_scan(comb, (f, x), axis=axis)
    return out


def _windowed_running_max(x: jnp.ndarray, bound: int) -> jnp.ndarray:
    """Running max over (at least) the trailing ``bound`` elements: k
    doubling shift+max levels cover a 2^k window. Exact running max for any
    element whose true argmax lies within the window; elements further out
    see the window max only."""
    v = x
    d = 1
    while d < bound:
        v = jnp.maximum(v, _shift(v, d, 0, x.dtype.type(-1)))
        d *= 2
    return v


def voxelize_stream(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    voxel_size: Tuple[float, float, float],
    point_cloud_range: Tuple[float, float, float, float, float, float],
    max_voxels: int = 16000,
    max_points: int = 32,
    drop_order: str = "first_come",
) -> StreamVoxels:
    """points (N, F) + mask -> decorated per-point stream (no voxel padding).

    Same keep semantics as ``voxelize`` (first-come voxels/points, caps) and
    the same 9/10-feature decoration as ``decorate_pillar_features`` — the
    consumer runs the PFN on the stream and segment-maxes into pillars.
    ``canvas_idx`` carries each group's BEV linear index at its LAST row
    (where a segmented running max holds the complete pillar feature) and is
    out of bounds everywhere else, so one `.at[canvas_idx].set` scatter of
    the finished features builds the pseudo-image.

    ``drop_order`` picks which pillars drop when more than ``max_voxels``
    cells are occupied (nothing else depends on it):
      - "first_come": reference-exact (numba ``points_to_voxel`` keeps the
        first ``max_voxels`` voxels in point order) — needs a second sort of
        the whole stream by each group's first-appearance index.
      - "sorted": keep the ``max_voxels`` lowest cell ids. ONE sort with
        fewer ride-along operands (grid coords recomputed from the sorted
        cell id), and ``canvas_idx`` comes out ASCENDING, so the consumer's
        canvas scatter (and its transpose gather in backward) can carry
        ``indices_are_sorted=True`` — measured 3.3 ms/step cheaper at
        nuScenes scale (120k pts, tools/microbench_scatter.py). The TPU
        detectors default to this; pass "first_come" for bit-parity with
        reference overflow behavior.
    """
    n, f = points.shape
    vs = jnp.asarray(voxel_size, jnp.float32)
    pcr = jnp.asarray(point_cloud_range, jnp.float32)
    nx, ny, nz = grid_size(point_cloud_range, voxel_size)

    g = jnp.floor((points[:, :3] - pcr[:3]) / vs).astype(jnp.int32)
    in_range = (
        (g[:, 0] >= 0) & (g[:, 0] < nx)
        & (g[:, 1] >= 0) & (g[:, 1] < ny)
        & (g[:, 2] >= 0) & (g[:, 2] < nz)
        & points_mask.astype(bool)
    )
    vid = (g[:, 2] * ny + g[:, 1]) * nx + g[:, 0]
    big = nx * ny * nz + 1
    vid = jnp.where(in_range, vid, big)

    pos = jnp.arange(n, dtype=jnp.int32)
    pcols = tuple(points[:, i] for i in range(f))
    if drop_order == "sorted":
        # one sort; gx/gy recomputed from the sorted cell id instead of
        # riding through the sort network (2 fewer of 9 operands), valid
        # wherever svid < big — downstream already masks invalid rows
        sorted1 = jax.lax.sort((vid,) + pcols, num_keys=1, is_stable=True)
        svid = sorted1[0]
        spoints = jnp.stack(sorted1[1 : 1 + f], axis=-1)
        safe = jnp.minimum(svid, big - 1)
        sgx = safe % nx
        sgy = (safe // nx) % ny
    else:
        sorted1 = jax.lax.sort(
            (vid, pos) + pcols + (g[:, 0], g[:, 1]), num_keys=1,
            is_stable=True,
        )
        svid, order = sorted1[0], sorted1[1]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), svid[1:] != svid[:-1]]
        ) & (svid < big)
        _, firstidx = jax.lax.associative_scan(
            lambda a, b: (a[0] | b[0], jnp.where(b[0], b[1], a[1])),
            (first, jnp.where(first, order, 0)),
        )
        firstidx = jnp.where(svid < big, firstidx, n)
        sorted2 = jax.lax.sort(
            (firstidx, svid) + sorted1[2:], num_keys=1, is_stable=True
        )
        svid = sorted2[1]
        spoints = jnp.stack(sorted2[2 : 2 + f], axis=-1)
        sgx, sgy = sorted2[2 + f], sorted2[3 + f]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), svid[1:] != svid[:-1]]
    ) & (svid < big)
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1
    # bounded running max suffices for ranks: a row within ``max_points`` of
    # its group head sees the head's position exactly (kept rows all do);
    # rows further out see -1 or a window max — either way rank comes out
    # >= max_points and the row is dropped, which is the correct outcome
    first_pos = _windowed_running_max(
        jnp.where(first, pos, -1), max_points)
    rank = pos - first_pos
    keep = (svid < big) & (slot < max_voxels) & (rank < max_points)

    # each group's LAST KEPT row: kept rows are the group's first
    # min(count, max_points) rows (stable sort + rank), so the segment
    # between `first` and `last` spans at most max_points rows — every
    # segmented op below can run DISTANCE-BOUNDED (log2(max_points) fused
    # shift levels instead of log2(N) materialized scan levels)
    ends = jnp.concatenate([svid[1:] != svid[:-1], jnp.ones((1,), bool)])
    last = keep & (ends | (rank == max_points - 1))

    # decoration on the stream (cluster mean over KEPT points, pillar center)
    kf = keep.astype(jnp.float32)
    xyz = spoints[:, :3] * kf[:, None]
    total_xyz = _seg_bcast_bounded(
        last, _seg_sum_bounded(first, xyz, max_points), max_points)
    count = jnp.maximum(
        _seg_bcast_bounded(
            last, _seg_sum_bounded(first, kf, max_points), max_points),
        1.0)
    cluster = spoints[:, :3] - total_xyz / count[:, None]
    cx = sgx.astype(jnp.float32) * vs[0] + (vs[0] / 2 + pcr[0])
    cy = sgy.astype(jnp.float32) * vs[1] + (vs[1] / 2 + pcr[1])
    center = spoints[:, :2] - jnp.stack([cx, cy], -1)
    feats = jnp.concatenate([spoints, cluster, center], axis=-1)
    feats = feats * kf[:, None]

    lin = sgy * nx + sgx
    if drop_order == "sorted":
        # per-ROW cell id, genuinely NONDECREASING (rows are sorted by cell
        # id and invalid rows sort to the tail where they get the sentinel):
        # consumers scatter-ADD rows masked to zero except each group's last
        # via :func:`scatter_stream_canvas_sorted`, so both the scatter and
        # its backward gather can carry indices_are_sorted=True. A
        # last-row-only sentinel index (the first_come form) would NOT be
        # sorted — the sentinel interleaves between groups.
        canvas_idx = jnp.where(svid < big, lin, ny * nx)
    else:
        canvas_idx = jnp.where(last, lin, ny * nx)
    num_voxels = jnp.minimum(jnp.max(slot) + 1, max_voxels).astype(jnp.int32)
    return StreamVoxels(feats, keep, first, last, canvas_idx, num_voxels)


def voxelize_stream_batch(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    voxel_size: Tuple[float, float, float],
    point_cloud_range: Tuple[float, float, float, float, float, float],
    max_voxels: int = 16000,
    max_points: int = 32,
    drop_order: str = "first_come",
) -> StreamVoxels:
    """Batched :func:`voxelize_stream` (vmap over the leading axis)."""
    return jax.vmap(
        lambda p, m: voxelize_stream(p, m, voxel_size, point_cloud_range,
                                     max_voxels, max_points, drop_order)
    )(points, points_mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def scatter_stream_canvas_sorted(rows: jnp.ndarray, idx: jnp.ndarray,
                                 num_cells: int) -> jnp.ndarray:
    """(B, N, C) rows + NONDECREASING per-row cell ids -> (B, num_cells, C).

    The drop_order="sorted" canvas builder: ``idx`` is each row's cell id
    (sentinel ``num_cells`` only in the invalid tail — the voxelize_stream
    sorted contract) and ``rows`` must be zeroed everywhere except each
    group's LAST kept row, so the scatter-ADD of a whole group lands exactly
    that row's (complete segmented-max) value. The custom VJP exists because
    the stock scatter-add transpose drops ``indices_are_sorted`` from its
    gather — here both directions carry the hint (worth ~3.3 ms/step at
    nuScenes scale, tools/microbench_scatter.py).
    """
    def one(r, i):
        flat = jnp.zeros((num_cells, r.shape[-1]), r.dtype)
        return flat.at[i].add(r, mode="drop", indices_are_sorted=True)
    return jax.vmap(one)(rows, idx)


def _scatter_sorted_fwd(rows, idx, num_cells):
    return scatter_stream_canvas_sorted(rows, idx, num_cells), idx


def _scatter_sorted_bwd(num_cells, idx, g):
    def one(gi, ii):
        return gi.at[ii].get(mode="fill", fill_value=0,
                             indices_are_sorted=True)
    return jax.vmap(one)(g, idx), None


scatter_stream_canvas_sorted.defvjp(_scatter_sorted_fwd, _scatter_sorted_bwd)


def compact_stream_indices(
    first: jnp.ndarray,
    last: jnp.ndarray,
    canvas_idx: jnp.ndarray,
    max_voxels: int,
    num_cells: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-slot (source row, cell id) for the compacted canvas scatter.

    Pure integer plumbing (one 1-channel scatter over the stream + two tiny
    gathers) so the C-channel heavy lifting in
    :func:`scatter_stream_canvas_compact` touches only ``max_voxels`` rows
    instead of the whole N-point stream. Contract: the sorted drop order
    (groups in ascending cell-id order, so slot ids are allocated
    ascending and ``canvas_idx`` is nondecreasing).

    Returns ``slotsrc`` (V,) int32 — the stream row holding each slot's last
    kept point, ``n`` (= stream length) for empty slots, ascending — and
    ``cellid`` (V,) int32 — each slot's canvas cell, ``num_cells`` sentinel
    for empty slots, ascending.
    """
    n = first.shape[0]
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1
    pos = jnp.arange(n, dtype=jnp.int32)
    # Last rows carry distinct slots 0..K-1 in stream order, so compaction
    # is ONE 3-operand sort (key = slot-if-last) + a slice. The scatter
    # formulation (.at[tgt].set over the stream) lowers to a ~4.6 ns/row
    # serial loop on TPU — 4.4 ms/step at nuScenes bs=8, plus another
    # 1.8 ms for the 1-wide cellid gather the sort's payload gets for free
    # (r4 trace, docs/STATUS.md).
    key = jnp.where(last, slot, max_voxels)
    skey, spos, slin = jax.lax.sort((key, pos, canvas_idx), num_keys=1,
                                    is_stable=True)
    take = min(n, max_voxels)
    got = skey[:take] < max_voxels
    slotsrc = jnp.where(got, spos[:take], n)
    cellid = jnp.where(got, slin[:take], num_cells)
    if take < max_voxels:  # shorter stream than the voxel cap: pad empties
        pad = (0, max_voxels - take)
        slotsrc = jnp.pad(slotsrc, pad, constant_values=n)
        cellid = jnp.pad(cellid, pad, constant_values=num_cells)
    return slotsrc, cellid


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def scatter_stream_canvas_compact(
    rows: jnp.ndarray,
    slotsrc: jnp.ndarray,
    cellid: jnp.ndarray,
    num_cells: int,
    sorted_cells: bool = True,
) -> jnp.ndarray:
    """(B, N, C) stream rows -> (B, num_cells, C) canvas via a compacted
    (B, V, C) intermediate, V = max_voxels.

    With N >> max_voxels (nuScenes: 120k points -> 30k pillars) the heavy
    C-channel scatter and — through the custom VJP — its backward gather run
    over V rows instead of N: gather each slot's finished pillar row at
    ``slotsrc`` (ascending -> sorted gather), then scatter-SET the V rows at
    ``cellid`` (unique by construction; ascending unless the caller remapped
    cells, e.g. to the space-to-depth layout — pass ``sorted_cells=False``
    then). Indices come from :func:`compact_stream_indices`; ``rows`` needs
    NO last-row masking (non-last rows are never read), unlike
    :func:`scatter_stream_canvas_sorted`.
    """
    def one(r, src, cid):
        sel = r.at[src].get(mode="fill", fill_value=0,
                            indices_are_sorted=True)
        flat = jnp.zeros((num_cells, r.shape[-1]), r.dtype)
        return flat.at[cid].set(sel, mode="drop", unique_indices=True,
                                indices_are_sorted=sorted_cells)
    return jax.vmap(one)(rows, slotsrc, cellid)


def _scatter_compact_fwd(rows, slotsrc, cellid, num_cells, sorted_cells):
    out = scatter_stream_canvas_compact(rows, slotsrc, cellid, num_cells,
                                        sorted_cells)
    return out, (slotsrc, cellid, rows.shape[1])


def _scatter_compact_bwd(num_cells, sorted_cells, res, g):
    slotsrc, cellid, n = res

    def one(gi, src, cid):
        gsel = gi.at[cid].get(mode="fill", fill_value=0,
                              indices_are_sorted=sorted_cells)
        grows = jnp.zeros((n, gi.shape[-1]), gi.dtype)
        # src is ascending with the empty-slot sentinel n in the tail;
        # duplicates exist only among dropped (sentinel) updates
        return grows.at[src].add(gsel, mode="drop", unique_indices=True,
                                 indices_are_sorted=True)
    return jax.vmap(one)(g, slotsrc, cellid), None, None


scatter_stream_canvas_compact.defvjp(_scatter_compact_fwd,
                                     _scatter_compact_bwd)


def decorate_pillar_features(
    voxels: jnp.ndarray,
    num_points: jnp.ndarray,
    coords: jnp.ndarray,
    voxel_size: Sequence[float],
    point_cloud_range: Sequence[float],
    with_distance: bool = False,
) -> jnp.ndarray:
    """Append cluster-offset and center-offset channels (4 -> 9 features).

    Mirrors ``PillarFeatureNet.construct``'s decoration
    (``pointpillars/src/pointpillars.py:226-320``): per-point offsets from the
    pillar's point mean (f_cluster, xyz) and from the pillar's geometric
    center (f_center, xy ONLY — matching the reference keeps the PFN input
    layout 1:1 convertible from reference checkpoints; a z center offset
    would be a constant shift anyway since pillars span the full z range),
    with empty slots re-zeroed.
    """
    b, v, p, f = voxels.shape
    vs = jnp.asarray(voxel_size, jnp.float32)
    pcr = jnp.asarray(point_cloud_range, jnp.float32)

    npts = jnp.maximum(num_points, 1).astype(jnp.float32)[..., None, None]
    points_mean = jnp.sum(voxels[..., :3], axis=2, keepdims=True) / npts
    f_cluster = voxels[..., :3] - points_mean

    # coords are (gz, gy, gx)
    centers = jnp.stack(
        [
            coords[..., 2].astype(jnp.float32) * vs[0] + (vs[0] / 2 + pcr[0]),
            coords[..., 1].astype(jnp.float32) * vs[1] + (vs[1] / 2 + pcr[1]),
        ],
        axis=-1,
    )  # (B, V, 2)
    f_center = voxels[..., :2] - centers[:, :, None, :]

    feats = [voxels, f_cluster, f_center]
    if with_distance:
        feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
    out = jnp.concatenate(feats, axis=-1)

    point_mask = (
        jnp.arange(p)[None, None, :] < num_points[..., None]
    ).astype(out.dtype)
    return out * point_mask[..., None]
