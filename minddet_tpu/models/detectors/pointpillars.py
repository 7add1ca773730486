"""PointPillars (SECOND-style) 3D detector, end-to-end on device.

Rebuild of ``pointpillars/src/pointpillars.py`` (912 LoC) as one Flax module:
PFN -> scatter -> SECOND RPN -> 1x1 anchor heads, with the SECOND loss
(sigmoid focal + sin-encoded smooth-L1 + direction softmax,
``pointpillars.py:19-178, 793-871``) and an on-device predict path (decode +
score mask + top-k + rotated BEV NMS) replacing the host-side
``post_processing``/``predict.py`` loop. Voxelization and target assignment
are ops (``ops.voxelize``, ``ops.anchors``) that fuse into the same jitted
step — the reference runs those per-sample in numba on the host.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.models.losses import (
    sigmoid_focal_loss,
    weighted_smooth_l1,
    weighted_softmax_ce,
)
from minddet_tpu.models.necks.second_rpn import (
    SECONDRPN,
    depth_to_space,
    space_to_depth,
)
from minddet_tpu.models.readers.pillar_encoder import (
    PillarFeatureNet,
    PointPillarsScatter,
)
from minddet_tpu.ops.anchors import (
    ClassAnchorConfig,
    anchors_bev_area_mask,
    make_grid_area_mask,
    assign_targets_batch,
    generate_anchors,
)
from minddet_tpu.ops.box import limit_period, rbbox_to_near_bbox, second_box_decode
from minddet_tpu.parallel.mesh import constrain
from minddet_tpu.ops.nms import rotated_nms
from minddet_tpu.ops.voxelize import (
    decorate_pillar_features,
    compact_stream_indices,
    scatter_stream_canvas_compact,
    scatter_stream_canvas_sorted,
    voxelize_batch,
    voxelize_stream_batch,
)


def add_sin_difference(preds: jnp.ndarray, targets: jnp.ndarray):
    """sin(a-b) trick on the yaw channel (pointpillars.py:101-107).

    PERF NOTE (r4, measured): leave the slice+concat form alone. A
    "fused" where()-on-iota blend over the full (..., 7) tensors looked
    cheaper on paper (no minor-dim concat) but measured 70.7 vs 89.3
    samples/s end-to-end: the loss tensors' minor dim is 7, so keeping the
    head layout runs every elementwise op at 7/128 lane occupancy — the
    anchor-minor transposes XLA inserts around THIS concat are what buy the
    loss chain full lanes."""
    rad_p = jnp.sin(preds[..., -1:]) * jnp.cos(targets[..., -1:])
    rad_t = jnp.cos(preds[..., -1:]) * jnp.sin(targets[..., -1:])
    return (
        jnp.concatenate([preds[..., :-1], rad_p], axis=-1),
        jnp.concatenate([targets[..., :-1], rad_t], axis=-1),
    )


def get_direction_target(anchors: jnp.ndarray, reg_targets: jnp.ndarray) -> jnp.ndarray:
    """One-hot (.., 2) direction bins: rot_gt > 0 (pointpillars.py:142-163)."""
    rot_gt = reg_targets[..., -1] + anchors[..., -1]
    return jax.nn.one_hot((rot_gt > 0).astype(jnp.int32), 2)


def prepare_loss_weights(
    labels: jnp.ndarray, pos_cls_weight: float = 1.0, neg_cls_weight: float = 1.0
):
    """Per-anchor cls/reg weights normalized by positives (pointpillars.py:19-43)."""
    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (
        negatives.astype(jnp.float32) * neg_cls_weight
        + positives.astype(jnp.float32) * pos_cls_weight
    )
    reg_weights = positives.astype(jnp.float32)
    pos_norm = jnp.clip(
        jnp.sum(positives.astype(jnp.float32), axis=1, keepdims=True), 1.0, None
    )
    return cls_weights / pos_norm, reg_weights / pos_norm, cared


@DETECTORS.register_module()
class PointPillars(nn.Module):
    """Config mirrors ``configs/car_xyres16.yaml:63-110``."""

    num_classes: int = 1
    grid_ny: int = 496
    grid_nx: int = 432
    voxel_size: Tuple[float, float, float] = (0.16, 0.16, 4.0)
    pc_range: Tuple[float, ...] = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    pfn_filters: Sequence[int] = (64,)
    rpn_layer_nums: Sequence[int] = (3, 5, 5)
    rpn_strides: Sequence[int] = (2, 2, 2)
    rpn_filters: Sequence[int] = (64, 128, 256)
    rpn_up_strides: Sequence[int] = (1, 2, 4)
    rpn_up_filters: Sequence[int] = (128, 128, 128)
    num_anchor_per_loc: int = 2
    box_code_size: int = 7
    use_direction_classifier: bool = True
    # loss weights (car_xyres16.yaml:82-101)
    cls_weight: float = 1.0
    loc_weight: float = 2.0
    dir_weight: float = 0.2
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    smooth_l1_sigma: float = 3.0
    # anchor spec, one row per class (car_xyres16.yaml:115-131); drives the
    # on-device voxelize + anchor-mask + assign path of ``loss_from_gt``
    anchor_sizes: Sequence[Tuple[float, float, float]] = ((1.6, 3.9, 1.56),)
    anchor_strides: Sequence[Tuple[float, float, float]] = ((0.32, 0.32, 0.0),)
    anchor_offsets: Sequence[Tuple[float, float, float]] = ((0.16, -39.52, -1.78),)
    matched_thresholds: Sequence[float] = (0.6,)
    unmatched_thresholds: Sequence[float] = (0.45,)
    max_voxels: int = 16000
    max_points_per_voxel: int = 32
    anchor_area_threshold: float = 1.0
    # scatter the canvas straight into space_to_depth layout and run block0
    # as the equivalent 2x2 conv (see SECONDRPN.input_space_to_depth) — the
    # VERDICT-r3 RPN data-formatting lever, checkpoint-compatible, A/B'd by
    # flipping this flag
    rpn_space_to_depth: bool = False
    # trade: scanned inner RPN blocks compile a smaller executable; unrolled
    # blocks avoid the scan's per-layer residual stacking (late-r4 chip
    # sweep at bs=8: 161.4 / 178.5 / 191.5 / 191.6 samples/s at scan-min
    # 2 / 4 / 6 / full-unroll) — default unrolls the big-activation blocks
    # 0+1 and keeps block2 scanned for executable size
    rpn_scan_inner: bool = True
    # unroll blocks shallower than this even when scanning (see
    # SECONDRPN.scan_min_layers)
    rpn_scan_min_layers: int = 6
    # store scanned RPN blocks' params pre-stacked (no per-step restack /
    # grad unstack; checkpoint layout changes — see
    # second_rpn.stack_inner_variables)
    rpn_stacked_params: bool = False
    # overflow drop order of the in-step voxelizer: "sorted" keeps the
    # max_voxels lowest cell ids (one sort instead of two, sorted
    # scatter/gather hints on the plain layout); "first_come" is
    # reference-bit-exact under overflow (ops/voxelize.py docstring)
    voxel_drop_order: str = "sorted"
    # multi-chip spatial sharding of the BEV canvas: a PartitionSpec tuple
    # for (batch, canvas rows, ...), e.g. ("data", "model") on a data x model
    # mesh — XLA partitions the RPN convs spatially with halo exchanges.
    # None (default) leaves placement to the caller (pure DP / single chip).
    bev_shard_spec: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        self.reader = PillarFeatureNet(
            num_filters=self.pfn_filters, dtype=self.dtype
        )
        self.scatter = PointPillarsScatter(ny=self.grid_ny, nx=self.grid_nx)
        self.rpn = SECONDRPN(
            layer_nums=self.rpn_layer_nums,
            layer_strides=self.rpn_strides,
            num_filters=self.rpn_filters,
            upsample_strides=self.rpn_up_strides,
            num_upsample_filters=self.rpn_up_filters,
            input_space_to_depth=self.rpn_space_to_depth,
            scan_inner=self.rpn_scan_inner,
            scan_min_layers=self.rpn_scan_min_layers,
            stacked_inner=self.rpn_stacked_params,
            dtype=self.dtype,
        )
        a = self.num_anchor_per_loc
        self.conv_cls = nn.Conv(a * self.num_classes, (1, 1), dtype=self.dtype)
        self.conv_box = nn.Conv(a * self.box_code_size, (1, 1), dtype=self.dtype)
        if self.use_direction_classifier:
            self.conv_dir = nn.Conv(a * 2, (1, 1), dtype=self.dtype)

    def __call__(
        self,
        voxels: jnp.ndarray,
        num_points: jnp.ndarray,
        coords: jnp.ndarray,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Raw voxels (B, V, P, 4) -> flat per-anchor predictions."""
        feats = decorate_pillar_features(
            voxels, num_points, coords, self.voxel_size, self.pc_range
        )
        pillars = self.reader(feats, num_points, train=train)  # (B, V, C)
        canvas = self.scatter(pillars, coords)  # (B, ny, nx, C)
        return self._preds_from_canvas(canvas, train)

    def _canvas_from_points(self, points, points_mask, train: bool):
        """Stream path: sorted point stream -> PFN -> ONE canvas scatter.

        Skips the padded (V, P, F) voxels tensor and its scatter entirely
        (round-3 trace: ~46 ns/row, 3.4 ms/step at KITTI scale) and runs the
        PFN on the ~N real points instead of V*P mostly-padded rows. Returns
        (canvas, occupancy) — occupancy rides as an extra scattered channel
        so the anchor-area mask needs no second scatter."""
        sv = voxelize_stream_batch(
            points, points_mask, tuple(self.voxel_size), tuple(self.pc_range),
            self.max_voxels, self.max_points_per_voxel,
            self.voxel_drop_order,
        )
        h = self.reader.stream(sv.feats, sv.keep, sv.first, sv.last,
                               train=train, bound=self.max_points_per_voxel)
        ones = jnp.ones(h.shape[:2] + (1,), h.dtype)
        rows = jnp.concatenate([h, ones], axis=-1)  # (B, N, C+1)

        cells = self.grid_ny * self.grid_nx
        idx = sv.canvas_idx
        compact = (self.voxel_drop_order == "sorted"
                   and points.shape[1] >= 2 * self.max_voxels)
        if compact:
            # compacted scatter (see CenterPoint._preds_from_points_stream):
            # the heavy 65-channel scatter + backward gather run over
            # max_voxels slot rows instead of the whole point stream. Only
            # pays when the stream is much longer than the pillar cap
            # (measured -4% at KITTI's 18k pts -> 16k pillars, +1% at
            # nuScenes' 120k -> 30k), hence the 2x gate. Occupancy rides as
            # the 65th channel either way.
            slotsrc, cellid = jax.vmap(
                lambda f, l, c: compact_stream_indices(
                    f, l, c, self.max_voxels, cells)
            )(sv.first, sv.last, idx)
            if self.rpn_space_to_depth:
                y, x_ = cellid // self.grid_nx, cellid % self.grid_nx
                s2d_id = ((y // 2) * (self.grid_nx // 2) + x_ // 2) * 4 + (
                    (y % 2) * 2 + x_ % 2)
                cellid = jnp.where(cellid < cells, s2d_id, cells)
            flat = scatter_stream_canvas_compact(
                rows, slotsrc, cellid, cells,
                sorted_cells=not self.rpn_space_to_depth)
        elif (self.voxel_drop_order == "sorted"
              and not self.rpn_space_to_depth):
            # sorted contract: idx is the PER-ROW cell id, nondecreasing;
            # rows masked to each group's last kept row scatter-ADD so both
            # the scatter and its backward gather ride the sorted-indices
            # hint (ops/voxelize.py:scatter_stream_canvas_sorted). Occupancy
            # still rides as the 65th channel (a separate 64-channel scatter
            # compiles a ~5x slower kernel, round-3 trace).
            rows = rows * sv.last[..., None].astype(rows.dtype)
            flat = scatter_stream_canvas_sorted(rows, idx, cells)
        else:
            if self.voxel_drop_order == "sorted":
                # sorted mode carries per-row ids; the .set scatter below
                # needs the sentinel-except-last form
                idx = jnp.where(sv.last, idx, cells)
            if self.rpn_space_to_depth:
                # scatter STRAIGHT into space_to_depth layout: pillar (y, x)
                # -> flat row block*(4) + sub, so the reshape to
                # (ny/2, nx/2, 4*(C+1)) is free (row order == (block, sub)).
                # The OOB sentinel ny*nx maps to itself (y=ny even -> block
                # (ny/2)*(nx/2), sub 0). The remap is not monotone, so the
                # sorted-scatter fast path does not apply here.
                y, x_ = idx // self.grid_nx, idx % self.grid_nx
                idx = ((y // 2) * (self.grid_nx // 2) + x_ // 2) * 4 + (
                    (y % 2) * 2 + x_ % 2)

            def scatter_one(rows_i, idx_i):
                flat = jnp.zeros((cells, rows_i.shape[-1]), rows_i.dtype)
                # idx is the OOB sentinel (ny*nx) everywhere but each
                # group's last KEPT row -> duplicates exist only among
                # dropped updates (the voxelize invariant), so
                # unique_indices is genuinely true. Occupancy rides as the
                # 65th channel of THIS scatter: a separate 64-channel
                # feature scatter compiles to a 5x slower kernel layout
                # than the combined 65-wide one (round-3 trace: 5.1 ms vs
                # 1.1 ms), dwarfing the cost of slicing the channel back
                # off the canvas.
                return flat.at[idx_i].set(rows_i, mode="drop",
                                          unique_indices=True)

            flat = jax.vmap(scatter_one)(rows, idx)
        b = rows.shape[0]
        # occupancy = the ones channel, extracted as a LANE-DENSE reduction
        # against a one-hot (reads the canvas on full lanes) instead of a
        # minor-dim slice (r4 trace: the 1-of-65 dynamic-slice ran at
        # 4.9 GB/s, ~2 ms/step at bs=8). The canvas itself feeds the RPN
        # UNSLICED — block0's kernel zero-extends over the throwaway channel
        # (SECONDRPN), so the 64-of-65 slice copy disappears too; init still
        # slices so the parameter shapes stay canonical.
        onehot = jnp.zeros((flat.shape[-1],), flat.dtype).at[-1].set(1)
        if self.rpn_space_to_depth:
            sub = flat.reshape(b, self.grid_ny // 2, self.grid_nx // 2, 4, -1)
            if self.is_initializing():
                canvas = sub[..., :-1].reshape(
                    b, self.grid_ny // 2, self.grid_nx // 2, -1)  # (.., 4C)
            else:
                canvas = flat.reshape(
                    b, self.grid_ny // 2, self.grid_nx // 2, -1)  # (.., 4C+4)
            occ_sub = jnp.einsum("bhwsc,c->bhws", sub, onehot)
            occ = depth_to_space(occ_sub)[..., 0]  # (B, h2, w2, 4*1) -> full
            return canvas, occ.astype(jnp.float32)
        full = flat.reshape(b, self.grid_ny, self.grid_nx, -1)
        canvas = full[..., :-1] if self.is_initializing() else full
        occ = jnp.einsum("bhwc,c->bhw", full, onehot)
        return canvas, occ.astype(jnp.float32)

    def _preds_from_canvas(self, canvas, train: bool, cast_f32: bool = True):
        """``cast_f32=False`` (the fused train path) keeps the head outputs
        in the compute dtype: the loss helpers cast to f32 themselves inside
        their elementwise+reduce fusions, so the materialized (B, A, C)
        copies stay bf16 — half the bytes, and the standalone
        convert_element_type passes (r4 trace: ~2.9 ms/step at bs=8)
        disappear. predict/eval paths keep f32 outputs."""
        b = canvas.shape[0]
        if self.rpn_space_to_depth and canvas.shape[1] == self.grid_ny:
            # dense-path canvases arrive at full resolution; the stream path
            # already scatters into the s2d layout
            canvas = space_to_depth(canvas)
        canvas = constrain(canvas, self.bev_shard_spec)
        x = self.rpn(canvas, train=train)  # (B, ny/2, nx/2, 384)

        if self.is_initializing():
            # init path: call the real submodules so params materialize under
            # their own scopes (conv_cls/conv_box/conv_dir — the names the
            # checkpoint rename tables target, utils/convert.py)
            box = self.conv_box(x).reshape(b, -1, self.box_code_size)
            cls = self.conv_cls(x).reshape(b, -1, self.num_classes)
            out = {"box_preds": box.astype(jnp.float32),
                   "cls_preds": cls.astype(jnp.float32)}
            if self.use_direction_classifier:
                out["dir_preds"] = self.conv_dir(x).reshape(b, -1, 2).astype(jnp.float32)
            return out
        # PERF: one fused 1x1 conv over the 384-channel canvas instead of
        # three — the heads are HBM-bound, and three separate convs read the
        # (B, ny/2, nx/2, 384) activation three times in forward AND three
        # times in each backward pass (round-3 xplane trace: conv_box alone
        # 2.3 ms/step). Kernels are concatenated at trace time from the
        # unchanged per-head parameters, so checkpoints are unaffected.
        a = self.num_anchor_per_loc
        heads = [self.conv_cls, self.conv_box]
        widths = [a * self.num_classes, a * self.box_code_size]
        if self.use_direction_classifier:
            heads.append(self.conv_dir)
            widths.append(a * 2)
        k = jnp.concatenate(
            [h.variables["params"]["kernel"] for h in heads], axis=-1
        ).astype(self.dtype)
        bias = jnp.concatenate(
            [h.variables["params"]["bias"] for h in heads]
        ).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        c0 = widths[0]
        dt = jnp.float32 if cast_f32 else y.dtype
        cls = y[..., :c0].reshape(b, -1, self.num_classes)
        box = y[..., c0 : c0 + widths[1]].reshape(b, -1, self.box_code_size)
        out = {"box_preds": box.astype(dt), "cls_preds": cls.astype(dt)}
        if self.use_direction_classifier:
            out["dir_preds"] = (
                y[..., c0 + widths[1] :].reshape(b, -1, 2).astype(dt)
            )
        return out

    def anchor_layout(self):
        """(feature_size, configs) at the RPN output stride (out_size_factor
        = layer_strides[0] // upsample_strides[0], reference
        dataset_builder.py:38-41)."""
        factor = self.rpn_strides[0] // self.rpn_up_strides[0]
        feature_size = (self.grid_ny // factor, self.grid_nx // factor)
        configs = [
            ClassAnchorConfig(
                name=str(i), sizes=tuple(s), strides=tuple(st),
                offsets=tuple(off), matched_threshold=mt,
                unmatched_threshold=ut,
            )
            for i, (s, st, off, mt, ut) in enumerate(
                zip(self.anchor_sizes, self.anchor_strides,
                    self.anchor_offsets, self.matched_thresholds,
                    self.unmatched_thresholds)
            )
        ]
        return feature_size, configs

    def anchor_set(self) -> Dict[str, jnp.ndarray]:
        """Static per-config anchor grid + thresholds."""
        feature_size, configs = self.anchor_layout()
        gen = generate_anchors(feature_size, configs)
        return {k: jnp.asarray(v) for k, v in gen.items()}

    def loss_from_gt(
        self, batch: Dict[str, jnp.ndarray], train: bool = True
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Raw-points batch -> loss: device voxelize + BEV-occupancy anchor
        mask + IoU target assignment fused into the jitted train step (the
        reference runs all three per-sample in host numba,
        ``prep_pointcloud`` preprocess.py:176-248).

        batch: points (B, N, 4) padded, points_mask (B, N), gt_boxes
        (B, G, 7), gt_classes (B, G) 1-based, gt_mask (B, G). The batch may
        also carry "anchors"/"matched_threshold"/"unmatched_threshold" (from
        ``anchor_set()`` computed once on the host): passing them as runtime
        inputs keeps the ~1 MB/100k-anchor grids (and whatever XLA
        constant-folds out of them) out of the serialized executable, whose
        load over the axon tunnel costs ~10 s/MB (docs/STATUS.md).
        """
        gen = {k: batch[k] for k in
               ("anchors", "matched_threshold", "unmatched_threshold")
               } if "anchors" in batch else self.anchor_set()
        anchors = gen["anchors"]
        # regular-grid fast path: strided box-filters instead of the
        # 4-gathers-per-anchor integral-image queries (ops/anchors.py)
        feature_size, configs = self.anchor_layout()
        grid_fn = make_grid_area_mask(
            (self.grid_ny, self.grid_nx), self.voxel_size, self.pc_range,
            feature_size, configs, self.anchor_area_threshold,
        )
        if grid_fn is not None:
            # stream path: no padded voxels tensor; occupancy comes out of
            # the canvas scatter itself
            canvas, occ = self._canvas_from_points(
                batch["points"], batch["points_mask"], train)
            amask = jax.vmap(grid_fn.from_occ)(occ)
            preds = self._preds_from_canvas(canvas, train, cast_f32=False)
        else:  # irregular anchor layout: legacy dense path (needs coords)
            vox = voxelize_batch(
                batch["points"], batch["points_mask"], tuple(self.voxel_size),
                tuple(self.pc_range), self.max_voxels,
                self.max_points_per_voxel,
            )
            anchors_bv = rbbox_to_near_bbox(anchors[:, [0, 1, 3, 4, 6]])
            amask = jax.vmap(
                lambda c: anchors_bev_area_mask(
                    c, anchors_bv, (self.grid_ny, self.grid_nx),
                    self.voxel_size, self.pc_range,
                    self.anchor_area_threshold,
                )
            )(vox.coords)
            preds = self(vox.voxels, vox.num_points, vox.coords, train=train)
        t = assign_targets_batch(
            anchors, batch["gt_boxes"], batch["gt_classes"],
            batch["gt_mask"], gen["matched_threshold"],
            gen["unmatched_threshold"], amask,
        )
        return self._loss_from_preds(
            preds, anchors, t["labels"], t["bbox_targets"])

    def loss(
        self, batch: Dict[str, jnp.ndarray], train: bool = True
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """batch: voxels, num_points, coords, anchors (A, 7), labels (B, A),
        reg_targets (B, A, 7). Targets come from ``ops.anchors.assign_targets``
        (device) or the offline pipeline."""
        preds = self(batch["voxels"], batch["num_points"], batch["coords"], train=train)
        return self._loss_from_preds(
            preds, batch["anchors"], batch["labels"], batch["reg_targets"])

    def _loss_from_preds(
        self, preds, anchors_static, labels, reg_targets
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        anchors = jnp.broadcast_to(
            anchors_static[None], (labels.shape[0],) + anchors_static.shape
        )
        batch_size = labels.shape[0]

        cls_weights, reg_weights, cared = prepare_loss_weights(labels)
        cls_targets = jnp.where(cared, labels, 0)
        one_hot = jax.nn.one_hot(cls_targets, self.num_classes + 1)[..., 1:]

        # preds may arrive in the compute dtype (cast_f32=False above); the
        # f32 casts here fuse into the loss elementwise chains
        box_preds, reg_t = add_sin_difference(
            preds["box_preds"].astype(jnp.float32), reg_targets)
        loc_loss = weighted_smooth_l1(
            box_preds, reg_t, weights=reg_weights, sigma=self.smooth_l1_sigma
        )
        loc_loss_red = jnp.sum(loc_loss) / batch_size * self.loc_weight

        cls_loss = sigmoid_focal_loss(
            preds["cls_preds"].astype(jnp.float32), one_hot,
            weights=cls_weights,
            gamma=self.focal_gamma, alpha=self.focal_alpha,
        )
        cls_loss_red = jnp.sum(cls_loss) / batch_size * self.cls_weight

        total = loc_loss_red + cls_loss_red
        parts = {"loc_loss": loc_loss_red, "cls_loss": cls_loss_red}
        if self.use_direction_classifier:
            dir_targets = get_direction_target(anchors, reg_targets)
            w = (labels > 0).astype(jnp.float32)
            w = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1.0, None)
            dir_loss = weighted_softmax_ce(preds["dir_preds"], dir_targets, weights=w)
            dir_loss_red = jnp.sum(dir_loss) / batch_size * self.dir_weight
            total = total + dir_loss_red
            parts["dir_loss"] = dir_loss_red
        return total, parts

    def predict(
        self,
        voxels: jnp.ndarray,
        num_points: jnp.ndarray,
        coords: jnp.ndarray,
        anchors: jnp.ndarray,
        anchors_mask: jnp.ndarray = None,
        score_threshold: float = 0.09,
        nms_pre: int = 900,
        nms_post: int = 300,
        nms_iou: float = 0.1,
    ) -> Dict[str, jnp.ndarray]:
        """Decode + top-k + rotated BEV NMS, all on device.

        Returns padded (B, nms_post) boxes7/scores/labels with score 0 padding
        (cf. the reference's host loop ``post_processing``,
        pointpillars.py:767-791, nms config car_xyres16.yaml:104-108).
        """
        preds = self(voxels, num_points, coords, train=False)
        return self._predict_from_preds(
            preds, anchors, anchors_mask, score_threshold, nms_pre,
            nms_post, nms_iou,
        )

    def _predict_from_preds(
        self, preds, anchors, anchors_mask, score_threshold, nms_pre,
        nms_post, nms_iou,
    ) -> Dict[str, jnp.ndarray]:
        scores_all = jax.nn.sigmoid(preds["cls_preds"])  # (B, A, C)
        nms_pre = min(nms_pre, scores_all.shape[1])
        nms_post = min(nms_post, nms_pre)
        top_scores = jnp.max(scores_all, axis=-1)
        top_labels = jnp.argmax(scores_all, axis=-1)
        if anchors_mask is not None:
            top_scores = jnp.where(anchors_mask, top_scores, 0.0)

        def per_sample(box_p, dir_p, sc, lb):
            k_scores, k_idx = jax.lax.top_k(sc, nms_pre)
            boxes = second_box_decode(box_p[k_idx], anchors[k_idx])
            if self.use_direction_classifier:
                dir_lab = jnp.argmax(dir_p[k_idx], axis=-1)
                flip = (boxes[..., 6] > 0) != (dir_lab == 1)
                rot = jnp.where(flip, boxes[..., 6] + jnp.pi, boxes[..., 6])
                boxes = boxes.at[..., 6].set(limit_period(rot, 0.5, 2 * jnp.pi))
            bev = boxes[:, [0, 1, 3, 4, 6]]
            keep_idx, _ = rotated_nms(
                bev, k_scores, iou_threshold=nms_iou,
                score_threshold=score_threshold, max_outputs=nms_post,
            )
            sel = jnp.clip(keep_idx, 0, nms_pre - 1)
            valid = keep_idx >= 0
            return (
                jnp.where(valid[:, None], boxes[sel], 0.0),
                jnp.where(valid, k_scores[sel], 0.0),
                jnp.where(valid, lb[k_idx][sel], -1),
            )

        dir_preds = preds.get("dir_preds", jnp.zeros_like(preds["box_preds"][..., :2]))
        boxes, scores, labels = jax.vmap(per_sample)(
            preds["box_preds"], dir_preds, top_scores, top_labels
        )
        return {"boxes": boxes, "scores": scores, "labels": labels}

    def predict_from_points(
        self,
        points: jnp.ndarray,
        points_mask: jnp.ndarray,
        score_threshold: float = 0.09,
        nms_pre: int = 900,
        nms_post: int = 300,
        nms_iou: float = 0.1,
    ) -> Dict[str, jnp.ndarray]:
        """Raw padded points -> detections: the whole inference program
        (voxelize + PFN + RPN + decode + rotated NMS) as ONE device function,
        using the module's own anchor spec and BEV-occupancy anchor mask."""
        gen = self.anchor_set()
        feature_size, configs = self.anchor_layout()
        grid_fn = make_grid_area_mask(
            (self.grid_ny, self.grid_nx), self.voxel_size, self.pc_range,
            feature_size, configs, self.anchor_area_threshold,
        )
        if grid_fn is not None:  # stream path (see _canvas_from_points)
            canvas, occ = self._canvas_from_points(points, points_mask, False)
            amask = jax.vmap(grid_fn.from_occ)(occ)
            preds = self._preds_from_canvas(canvas, False)
            return self._predict_from_preds(
                preds, gen["anchors"], amask, score_threshold, nms_pre,
                nms_post, nms_iou,
            )
        vox = voxelize_batch(
            points, points_mask, tuple(self.voxel_size), tuple(self.pc_range),
            self.max_voxels, self.max_points_per_voxel,
        )
        anchors_bv = rbbox_to_near_bbox(gen["anchors"][:, [0, 1, 3, 4, 6]])
        amask = jax.vmap(
            lambda c: anchors_bev_area_mask(
                c, anchors_bv, (self.grid_ny, self.grid_nx),
                self.voxel_size, self.pc_range,
                self.anchor_area_threshold,
            )
        )(vox.coords)
        return self.predict(
            vox.voxels, vox.num_points, vox.coords, gen["anchors"], amask,
            score_threshold, nms_pre, nms_post, nms_iou,
        )
