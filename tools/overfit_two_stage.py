"""E2E learning validation for the two-stage CenterPoint.

Overfits ``CenterPointTwoStage`` on 4 synthetic scenes through the fused
raw-points path (``loss_from_gt``: device voxelize + targets + stage-1 loss
+ proposal refinement loss), then checks BOTH stages learned:

1. ``predict_refined`` recovers every GT box (stage-1 competence, same bar
   as tools/overfit_centerpoint.py);
2. the stage-2 quality score RANKS proposals by their actual IoU against
   GT — positive correlation between sigmoid(score) and measured BEV IoU —
   which is the whole point of the refinement stage the reference never
   shipped (its ``forward_two_stage`` hands features to a second stage that
   does not exist, ``det3d_ms/models/detectors/point_pillars.py:96-133``).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    from minddet_tpu.core.optim import adamw
    from minddet_tpu.models.detectors.centerpoint import CenterPointTwoStage
    from minddet_tpu.ops.rotated_iou import rotated_iou_bev
    from minddet_tpu.train.loop import TrainState, make_train_step

    VS, PCR = (0.2, 0.2, 8.0), (-25.6, -25.6, -5.0, 25.6, 25.6, 3.0)
    NY = NX = 256
    TASKS = (1, 2)
    B, N, G = 4, 10000, 4
    rng = np.random.RandomState(0)
    pts = np.stack(
        [rng.uniform(-25, 25, (B, N)), rng.uniform(-25, 25, (B, N)),
         rng.uniform(-2.5, 0.5, (B, N)), rng.uniform(0, 1, (B, N)),
         rng.uniform(0, 0.4, (B, N))], -1,
    ).astype(np.float32)

    gt = np.zeros((B, G, 9), np.float32)
    gcls = np.zeros((B, G), np.int32)
    gm = np.zeros((B, G), bool)
    for b in range(B):
        pi = 0
        for o in range(G):
            big = o < 2
            wl = (1.9, 4.5) if big else (0.8, 0.8)
            cx, cy = rng.uniform(-18, 18, 2)
            yaw = rng.uniform(-np.pi / 3, np.pi / 3)
            gt[b, o] = [cx, cy, -1.2, wl[0], wl[1], 1.6, 0.0, 0.0, yaw]
            gcls[b, o] = 1 if big else rng.randint(2, 4)
            gm[b, o] = True
            u = rng.uniform(-wl[1] / 2, wl[1] / 2, 300)
            v = rng.uniform(-wl[0] / 2, wl[0] / 2, 300)
            s, c = np.sin(yaw), np.cos(yaw)
            pts[b, pi:pi + 300, 0] = cx + c * u - s * v
            pts[b, pi:pi + 300, 1] = cy + s * u + c * v
            pts[b, pi:pi + 300, 2] = rng.uniform(-1.1, 0.3, 300)
            pi += 300

    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((B, N), bool),
        "gt_boxes": jnp.asarray(gt),
        "gt_classes": jnp.asarray(gcls),
        "gt_mask": jnp.asarray(gm),
    }
    model = CenterPointTwoStage(
        task_num_classes=TASKS, grid_ny=NY, grid_nx=NX, voxel_size=VS,
        pc_range=PCR, out_size_factor=4, max_voxels=6000,
        max_points_per_voxel=20, num_proposals=32, refine_hidden=64,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           method=model.loss_from_gt)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), adamw(1e-3))

    def loss_apply(v, b, train=True):
        return model.apply(v, b, train=train, method=model.loss_from_gt,
                           mutable=["batch_stats"])

    step = make_train_step(loss_apply, donate=False)
    t0 = time.time()
    for i in range(800):
        state, m = step(state, batch)
        if i % 200 == 0:
            log(f"  step {i} loss={float(m['loss']):.3f} "
                f"s2_score={float(m['stage2_score']):.3f} "
                f"s2_box={float(m['stage2_box']):.3f}")
    log(f"final loss {float(m['loss']):.4f} in {time.time() - t0:.0f}s")

    vs = {"params": state.params, "batch_stats": state.batch_stats}
    out = jax.jit(lambda v, p, pm: model.apply(
        v, p, pm, method=model.predict_refined, score_threshold=0.2,
        nms_pre=256, nms_post=16, nms_iou=0.2))(
        vs, batch["points"], batch["points_mask"])

    # 1) every GT recovered by the refined predict
    matched = total = 0
    for b in range(B):
        det = np.asarray(out["boxes"][b])
        sc = np.asarray(out["scores"][b])
        keep = sc > 0.05
        det = det[keep]
        gbev = gt[b][gm[b]][:, [0, 1, 3, 4, 8]].astype(np.float32)
        total += len(gbev)
        if len(det):
            dbev = det[:, [0, 1, 3, 4, 8]].astype(np.float32)
            iou = np.asarray(rotated_iou_bev(jnp.asarray(gbev),
                                             jnp.asarray(dbev)))
            matched += int((iou.max(axis=1) > 0.4).sum())
    log(f"recovered {matched}/{total} GT boxes at BEV IoU>0.4 (refined)")

    # 2) the stage-2 quality score ranks the RAW proposal set by true IoU.
    #    The NMS'd detections above are all near-perfect (no spread to
    #    rank); the proposal set mixes foreground and background, which is
    #    what the IoU-quality head is trained to separate.
    def probe(mdl, p, pm):
        bev = mdl._bev_from_points_stream(p, pm, False)
        preds = mdl.head(bev, train=False)
        boxes, s1, _ = mdl.head.decode_boxes(
            preds, pc_range=mdl.pc_range, voxel_size=mdl.voxel_size,
            out_size_factor=mdl.out_size_factor, k=mdl.num_proposals)
        slog, _ = mdl._refine_proposals(bev, boxes, False)
        return boxes, jax.nn.sigmoid(slog)

    boxes_p, s2 = jax.jit(lambda v, p, pm: model.apply(
        v, p, pm, method=probe))(vs, batch["points"], batch["points_mask"])
    pairs = []
    for b in range(B):
        pbev = np.asarray(boxes_p[b])[:, [0, 1, 3, 4, 8]].astype(np.float32)
        gbev = gt[b][gm[b]][:, [0, 1, 3, 4, 8]].astype(np.float32)
        iou = np.asarray(rotated_iou_bev(jnp.asarray(pbev),
                                         jnp.asarray(gbev))).max(axis=1)
        pairs.extend(zip(np.asarray(s2[b]).tolist(), iou.tolist()))
    pairs = np.asarray(pairs)
    corr = float(np.corrcoef(pairs[:, 0], pairs[:, 1])[0, 1])
    fg = pairs[:, 1] >= 0.55
    log(f"stage-2 score vs proposal-IoU correlation: {corr:.3f} over "
        f"{len(pairs)} proposals ({int(fg.sum())} fg); "
        f"mean score fg={pairs[fg, 0].mean():.3f} "
        f"bg={pairs[~fg, 0].mean():.3f}")

    assert matched >= total - 2, "two-stage failed to learn its train set"
    assert corr > 0.3, "stage-2 score does not rank proposals by IoU"
    assert pairs[fg, 0].mean() > pairs[~fg, 0].mean() + 0.1, (
        "stage-2 score does not separate fg from bg proposals")
    log("TWO-STAGE OVERFIT VALIDATION PASSED")


if __name__ == "__main__":
    main()
