"""E2E 3D learning validation: overfit PointPillars on 4 fixed scenes.

Plants dense point clusters at known car poses, trains on-device
(voxelize + assign + SECOND losses in one jitted step), then asserts the
fused predict path (decode + rotated NMS) recovers every GT box with BEV
IoU > 0.5. Companion to tools/overfit_validation.py (CenterNet).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    from minddet_tpu.core.optim import adamw
    from minddet_tpu.models.detectors.pointpillars import PointPillars
    from minddet_tpu.ops.anchors import assign_targets_batch, create_anchors_3d_stride
    from minddet_tpu.ops.rotated_iou import rotated_iou_bev
    from minddet_tpu.ops.voxelize import voxelize_batch
    from minddet_tpu.train.loop import TrainState, make_train_step

    VS, PCR = (0.16, 0.16, 4.0), (0.0, -20.48, -3.0, 40.96, 20.48, 1.0)
    NY, NX = 256, 256
    B, N = 4, 12000
    rng = np.random.RandomState(0)
    pts = np.stack(
        [rng.uniform(0, 40, (B, N)), rng.uniform(-20, 20, (B, N)),
         rng.uniform(-2.5, 0.5, (B, N)), rng.uniform(0, 1, (B, N))], -1
    ).astype(np.float32)
    gt = np.zeros((B, 4, 7), np.float32)
    gm = np.zeros((B, 4), bool)
    for b in range(B):
        for o in range(3):
            cx, cy = rng.uniform(6, 34), rng.uniform(-14, 14)
            yaw = rng.uniform(-np.pi / 3, np.pi / 3)
            gt[b, o] = [cx, cy, -1.8, 1.6, 3.9, 1.56, yaw]
            gm[b, o] = True
            # plant a rotated cluster of 400 points in the box
            u = rng.uniform(-1.9, 1.9, 400)
            v = rng.uniform(-0.75, 0.75, 400)
            s, c = np.sin(yaw), np.cos(yaw)
            px = cx + c * u - s * v
            py = cy + s * u + c * v
            i0 = o * 400
            pts[b, i0:i0 + 400, 0] = px
            pts[b, i0:i0 + 400, 1] = py
            pts[b, i0:i0 + 400, 2] = rng.uniform(-1.7, -0.4, 400)

    vox = voxelize_batch(jnp.asarray(pts), jnp.ones((B, N), bool), VS, PCR, 8000, 24)
    anchors = jnp.asarray(
        create_anchors_3d_stride(
            (NY // 2, NX // 2), anchor_strides=(0.32, 0.32, 0.0),
            anchor_offsets=(0.16, -20.32, -1.78),
        ).reshape(-1, 7)
    )
    t = assign_targets_batch(
        anchors, jnp.asarray(gt), jnp.ones((B, 4), jnp.int32), jnp.asarray(gm),
        jnp.full((anchors.shape[0],), 0.6), jnp.full((anchors.shape[0],), 0.45), None,
    )
    log("positives:", np.asarray(jnp.sum(t["labels"] > 0, 1)))

    model = PointPillars(num_classes=1, grid_ny=NY, grid_nx=NX,
                         voxel_size=VS, pc_range=PCR)
    variables = model.init(jax.random.PRNGKey(0), vox.voxels, vox.num_points, vox.coords)
    state = TrainState.create(variables["params"], variables.get("batch_stats", {}),
                              adamw(2e-3))
    batch = {"voxels": vox.voxels, "num_points": vox.num_points,
             "coords": vox.coords, "anchors": anchors,
             "labels": t["labels"], "reg_targets": t["bbox_targets"]}

    def loss_apply(v, b, train=True):
        return model.apply(v, b, train=train, method=model.loss, mutable=["batch_stats"])

    step = make_train_step(loss_apply, donate=False)
    t0 = time.time()
    for i in range(1200):
        state, m = step(state, batch)
        if i % 100 == 0:
            log(f"  step {i} loss={float(m['loss']):.3f}")
    log(f"final loss {float(m['loss']):.4f} in {time.time() - t0:.0f}s")

    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vox.voxels, vox.num_points, vox.coords, anchors, None, 0.1,
        method=model.predict,
    )
    log("top scores sample0:", np.round(np.asarray(out["scores"][0])[:5], 3))
    log("top boxes sample0:", np.round(np.asarray(out["boxes"][0])[:2], 2))
    matched = total = 0
    for b in range(B):
        det = np.asarray(out["boxes"][b])
        sc = np.asarray(out["scores"][b])
        det = det[sc > 0.1]
        for o in range(4):
            if not gm[b, o]:
                continue
            total += 1
            if len(det) == 0:
                continue
            iou = np.asarray(
                rotated_iou_bev(
                    jnp.asarray(gt[b, o : o + 1][:, [0, 1, 3, 4, 6]]),
                    jnp.asarray(det[:, [0, 1, 3, 4, 6]]),
                )
            )
            if iou.max() > 0.5:
                matched += 1
    log(f"recovered {matched}/{total} GT boxes at BEV IoU>0.5")
    assert matched >= total - 1, "PointPillars failed to learn its train set"
    log("POINTPILLARS OVERFIT VALIDATION PASSED")


if __name__ == "__main__":
    main()
