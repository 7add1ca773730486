"""E2E multi-task 3D learning validation: overfit CenterPoint on 4 scenes.

Two task groups (car / pedestrian+cyclist-like), planted point clusters,
device-side AssignLabel targets, FastFocal + per-channel L1 training, then the
fused predict (per-task decode + rotated NMS) must recover every GT box.
Companion to tools/overfit_validation.py and tools/overfit_pointpillars.py.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    from minddet_tpu.core.optim import adamw
    from minddet_tpu.models.detectors.centerpoint import CenterPoint
    from minddet_tpu.ops.rotated_iou import rotated_iou_bev
    from minddet_tpu.ops.targets import centerpoint_targets_batch
    from minddet_tpu.ops.voxelize import voxelize_batch
    from minddet_tpu.train.loop import TrainState, make_train_step

    VS, PCR = (0.2, 0.2, 8.0), (-25.6, -25.6, -5.0, 25.6, 25.6, 3.0)
    NY = NX = 256
    OSF = 4  # feature map 64x64
    TASKS = (1, 2)
    B, N, MAXO = 4, 10000, 8
    rng = np.random.RandomState(0)
    pts = np.stack(
        [rng.uniform(-25, 25, (B, N)), rng.uniform(-25, 25, (B, N)),
         rng.uniform(-2.5, 0.5, (B, N)), rng.uniform(0, 1, (B, N)),
         rng.uniform(0, 0.4, (B, N))], -1,
    ).astype(np.float32)

    # per-task GT: task0 cars (w=1.9, l=4.5), task1 small objects
    gt = {0: np.zeros((B, MAXO, 9), np.float32), 1: np.zeros((B, MAXO, 9), np.float32)}
    cls = {0: np.zeros((B, MAXO), np.int32), 1: np.zeros((B, MAXO), np.int32)}
    gm = {0: np.zeros((B, MAXO), bool), 1: np.zeros((B, MAXO), bool)}
    pi = 0
    for b in range(B):
        pi = 0
        for t, (wl, n_obj) in enumerate((( (1.9, 4.5), 2), ((0.8, 0.8), 2))):
            for o in range(n_obj):
                cx, cy = rng.uniform(-18, 18, 2)
                yaw = rng.uniform(-np.pi / 3, np.pi / 3)
                gt[t][b, o] = [cx, cy, -1.2, wl[0], wl[1], 1.6, 0.0, 0.0, yaw]
                cls[t][b, o] = rng.randint(0, TASKS[t])
                gm[t][b, o] = True
                u = rng.uniform(-wl[1] / 2, wl[1] / 2, 300)
                v = rng.uniform(-wl[0] / 2, wl[0] / 2, 300)
                s, c = np.sin(yaw), np.cos(yaw)
                pts[b, pi:pi + 300, 0] = cx + c * u - s * v
                pts[b, pi:pi + 300, 1] = cy + s * u + c * v
                pts[b, pi:pi + 300, 2] = rng.uniform(-1.1, 0.3, 300)
                pi += 300

    vox = voxelize_batch(jnp.asarray(pts), jnp.ones((B, N), bool), VS, PCR, 6000, 20)
    example = {"hm": [], "anno_box": [], "ind": [], "mask": [], "cat": []}
    for t, ncls in enumerate(TASKS):
        tt = centerpoint_targets_batch(
            jnp.asarray(gt[t]), jnp.asarray(cls[t]), jnp.asarray(gm[t]),
            (NY // OSF, NX // OSF), ncls, PCR, VS, OSF, 0.1, 2.0, MAXO,
        )
        for k in example:
            example[k].append(tt[k])
    log("positives per task:", [float(jnp.sum(m)) for m in example["mask"]])

    model = CenterPoint(
        task_num_classes=TASKS, grid_ny=NY, grid_nx=NX, voxel_size=VS,
        pc_range=PCR, out_size_factor=OSF,
    )
    variables = model.init(jax.random.PRNGKey(0), vox.voxels, vox.num_points, vox.coords)
    state = TrainState.create(variables["params"], variables.get("batch_stats", {}),
                              adamw(1e-3))
    batch = {"voxels": vox.voxels, "num_points": vox.num_points,
             "coords": vox.coords, **example}

    def loss_apply(v, b, train=True):
        return model.apply(v, b, train=train, method=model.loss, mutable=["batch_stats"])

    step = make_train_step(loss_apply, donate=False)
    t0 = time.time()
    for i in range(800):
        state, m = step(state, batch)
        if i % 200 == 0:
            log(f"  step {i} loss={float(m['loss']):.3f}")
    log(f"final loss {float(m['loss']):.4f} in {time.time() - t0:.0f}s")

    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        vox.voxels, vox.num_points, vox.coords, 0.2, 256, 16, 0.2,
        method=model.predict,
    )
    matched = total = 0
    for b in range(B):
        det = np.asarray(out["boxes"][b])
        sc = np.asarray(out["scores"][b])
        det = det[sc > 0.2]
        for t in range(2):
            for o in range(MAXO):
                if not gm[t][b, o]:
                    continue
                total += 1
                if len(det) == 0:
                    continue
                g = gt[t][b, o]
                gbev = np.array([[g[0], g[1], g[3], g[4], g[8]]], np.float32)
                dbev = det[:, [0, 1, 3, 4, 8]]
                iou = np.asarray(rotated_iou_bev(jnp.asarray(gbev), jnp.asarray(dbev)))
                if iou.max() > 0.4:
                    matched += 1
    log(f"recovered {matched}/{total} GT boxes at BEV IoU>0.4")
    assert matched >= total - 2, "CenterPoint failed to learn its train set"
    log("CENTERPOINT OVERFIT VALIDATION PASSED")


if __name__ == "__main__":
    main()
