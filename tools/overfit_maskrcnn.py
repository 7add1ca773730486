"""E2E mask learning validation: overfit Mask R-CNN on 8 synthetic scenes;
predicted masks pasted to image resolution must recover the GT ellipses
through the segm (mask-IoU) COCO protocol.

Validates the whole round-3 mask path in one shot: gt_bitmaps -> ROIAlign
mask targets -> mask loss -> predict 28x28 ROI masks -> paste_masks_to_image
-> mask-AP evaluator. Run on the chip: ~5 min at 128x128.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, flush=True)


from minddet_tpu.core.optim import adamw
from minddet_tpu.data.coco import paste_masks_to_image
from minddet_tpu.data.coco_eval import COCOEvaluator
from minddet_tpu.models.detectors.faster_rcnn import MaskRCNN
from minddet_tpu.train.loop import TrainState, make_train_step

B, R, C, O, S = 8, 128, 3, 4, 4  # batch, res, classes, objs, mask stride
rng = np.random.RandomState(0)
images = rng.rand(B, R, R, 3).astype(np.float32) * 0.15
boxes = np.zeros((B, O, 4), np.float32)
classes = np.zeros((B, O), np.int32)
mask = np.zeros((B, O), bool)
gt_full = np.zeros((B, O, R, R), bool)      # full-res GT masks (eval)
bitmaps = np.zeros((B, R // S, R // S, O), np.float32)  # training targets
yy, xx = np.mgrid[:R, :R]
for b in range(B):
    for o in range(O):
        x, y = rng.randint(8, R - 60, 2)
        w, h = rng.randint(30, 55, 2)
        cls = rng.randint(0, C)
        cx, cy, rx, ry = x + w / 2, y + h / 2, w / 2, h / 2
        ell = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0
        boxes[b, o] = [x, y, x + w, y + h]
        classes[b, o] = cls
        mask[b, o] = True
        gt_full[b, o] = ell
        bitmaps[b, :, :, o] = ell[::S, ::S]
        color = np.zeros(3)
        color[cls % 3] = 1.0
        color *= 0.5 + 0.5 * (cls // 3 + 1) / 2
        images[b][ell] = color  # paint the ellipse (not the box!)

batch = {
    "image": jnp.asarray(images),
    "gt_boxes": jnp.asarray(boxes),
    "gt_classes": jnp.asarray(classes),
    "gt_mask": jnp.asarray(mask),
    "gt_bitmaps": jnp.asarray(bitmaps),
}
model = MaskRCNN(num_classes=C, depth=18, image_hw=(R, R), mask_stride=S,
                 rpn_pre_nms=256, rpn_post_nms=64, roi_samples=64)
variables = model.init(
    {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
    batch, method=model.loss,
)
state = TrainState.create(variables["params"],
                          variables.get("batch_stats", {}), adamw(1e-3))


def loss_apply(v, b, train=True):
    return model.apply(v, b, train=train, method=model.loss,
                       mutable=["batch_stats"],
                       rngs={"sampling": jax.random.PRNGKey(2)})


step = make_train_step(loss_apply, donate=False)
log("training 500 steps...")
t0 = time.time()
for i in range(500):
    state, m = step(state, batch)
    if i % 100 == 0:
        log(f"  step {i} loss={float(m['loss']):.3f} "
            f"mask={float(m.get('mask', 0.0)):.3f}")
log(f"final loss {float(m['loss']):.3f} in {time.time() - t0:.0f}s")

out = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                  batch["image"], 0.5, 0.5, 8, method=model.predict)
out = {k: np.asarray(v) for k, v in out.items()}

ev_box = COCOEvaluator(list(range(C)))
ev_segm = COCOEvaluator(list(range(C)))
for b in range(B):
    keep = out["scores"][b] > 0.5
    d_boxes = out["boxes"][b][keep]
    d_scores = out["scores"][b][keep]
    d_labels = out["labels"][b][keep]
    d_masks = paste_masks_to_image(out["masks"][b][keep], d_boxes, R, R)
    for c in range(C):
        gm = (classes[b] == c) & mask[b]
        pm = d_labels == c
        ev_box.add(c, d_boxes[pm], d_scores[pm], boxes[b][gm])
        ev_segm.add(c, d_boxes[pm], d_scores[pm], boxes[b][gm],
                    dt_masks=d_masks[pm], gt_masks=gt_full[b][gm])
box_stats = ev_box.summarize()
segm_stats = ev_segm.summarize()
log(f"train-set box AP50: {box_stats['AP50']:.3f}  "
    f"mask AP50: {segm_stats['AP50']:.3f}  mask AP: {segm_stats['AP']:.3f}")
assert box_stats["AP50"] > 0.5, "box head failed to learn its training set"
assert segm_stats["AP50"] > 0.5, "mask head failed to learn its training set"
log("MASK OVERFIT VALIDATION PASSED")
