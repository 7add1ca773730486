"""E2E learning validation: overfit CenterNet on 8 synthetic images; the
trained model's decoded detections must match the GT boxes (COCO AP -> high)."""
import time
import jax, jax.numpy as jnp, numpy as np
def log(*a): print(*a, flush=True)
from minddet_tpu.core.optim import adamw
from minddet_tpu.models.detectors.centernet import CenterNet
from minddet_tpu.ops.targets import centernet_targets_batch
from minddet_tpu.train.loop import TrainState, make_train_step
from minddet_tpu.data.coco_eval import COCOEvaluator

B, R, C = 8, 256, 6
rng = np.random.RandomState(0)
# images with visible colored squares at the box locations
images = rng.rand(B, R, R, 3).astype(np.float32) * 0.2
boxes = np.zeros((B, 6, 4), np.float32); classes = np.zeros((B, 6), np.int32)
mask = np.zeros((B, 6), bool)
for b in range(B):
    for o in range(4):
        x, y = rng.randint(10, 180, 2); w, h = rng.randint(30, 60, 2)
        cls = rng.randint(0, C)
        boxes[b, o] = [x, y, x+w, y+h]; classes[b, o] = cls; mask[b, o] = True
        color = np.zeros(3); color[cls % 3] = 1.0; color *= (0.5 + 0.5 * (cls // 3))
        images[b, y:y+h, x:x+w] = color  # paint the object
targets = centernet_targets_batch(jnp.asarray(boxes)/4.0, jnp.asarray(classes),
                                  jnp.asarray(mask), R//4, R//4, C, 0.7)
batch = {"image": jnp.asarray(images), "targets": targets}
model = CenterNet(num_classes=C, depth=18, dcn=True, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), batch["image"][:1])
state = TrainState.create(variables["params"], variables.get("batch_stats", {}), adamw(3e-4))
def loss_apply(v, b, train=True):
    return model.apply(v, b["image"], b["targets"], train=train, method=model.loss, mutable=["batch_stats"])
step = make_train_step(loss_apply, donate=False)
log("training 600 steps...")
t0 = time.time()
for i in range(600):
    state, m = step(state, batch)
    if i % 100 == 0: log(f"  step {i} loss={float(m['loss']):.3f}")
log(f"final loss {float(m['loss']):.3f} in {time.time()-t0:.0f}s")

det = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                  batch["image"], 20, method=model.predict)
det = np.asarray(det)
ev = COCOEvaluator(list(range(C)))
for b in range(B):
    d = det[b]; d_boxes = d[:, :4] * 4.0
    for c in range(C):
        gm = (classes[b] == c) & mask[b]
        pm = d[:, 5].astype(int) == c
        ev.add(c, d_boxes[pm], d[pm, 4], boxes[b][gm])
stats = ev.summarize()
log(f"train-set AP: {stats['AP']:.3f}  AP50: {stats['AP50']:.3f}")
assert stats["AP50"] > 0.6, "model failed to learn its own training set!"
log("OVERFIT VALIDATION PASSED")
