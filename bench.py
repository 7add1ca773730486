"""Headline benchmark: CenterNet-R18-DCN COCO-shape train throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's only throughput-at-parity number — CenterNet
590 img/s on 8x Ascend 910 = ~74 img/s/chip at bs=16/chip, 512x512 input
(minddet/models/centernet/README.md:443-444; BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC_PER_CHIP = 74.0
BATCH = 16
RES = 512
NUM_CLASSES = 80
STEPS = 20


def main() -> None:
    from minddet_tpu.core.optim import adamw
    from minddet_tpu.models.detectors.centernet import CenterNet
    from minddet_tpu.ops.targets import centernet_targets_batch
    from minddet_tpu.train.loop import TrainState, make_train_step

    model = CenterNet(num_classes=NUM_CLASSES, depth=18, dcn=True, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ho = wo = RES // 4

    image = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, RES, RES, 3).astype(np.float32)
    )
    variables = model.init(rng, image[:1], train=False)
    tx = adamw(5e-4, clip_global_norm=35.0)
    state = TrainState.create(variables["params"], variables.get("batch_stats", {}), tx)

    # synthetic COCO-like targets (8 objects/image), generated on device
    rs = np.random.RandomState(1)
    o = 128
    boxes = np.zeros((BATCH, o, 4), np.float32)
    classes = rs.randint(0, NUM_CLASSES, (BATCH, o)).astype(np.int32)
    mask = np.zeros((BATCH, o), bool)
    for b in range(BATCH):
        n = 8
        xy = rs.uniform(0, wo - 30, (n, 2))
        wh = rs.uniform(4, 30, (n, 2))
        boxes[b, :n] = np.concatenate([xy, xy + wh], 1)
        mask[b, :n] = True
    targets = centernet_targets_batch(
        jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(mask),
        ho, wo, NUM_CLASSES, 0.7,
    )
    batch = {"image": image, "targets": targets}

    def loss_apply(variables, batch, train=True):
        return model.apply(
            variables, batch["image"], batch["targets"], train=train,
            method=model.loss, mutable=["batch_stats"],
        )

    step_fn = make_train_step(loss_apply, donate=True)

    # warmup / compile (pull a scalar: under the axon tunnel,
    # block_until_ready can return before execution finishes)
    state, metrics = step_fn(state, batch)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])  # host pull = real sync through the step chain
    dt = time.perf_counter() - t0

    img_per_sec = BATCH * STEPS / dt
    result = {
        "metric": "centernet_r18dcn_train_img_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "img/s/chip (bs=16, 512x512, bf16, incl. on-device target gen)",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC_PER_CHIP, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
