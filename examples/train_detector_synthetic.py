"""Train a zoo detector on synthetic data and watch the loss drop.

    python examples/train_detector_synthetic.py --model CenterNet --steps 30
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_detector_synthetic.py --model YOLOXS
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from minddet_tpu.core.optim import adamw
from minddet_tpu.core.registry import DETECTORS
from minddet_tpu.parallel.mesh import MeshSpec, create_mesh, shard_batch
from minddet_tpu.train.loop import TrainState, Trainer, make_train_step
from minddet_tpu.train.train import (  # noqa: F401 (registry)
    loss_method_for,
    synthetic_detection_batches,
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="CenterNet")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--image-size", type=int, default=128)
    args = p.parse_args()

    hw = (args.image_size, args.image_size)
    model = DETECTORS.build({"type": args.model, "num_classes": 4})
    batches = synthetic_detection_batches(args.batch_size, hw, 4)
    sample = next(iter(batches))

    loss_m = loss_method_for(model)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jax.tree_util.tree_map(jnp.asarray, sample), method=loss_m)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}), adamw(3e-4))

    def loss_apply(vs, batch, train=True):
        batch.pop("step", None)
        return model.apply(vs, batch, train=train, method=loss_m,
                           mutable=["batch_stats"],
                           rngs={"sampling": jax.random.PRNGKey(2)})

    mesh = create_mesh(MeshSpec(data=-1))
    step = make_train_step(loss_apply)
    trainer = Trainer(state, step, mesh=mesh, log_every=5)
    print(f"{args.model} on {mesh.size} device(s); {args.steps} steps")
    trainer.fit(batches, num_steps=args.steps, batch_size=args.batch_size)
    _ = shard_batch  # (exposed for experimentation)


if __name__ == "__main__":
    main()
