"""Train loop + mesh sharding: loss decreases, DP step runs on 8 CPU devices."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.core.optim import adamw, build_optimizer, global_norm
from minddet_tpu.core.lr_schedules import multi_epochs_decay, one_cycle, polynomial_decay
from minddet_tpu.parallel.mesh import MeshSpec, batch_sharding, create_mesh, shard_batch
from minddet_tpu.train.loop import TrainState, create_train_state, make_train_step


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3))(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        return nn.Dense(1)(x.mean(axis=(1, 2)))


def _loss_apply_factory(model, target):
    def loss_apply(variables, batch, train=True):
        out, mutated = model.apply(
            variables, batch["image"], train=train, mutable=["batch_stats"]
        )
        loss = jnp.mean((out - target) ** 2)
        return (loss, {"mse": loss}), mutated

    return loss_apply


def test_train_step_decreases_loss():
    model = TinyNet()
    rng = jax.random.PRNGKey(0)
    batch = {"image": jnp.ones((4, 8, 8, 3))}
    state = create_train_state(model, rng, batch, adamw(1e-2))
    step_fn = make_train_step(_loss_apply_factory(model, 3.0), donate=False)

    losses = []
    for _ in range(30):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.2
    assert int(state.step) == 30
    assert np.isfinite(losses).all()


def test_train_step_updates_batch_stats():
    model = TinyNet()
    rng = jax.random.PRNGKey(0)
    batch = {"image": jax.random.normal(rng, (4, 8, 8, 3)) * 5 + 2}
    state = create_train_state(model, rng, batch, adamw(1e-3))
    bs_before = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    step_fn = make_train_step(_loss_apply_factory(model, 0.0), donate=False)
    state, _ = step_fn(state, batch)
    bs_after = state.batch_stats
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), bs_before, bs_after
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_dp_mesh_step_runs_sharded():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = create_mesh(MeshSpec(data=8))
    model = TinyNet()
    rng = jax.random.PRNGKey(0)
    host_batch = {"image": np.random.RandomState(0).randn(16, 8, 8, 3).astype(np.float32)}
    state = create_train_state(model, rng, {"image": jnp.ones((1, 8, 8, 3))}, adamw(1e-2))
    state = jax.device_put(state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    batch = shard_batch(mesh, host_batch)
    # batch must actually be sharded over the data axis
    assert batch["image"].sharding.is_equivalent_to(batch_sharding(mesh, 4), 4)
    step_fn = make_train_step(_loss_apply_factory(model, 1.0), donate=False)
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated after the step
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_nan_guard_skips_bad_step():
    from minddet_tpu.core.optim import skip_nonfinite_updates

    model = TinyNet()
    rng = jax.random.PRNGKey(0)
    batch = {"image": jnp.ones((2, 8, 8, 3))}
    tx = skip_nonfinite_updates(adamw(1e-2))
    state = create_train_state(model, rng, batch, tx)
    params_before = jax.tree_util.tree_map(np.asarray, state.params)

    def bad_loss_apply(variables, batch, train=True):
        out, mutated = model.apply(
            variables, batch["image"], train=train, mutable=["batch_stats"]
        )
        loss = jnp.mean(out) * jnp.nan
        return (loss, {"mse": loss}), mutated

    step_fn = make_train_step(bad_loss_apply, donate=False, with_grad_norm=False)
    state, _ = step_fn(state, batch)
    # update must be skipped -> params unchanged
    same = jax.tree_util.tree_map(
        lambda a, b: np.allclose(a, np.asarray(b)), params_before, state.params
    )
    assert all(jax.tree_util.tree_leaves(same))


def test_lr_schedules_shapes():
    s = polynomial_decay(1e-3, 1e-5, 1000, power=0.9, warmup_steps=100)
    assert float(s(0)) < 1e-4 and abs(float(s(100)) - 1e-3) < 1e-6
    m = multi_epochs_decay(1e-3, [2, 4], steps_per_epoch=10, factor=10.0)
    assert abs(float(m(0)) - 1e-3) < 1e-9
    assert abs(float(m(25)) - 1e-4) < 1e-9
    assert abs(float(m(45)) - 1e-5) < 1e-9
    oc = one_cycle(2e-3, 100, pct_start=0.4)
    assert abs(float(oc(40)) - 2e-3) < 1e-6  # peak at pct_start
    assert float(oc(0)) < 2.1e-4 + 1e-6  # starts at lr_max/div
    assert float(oc(99)) < 1e-4


def test_build_optimizer_from_cfg():
    tx = build_optimizer({"type": "adamw", "weight_decay": 0.01}, 1e-3)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    updates, _ = tx.update(grads, opt_state, params)
    assert jax.tree_util.tree_structure(updates) == jax.tree_util.tree_structure(params)


def test_trainer_checkpoint_resume_roundtrip(tmp_path):
    """Trainer saves at the save interval; restore reproduces params + step."""
    import flax

    from minddet_tpu.core.checkpoint import CheckpointManager
    from minddet_tpu.core.metrics import MetricWriter
    from minddet_tpu.train.loop import Trainer

    model = TinyNet()
    rng = jax.random.PRNGKey(0)
    batch = {"image": jnp.ones((8, 8, 8, 3))}  # divisible by the 8-dev mesh
    state = create_train_state(model, rng, batch, adamw(1e-2))
    step_fn = make_train_step(_loss_apply_factory(model, 3.0), donate=False)

    ckpt = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=5,
                             async_save=False)
    trainer = Trainer(state, step_fn, metric_writer=MetricWriter(str(tmp_path)),
                      checkpoint_manager=ckpt, log_every=100, save_every=5)
    final = trainer.fit(iter([batch] * 7), num_steps=7, batch_size=4)
    assert ckpt.latest_step() == 7  # forced save on the last step

    template = flax.serialization.to_state_dict(
        {"params": state.params, "batch_stats": state.batch_stats,
         "opt_state": state.opt_state, "step": state.step})
    restored = ckpt.restore(template)
    assert int(restored["step"]) == 7
    got = flax.serialization.from_state_dict(state.params, restored["params"])
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(final.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
