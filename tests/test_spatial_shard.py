"""BEV spatial sharding: canvas rows over the mesh 'model' axis.

`bev_shard_spec=("data", "model")` constrains the scattered BEV canvas so
XLA's SPMD partitioner splits the RPN convolutions spatially (halo
exchanges) in addition to batch data-parallelism — the "model axis for
spatial sharding of the BEV canvas" option from SURVEY.md §2.5 that the
reference (DP-only, §2.5 table) never had. The test pins numerical
equivalence against the unsharded step on the fake 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from minddet_tpu.models.detectors.pointpillars import PointPillars

PCR = (0.0, -3.2, -3.0, 6.4, 3.2, 1.0)


def _model(**kw):
    return PointPillars(
        num_classes=1, grid_ny=32, grid_nx=32, voxel_size=(0.2, 0.2, 4.0),
        pc_range=PCR, rpn_layer_nums=(1, 1, 1), rpn_filters=(8, 16, 32),
        rpn_up_filters=(8, 8, 8), max_voxels=128, max_points_per_voxel=8,
        anchor_strides=((0.4, 0.4, 0.0),),
        anchor_offsets=((0.2, -3.0, -1.78),), **kw,
    )


def _batch(b=4, n=256, seed=0):
    rs = np.random.RandomState(seed)
    pts = rs.uniform([PCR[0], PCR[1], PCR[2], 0.0],
                     [PCR[3], PCR[4], PCR[5], 1.0], (b, n, 4)).astype(np.float32)
    boxes = np.zeros((b, 2, 7), np.float32)
    boxes[..., :2] = rs.uniform(1.0, 3.0, (b, 2, 2))
    boxes[..., 2] = -1.0
    boxes[..., 3:6] = [1.6, 3.9, 1.56]
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.ones((b, 2), jnp.int32),
        "gt_mask": jnp.ones((b, 2), bool),
    }


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_spatial_shard_matches_unsharded_loss():
    batch = _batch()
    base = _model()
    variables = base.init({"params": jax.random.PRNGKey(0)}, batch,
                          method=base.loss_from_gt)

    def loss_of(model, vs, bt):
        (total, _parts), _ = model.apply(vs, bt, train=True,
                                         method=model.loss_from_gt,
                                         mutable=["batch_stats"])
        return total

    ref = jax.jit(lambda vs, bt: loss_of(base, vs, bt))(variables, batch)

    sharded = _model(bev_shard_spec=("data", "model"))
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 1, 4),
                axis_names=("data", "fsdp", "model"))
    vs_sh = jax.device_put(variables, NamedSharding(mesh, P()))
    bt_sh = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
        batch)
    with mesh:
        got = jax.jit(lambda vs, bt: loss_of(sharded, vs, bt))(vs_sh, bt_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_tensor_parallel_params_match_unsharded_loss():
    """tp_shard_params: kernels channel-sharded over the 'model' axis must
    produce the same loss as the replicated step (GSPMD inserts the
    collectives; the model code is sharding-agnostic)."""
    from minddet_tpu.parallel.mesh import tp_shard_params

    batch = _batch()
    model = _model()
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           method=model.loss_from_gt)

    def loss_of(vs, bt):
        (total, _parts), _ = model.apply(vs, bt, train=True,
                                         method=model.loss_from_gt,
                                         mutable=["batch_stats"])
        return total

    ref = jax.jit(loss_of)(variables, batch)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 1, 4),
                axis_names=("data", "fsdp", "model"))
    params_tp = tp_shard_params(mesh, variables["params"], min_size=256)
    # at least one kernel must actually be model-sharded
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree_util.tree_leaves(params_tp)
    )
    vs_tp = {"params": params_tp,
             "batch_stats": jax.device_put(
                 variables.get("batch_stats", {}), NamedSharding(mesh, P()))}
    bt_sh = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
        batch)
    with mesh:
        got = jax.jit(loss_of)(vs_tp, bt_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_constrain_is_noop_without_spec():
    from minddet_tpu.parallel.mesh import constrain

    x = jnp.ones((2, 4, 4, 3))
    assert constrain(x, None) is x
