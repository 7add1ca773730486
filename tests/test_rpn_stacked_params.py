"""Stacked-parameter scanned RPN blocks: numerics pinned to the per-layer
layout.

``stacked_inner=True`` stores each scanned block's n conv kernels / BN
params / running stats pre-stacked on a leading layer axis so the
``lax.scan`` consumes them with no per-step restack (the r4 CenterPoint
trace attributes ~5 ms/step to dynamic-update-slice chains stacking
UNCHANGED parameters, docs/STATUS.md). The converters
``stack_inner_variables`` / ``unstack_inner_variables`` map between the two
checkpoint layouts; these tests pin output and batch-stats equality across
them.
"""

import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.models.necks.second_rpn import (
    SECONDRPN,
    stack_inner_variables,
    unstack_inner_variables,
)

LAYER_NUMS = (3, 5, 5)


def _models():
    kw = dict(layer_nums=LAYER_NUMS, layer_strides=(2, 2, 2),
              num_filters=(8, 16, 32), upsample_strides=(1, 2, 4),
              num_upsample_filters=(8, 8, 8))
    return SECONDRPN(**kw), SECONDRPN(stacked_inner=True, **kw)


def _x(b=2, r=32):
    return jnp.asarray(
        np.random.RandomState(0).randn(b, r, r, 8).astype(np.float32))


def test_stacked_matches_per_layer_train_and_eval():
    x = _x()
    per_layer, stacked = _models()
    vs = per_layer.init({"params": jax.random.PRNGKey(0)}, x)
    vs_stacked = stack_inner_variables(vs, LAYER_NUMS)

    for train in (True, False):
        ref, ref_mut = per_layer.apply(vs, x, train=train,
                                       mutable=["batch_stats"])
        got, got_mut = stacked.apply(vs_stacked, x, train=train,
                                     mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        # updated running stats must agree layer-for-layer
        ref_stats = dict(vs["batch_stats"], **ref_mut.get("batch_stats", {}))
        got_stats = dict(vs_stacked["batch_stats"],
                         **got_mut.get("batch_stats", {}))
        restacked = stack_inner_variables(
            {"params": vs["params"], "batch_stats": ref_stats}, LAYER_NUMS
        )["batch_stats"]
        for k, v in restacked.items():
            np.testing.assert_allclose(
                np.asarray(jax.tree_util.tree_leaves(got_stats[k])[0])
                if not isinstance(got_stats[k], jnp.ndarray)
                else np.asarray(got_stats[k]),
                np.asarray(v) if isinstance(v, jnp.ndarray)
                else np.asarray(jax.tree_util.tree_leaves(v)[0]),
                rtol=1e-6, atol=1e-6, err_msg=k)


def test_stacked_gradients_match_per_layer():
    x = _x()
    per_layer, stacked = _models()
    vs = per_layer.init({"params": jax.random.PRNGKey(0)}, x)
    vs_stacked = stack_inner_variables(vs, LAYER_NUMS)

    def loss(model, variables):
        y, _ = model.apply(variables, x, train=True,
                           mutable=["batch_stats"])
        return jnp.sum(jnp.square(y))

    g_ref = jax.grad(lambda p: loss(
        per_layer, {"params": p, "batch_stats": vs["batch_stats"]}
    ))(vs["params"])
    g_got = jax.grad(lambda p: loss(
        stacked, {"params": p, "batch_stats": vs_stacked["batch_stats"]}
    ))(vs_stacked["params"])

    g_ref_stacked = stack_inner_variables(
        {"params": g_ref, "batch_stats": vs["batch_stats"]}, LAYER_NUMS
    )["params"]
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(g_ref_stacked))
    flat_got = dict(jax.tree_util.tree_leaves_with_path(g_got))
    assert flat_ref.keys() == flat_got.keys()
    for k in flat_ref:
        np.testing.assert_allclose(np.asarray(flat_got[k]),
                                   np.asarray(flat_ref[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=str(k))


def test_stack_unstack_roundtrip():
    per_layer, _ = _models()
    vs = per_layer.init({"params": jax.random.PRNGKey(1)}, _x())
    back = unstack_inner_variables(
        stack_inner_variables(vs, LAYER_NUMS), LAYER_NUMS)
    ref_flat = dict(jax.tree_util.tree_leaves_with_path(dict(vs)))
    got_flat = dict(jax.tree_util.tree_leaves_with_path(back))
    assert ref_flat.keys() == got_flat.keys()
    for k in ref_flat:
        np.testing.assert_array_equal(np.asarray(got_flat[k]),
                                      np.asarray(ref_flat[k]), err_msg=str(k))


def test_stacked_fresh_init_shapes():
    _, stacked = _models()
    vs = stacked.init({"params": jax.random.PRNGKey(2)}, _x())
    p = vs["params"]
    assert p["block1_inner_kernel"].shape == (5, 3, 3, 16, 16)
    assert p["block1_inner_scale"].shape == (5, 16)
    assert vs["batch_stats"]["block1_inner_var"].shape == (5, 16)
    # per-layer init distribution: each stacked slice is a fresh lecun draw
    k = np.asarray(p["block2_inner_kernel"])
    assert not np.allclose(k[0], k[1])
