"""CenterNet model: shapes, loss gradients, and target->decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddet_tpu.models.detectors.centernet import CenterNet
from minddet_tpu.ops.dcn import deform_conv2d
from minddet_tpu.ops.targets import centernet_targets_batch

pytestmark = pytest.mark.slow  # full-model suites; deselect with -m 'not slow'


@pytest.fixture(scope="module")
def small_model():
    # tiny input keeps CPU test time sane; stride-4 output
    model = CenterNet(num_classes=4, depth=18, dcn=True)
    rng = jax.random.PRNGKey(0)
    image = jnp.zeros((1, 64, 64, 3))
    variables = model.init(rng, image, train=False)
    return model, variables


def test_forward_shapes(small_model):
    model, variables = small_model
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out["hm"].shape == (2, 16, 16, 4)
    assert out["wh"].shape == (2, 16, 16, 2)
    assert out["reg"].shape == (2, 16, 16, 2)
    hm = np.asarray(out["hm"])
    assert hm.min() >= 1e-4 and hm.max() <= 1 - 1e-4  # sigmoid-clipped


def test_hm_bias_prior(small_model):
    """Fresh head should predict ~sigmoid(-2.19) ~= 0.1 everywhere."""
    model, variables = small_model
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    mean_hm = float(jnp.mean(out["hm"]))
    assert 0.05 < mean_hm < 0.2


def test_loss_and_grads(small_model):
    model, variables = small_model
    b, ho, wo, c = 2, 16, 16, 4
    boxes = jnp.array([[[2.0, 2.0, 8.0, 9.0]], [[4.0, 4.0, 12.0, 12.0]]])
    classes = jnp.array([[1], [3]])
    mask = jnp.ones((b, 1), bool)
    targets = centernet_targets_batch(boxes, classes, mask, ho, wo, c, 0.7)
    image = jnp.ones((b, 64, 64, 3)) * 0.1

    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        (total, parts), _ = model.apply(
            {"params": p, **others},
            image,
            targets,
            train=True,
            method=model.loss,
            mutable=["batch_stats"],
        )
        return total, parts

    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert float(parts["hm_loss"]) > 0
    # gradient flows to the backbone stem AND to DCN offsets
    g_stem = grads["backbone"]["conv1"]["kernel"]
    assert float(jnp.max(jnp.abs(g_stem))) > 0
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)


def test_deform_conv_zero_offset_equals_conv():
    """With zero offsets and mask=1, DCN must equal a regular 3x3 conv."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32) * 0.1)
    offsets = jnp.zeros((1, 8, 8, 9, 2))
    mask = jnp.ones((1, 8, 8, 9))
    got = deform_conv2d(x, offsets, mask, w, stride=1, padding=1)
    expect = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-4, atol=1e-4)


def test_deform_conv_integer_shift():
    """Offset of exactly (+1, 0) on every tap equals shifting the input."""
    rng = np.random.RandomState(1)
    x = np.zeros((1, 6, 6, 2), np.float32)
    x[0, :, :, :] = rng.randn(6, 6, 2)
    w = np.zeros((3, 3, 2, 2), np.float32)
    w[1, 1, 0, 0] = 1.0  # identity center tap channel 0
    w[1, 1, 1, 1] = 1.0
    offsets = np.zeros((1, 6, 6, 9, 2), np.float32)
    offsets[..., 0] = 1.0  # dy = +1 everywhere
    mask = np.ones((1, 6, 6, 9), np.float32)
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(mask), jnp.asarray(w))
    )
    # output row r samples input row r+1
    np.testing.assert_allclose(got[0, :5], x[0, 1:6], atol=1e-5)
    np.testing.assert_allclose(got[0, 5], np.zeros((6, 2)), atol=1e-5)


def test_predict_decodes(small_model):
    model, variables = small_model
    det = model.apply(
        variables, jnp.zeros((1, 64, 64, 3)), 10, method=model.predict
    )
    assert det.shape == (1, 10, 6)
    scores = np.asarray(det[0, :, 4])
    assert np.all(np.diff(scores) <= 1e-6)  # sorted descending
