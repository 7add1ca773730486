"""bilinear_gather / bilinear_sample_2d: XLA path golden tests + interpret-mode
parity for the Pallas kernels (runs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddet_tpu.ops.bilinear import bilinear_gather, bilinear_sample_2d
from minddet_tpu.ops.dcn import deform_conv2d


def _np_bilinear(x, ys, xs):
    """Independent numpy bilinear sampler with zero padding."""
    b, h, w, c = x.shape
    out = np.zeros((b, ys.shape[1], c), np.float32)
    for bi in range(b):
        for p in range(ys.shape[1]):
            y, xx = ys[bi, p], xs[bi, p]
            y0, x0 = int(np.floor(y)), int(np.floor(xx))
            dy, dx = y - y0, xx - x0
            for (cy, cx, wgt) in (
                (y0, x0, (1 - dy) * (1 - dx)),
                (y0, x0 + 1, (1 - dy) * dx),
                (y0 + 1, x0, dy * (1 - dx)),
                (y0 + 1, x0 + 1, dy * dx),
            ):
                if 0 <= cy < h and 0 <= cx < w:
                    out[bi, p] += wgt * x[bi, cy, cx]
    return out


def test_sample_2d_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    ys = rng.uniform(-1, 8, (2, 16)).astype(np.float32)
    xs = rng.uniform(-1, 8, (2, 16)).astype(np.float32)
    got = np.asarray(bilinear_sample_2d(jnp.asarray(x), jnp.asarray(ys), jnp.asarray(xs)))
    np.testing.assert_allclose(got, _np_bilinear(x, ys, xs), rtol=1e-4, atol=1e-5)


def test_gather_negative_index_skipped():
    x = jnp.ones((1, 8, 4))
    ci = jnp.array([[[-1, 0, 1, 2]]])
    cw = jnp.array([[[100.0, 1.0, 1.0, 1.0]]])
    out = np.asarray(bilinear_gather(x, ci, cw))
    np.testing.assert_allclose(out, np.full((1, 1, 4), 3.0), atol=1e-5)


def test_gather_gradients_match_finite_difference():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 4).astype(np.float32))
    ci = jnp.asarray(rng.randint(0, 16, (1, 8, 4)).astype(np.int32))
    cw = jnp.asarray(rng.rand(1, 8, 4).astype(np.float32))

    def f(x, cw):
        return jnp.sum(bilinear_gather(x, ci, cw) ** 2)

    gx, gcw = jax.grad(f, argnums=(0, 1))(x, cw)
    eps = 1e-3
    # spot-check one x element and one cw element by finite difference
    x2 = x.at[0, 3, 2].add(eps)
    fd = (f(x2, cw) - f(x, cw)) / eps
    np.testing.assert_allclose(float(gx[0, 3, 2]), float(fd), rtol=2e-2, atol=1e-3)
    cw2 = cw.at[0, 5, 1].add(eps)
    fd = (f(x, cw2) - f(x, cw)) / eps
    np.testing.assert_allclose(float(gcw[0, 5, 1]), float(fd), rtol=2e-2, atol=1e-3)


@pytest.mark.slow
def test_pallas_interpret_matches_xla():
    """Run the actual Pallas kernels in interpreter mode on CPU."""
    rng = np.random.RandomState(2)
    b, hw, c, p = 2, 256, 128, 384
    x = jnp.asarray(rng.randn(b, hw, c).astype(np.float32))
    ci = jnp.asarray(rng.randint(-1, hw, (b, p, 4)).astype(np.int32))
    cw = jnp.asarray(rng.rand(b, p, 4).astype(np.float32))

    out_x = bilinear_gather(x, ci, cw, "xla")
    out_p = bilinear_gather(x, ci, cw, "pallas", True)
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_x, np.float32), rtol=2e-2, atol=2e-2
    )

    def loss(impl, interp):
        def fn(x, cw):
            return jnp.sum(bilinear_gather(x, ci, cw, impl, interp) ** 2)
        return jax.grad(fn, argnums=(0, 1))

    gx = loss("xla", False)(x, cw)
    gp = loss("pallas", True)(x, cw)
    for a, b_ in zip(gp, gx):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        # kernels accumulate in bf16; tolerate bf16-level error relative to
        # the tensor's scale (cancellation makes per-element rtol meaningless)
        scale = np.abs(b_).max() + 1e-6
        np.testing.assert_allclose(a / scale, b_ / scale, atol=5e-3)


def test_deform_conv_still_equals_regular_conv():
    """Zero offsets + unit mask == plain 3x3 conv (now via bilinear op)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32) * 0.1)
    offsets = jnp.zeros((1, 8, 8, 9, 2))
    mask = jnp.ones((1, 8, 8, 9))
    got = deform_conv2d(x, offsets, mask, w, stride=1, padding=1)
    expect = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-4, atol=1e-4)


def test_deform_conv_stride2():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32) * 0.1)
    offsets = jnp.zeros((1, 4, 4, 9, 2))
    mask = jnp.ones((1, 4, 4, 9))
    got = deform_conv2d(x, offsets, mask, w, stride=2, padding=1)
    expect = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    assert got.shape == (1, 4, 4, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-4, atol=1e-4)
