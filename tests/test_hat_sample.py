"""Fused hat-sampling kernel vs the XLA corner-gather reference.

The hat formulation (`ops/hat_sample.py`) must reproduce exact bilinear
sampling semantics: four-corner interpolation, zero outside the image,
modulation scale folded in, and gradients wrt features, coordinates and
scale. The XLA path (`ops/bilinear.bilinear_sample_2d`) is the oracle; the
pallas kernels run in interpreter mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddet_tpu.ops.bilinear import bilinear_sample_2d
from minddet_tpu.ops.hat_sample import _plan, hat_sample_2d


def _ref(x, ys, xs, sc):
    out = bilinear_sample_2d(x, ys, xs, implementation="xla")
    return out * sc[..., None].astype(out.dtype)


def _rand_case(b, h, w, c, p, spread, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    # local, DCN-like pattern: raster base + noise
    base_y = np.repeat(np.linspace(0, h - 1, p)[None], b, 0)
    base_x = np.tile(np.linspace(0, w - 1, p)[None], (b, 1))
    ys = jnp.asarray((base_y + rs.randn(b, p) * spread).astype(np.float32))
    xs = jnp.asarray((base_x + rs.randn(b, p) * spread).astype(np.float32))
    sc = jnp.asarray(rs.rand(b, p).astype(np.float32))
    return x, ys, xs, sc


@pytest.mark.parametrize("h,w,c,p,spread", [
    (16, 16, 32, 200, 1.5),     # single window (hw <= max window)
    (64, 64, 16, 700, 1.5),     # windowed, local offsets -> fast path
    (64, 64, 16, 700, 80.0),    # wild offsets -> sweep fallback + OOB
    (8, 16, 8, 130, 2.0),       # P not a tile multiple (padding path)
])
def test_fwd_matches_xla(h, w, c, p, spread):
    x, ys, xs, sc = _rand_case(2, h, w, c, p, spread)
    ref = _ref(x, ys, xs, sc)
    got = hat_sample_2d(x, ys, xs, sc, implementation="pallas",
                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_windowed_plan_is_exercised():
    wrows, nwin = _plan(64, 64, 16, 4)
    assert nwin > 1, "case intended to hit the windowed fast path"


def test_scale_none_means_plain_sampling():
    x, ys, xs, _ = _rand_case(1, 16, 16, 8, 100, 1.0)
    got = hat_sample_2d(x, ys, xs, None, implementation="pallas",
                        interpret=True)
    ref = bilinear_sample_2d(x, ys, xs, implementation="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("spread", [1.5, 80.0])
def test_grads_match_xla(spread):
    x, ys, xs, sc = _rand_case(2, 64, 64, 16, 500, spread, seed=3)
    # keep coords away from integer kinks where subgradients may differ
    ys = jnp.where(jnp.abs(ys - jnp.round(ys)) < 0.05, ys + 0.1, ys)
    xs = jnp.where(jnp.abs(xs - jnp.round(xs)) < 0.05, xs + 0.1, xs)
    g = jnp.asarray(np.random.RandomState(9).randn(2, 500, 16)
                    .astype(np.float32))

    def loss(fn):
        def f(x, ys, xs, sc):
            return jnp.sum(fn(x, ys, xs, sc) * g)
        return jax.grad(f, argnums=(0, 1, 2, 3))

    dref = loss(_ref)(x, ys, xs, sc)
    dgot = loss(lambda *a: hat_sample_2d(*a, implementation="pallas",
                                         interpret=True))(x, ys, xs, sc)
    for r, got, name in zip(dref, dgot, ("dx", "dys", "dxs", "dscale")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(r), rtol=3e-2, atol=3e-2,
            err_msg=name)


def _rand_taps_case(b, h, w, c, p, k, spread, seed=0):
    """Tap-major (B, K, P) coords with a DCN-like raster + tap pattern."""
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    base_y = np.linspace(0, h - 1, p)[None, None]          # (1, 1, P)
    base_x = np.tile(np.linspace(0, w - 1, p), (1, 1))[None]
    tap_dy = (np.arange(k) // 3 - 1.0)[None, :, None]      # (1, K, 1)
    tap_dx = (np.arange(k) % 3 - 1.0)[None, :, None]
    ys = base_y + tap_dy + rs.randn(b, k, p) * spread
    xs = base_x + tap_dx + rs.randn(b, k, p) * spread
    sc = rs.rand(b, k, p)
    return (x, jnp.asarray(ys.astype(np.float32)),
            jnp.asarray(xs.astype(np.float32)),
            jnp.asarray(sc.astype(np.float32)))


def _ref_taps(x, ys, xs, sc):
    b, k, p = ys.shape
    c = x.shape[-1]
    out = _ref(x, ys.reshape(b, k * p), xs.reshape(b, k * p),
               sc.reshape(b, k * p))
    return out.reshape(b, k, p, c).transpose(0, 2, 1, 3).reshape(b, p, k * c)


@pytest.mark.parametrize("h,w,c,p,k,spread", [
    (16, 16, 32, 200, 9, 1.5),    # single window
    (64, 64, 16, 700, 9, 1.5),    # windowed fast path, P pads to tile
    (64, 64, 16, 512, 9, 80.0),   # wild offsets -> per-tap sweep fallback
    (32, 32, 128, 1024, 4, 1.0),  # lane-aligned C, K != 9
])
def test_taps_fwd_matches_xla(h, w, c, p, k, spread):
    from minddet_tpu.ops.hat_sample import hat_sample_2d_taps

    x, ys, xs, sc = _rand_taps_case(2, h, w, c, p, k, spread)
    ref = _ref_taps(x, ys, xs, sc)
    got = hat_sample_2d_taps(x, ys, xs, sc, implementation="pallas",
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("spread", [1.5, 80.0])
def test_taps_grads_match_xla(spread):
    from minddet_tpu.ops.hat_sample import hat_sample_2d_taps

    x, ys, xs, sc = _rand_taps_case(2, 64, 64, 16, 500, 9, spread, seed=3)
    ys = jnp.where(jnp.abs(ys - jnp.round(ys)) < 0.05, ys + 0.1, ys)
    xs = jnp.where(jnp.abs(xs - jnp.round(xs)) < 0.05, xs + 0.1, xs)
    g = jnp.asarray(np.random.RandomState(9).randn(2, 500, 9 * 16)
                    .astype(np.float32))

    def loss(fn):
        def f(x, ys, xs, sc):
            return jnp.sum(fn(x, ys, xs, sc) * g)
        return jax.grad(f, argnums=(0, 1, 2, 3))

    dref = loss(_ref_taps)(x, ys, xs, sc)
    dgot = loss(lambda *a: hat_sample_2d_taps(
        *a, implementation="pallas", interpret=True))(x, ys, xs, sc)
    # atol 5e-2: the tap offsets put a handful of coords just past the 0.05
    # kink nudge, where hat vs corner-gather subgradients legitimately differ
    for r, got, name in zip(dref, dgot, ("dx", "dys", "dxs", "dscale")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(r), rtol=3e-2, atol=5e-2,
            err_msg=name)


def test_dcn_layer_still_matches_xla_impl():
    """deform_conv2d through the fused op vs its pure-XLA path."""
    from minddet_tpu.ops.dcn import deform_conv2d

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 16, 16, 8).astype(np.float32))
    offsets = jnp.asarray(rs.randn(2, 16, 16, 9, 2).astype(np.float32) * 0.7)
    mask = jax.nn.sigmoid(jnp.asarray(rs.randn(2, 16, 16, 9)
                                      .astype(np.float32)))
    wts = jnp.asarray(rs.randn(3, 3, 8, 12).astype(np.float32) * 0.1)
    ref = deform_conv2d(x, offsets, mask, wts, implementation="xla")
    got = deform_conv2d(x, offsets, mask, wts, implementation="pallas",
                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
