"""Pallas bounded segmented full-max vs the XLA shift-level reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddet_tpu.ops.seg_pallas import seg_full_max_bounded
from minddet_tpu.ops.voxelize import _seg_bcast_bounded, seg_running_max


def _random_stream(rng, b, n, bound, c=8, dtype=np.float32):
    """Sorted-stream style segments: random lengths 1..bound, tail padding
    as its own flagged segments (mirrors the voxelizer's padded rows)."""
    first = np.zeros((b, n), bool)
    last = np.zeros((b, n), bool)
    for bi in range(b):
        i = 0
        while i < n:
            ln = int(rng.randint(1, bound + 1))
            ln = min(ln, n - i)
            first[bi, i] = True
            last[bi, i + ln - 1] = True
            i += ln
    x = rng.randn(b, n, c).astype(dtype)
    # inject ties (ReLU-zero-like plateaus)
    x[rng.rand(b, n, c) < 0.3] = 0.0
    return first, last, x


def _xla_ref(first, last, x, bound):
    m = seg_running_max(jnp.asarray(first), jnp.asarray(x), axis=1,
                        bound=bound)
    return _seg_bcast_bounded(jnp.asarray(last), m, bound, axis=1)


@pytest.mark.parametrize("n,tn", [(512, 128), (1000, 256)])
def test_fwd_matches_xla_reference(n, tn):
    rng = np.random.RandomState(0)
    bound = 6
    first, last, x = _random_stream(rng, 2, n, bound)
    ref = np.asarray(_xla_ref(first, last, x, bound))
    out = np.asarray(seg_full_max_bounded(
        jnp.asarray(first), jnp.asarray(last), jnp.asarray(x), bound,
        block_rows=tn, interpret=True))
    # compare only rows whose segment-last is within reach (all rows here:
    # segments are <= bound long by construction)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_fwd_bf16_and_unaligned_tail():
    rng = np.random.RandomState(1)
    bound = 20
    first, last, x = _random_stream(rng, 2, 900, bound, c=64,
                                    dtype=np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    ref = np.asarray(_xla_ref(first, last, xb, bound)).astype(np.float32)
    out = np.asarray(seg_full_max_bounded(
        jnp.asarray(first), jnp.asarray(last), xb, bound,
        block_rows=256, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)


def test_grad_reduce_max_convention():
    """dx matches jnp.max's segment-wise gradient: per segment, the upstream
    grads SUM over rows and split evenly across argmax ties."""
    rng = np.random.RandomState(2)
    bound = 4
    first, last, x = _random_stream(rng, 1, 64, bound, c=3)

    def f(xx):
        out = seg_full_max_bounded(
            jnp.asarray(first), jnp.asarray(last), xx, bound,
            block_rows=16, interpret=True)
        return jnp.sum(out * w)

    w = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    dx = np.asarray(jax.grad(f)(jnp.asarray(x)))

    # brute-force expected gradient
    exp = np.zeros_like(x)
    bi = 0
    starts = np.where(first[bi])[0]
    ends = list(starts[1:]) + [x.shape[1]]
    wnp = np.asarray(w)
    for s, e in zip(starts, ends):
        seg = x[bi, s:e]
        gsum = wnp[bi, s:e].sum(0)
        mx = seg.max(0)
        for ci in range(x.shape[-1]):
            ties = np.where(seg[:, ci] == mx[ci])[0]
            exp[bi, s + ties, ci] = gsum[ci] / len(ties)
    np.testing.assert_allclose(dx, exp, rtol=1e-5, atol=1e-6)


def test_grad_total_conservation_large():
    """Gradient mass is conserved per (segment, channel) on a big stream."""
    rng = np.random.RandomState(3)
    bound = 20
    first, last, x = _random_stream(rng, 2, 2000, bound, c=16)

    def f(xx):
        return jnp.sum(seg_full_max_bounded(
            jnp.asarray(first), jnp.asarray(last), xx, bound,
            block_rows=512, interpret=True))

    dx = np.asarray(jax.grad(f)(jnp.asarray(x)))
    # each segment contributes exactly (rows_in_segment) per channel
    for bi in range(2):
        starts = np.where(first[bi])[0]
        ends = list(starts[1:]) + [x.shape[1]]
        for s, e in zip(starts, ends):
            np.testing.assert_allclose(
                dx[bi, s:e].sum(0), float(e - s), rtol=1e-5)


def test_xla_fallback_path():
    """Small streams route to the XLA form (identical results by calling
    through the public entry with default implementation)."""
    rng = np.random.RandomState(4)
    first, last, x = _random_stream(rng, 1, 100, 6)
    out = np.asarray(seg_full_max_bounded(
        jnp.asarray(first), jnp.asarray(last), jnp.asarray(x), 6,
        block_rows=4096))
    ref = np.asarray(_xla_ref(first, last, x, 6))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
