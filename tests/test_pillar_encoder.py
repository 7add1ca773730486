"""MaskedBatchNorm numerics: masked statistics + folded affine (fast lane).

Pins the single-pass E[x^2]-E[x]^2 formulation (the round-3 HBM-traffic
rewrite) against a two-pass numpy reference over valid positions only.
"""

import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.models.readers.pillar_encoder import MaskedBatchNorm


def test_masked_bn_train_stats_and_output():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 50, 8, 16).astype(np.float32) * 3.0 + 1.5
    mask = rng.rand(2, 50, 8) < 0.6
    x[~mask] = 99.0  # padded garbage must not leak into the statistics

    bn = MaskedBatchNorm(momentum=0.9)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(mask), train=True)
    y, updated = bn.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                          train=True, mutable=["batch_stats"])

    valid = x[mask]  # (N, 16)
    mean = valid.mean(0)
    var = valid.var(0)
    expect = (x - mean) / np.sqrt(var + 1e-3)
    np.testing.assert_allclose(np.asarray(y)[mask], expect[mask],
                               rtol=2e-4, atol=2e-4)
    # running stats updated toward the masked batch stats
    rm = np.asarray(updated["batch_stats"]["mean"])
    rv = np.asarray(updated["batch_stats"]["var"])
    np.testing.assert_allclose(rm, 0.1 * mean, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(rv, 0.9 * 1.0 + 0.1 * var, rtol=1e-3,
                               atol=1e-3)

    # eval mode uses the running stats (folded affine)
    y2 = bn.apply({"params": variables["params"],
                   "batch_stats": updated["batch_stats"]},
                  jnp.asarray(x), jnp.asarray(mask), train=False)
    expect2 = (x - rm) / np.sqrt(rv + 1e-3)
    np.testing.assert_allclose(np.asarray(y2), expect2, rtol=2e-4, atol=2e-4)


def test_masked_bn_bf16_accumulates_in_f32():
    """bf16 inputs: statistics accumulate in f32 (no catastrophic loss)."""
    rng = np.random.RandomState(1)
    x = (rng.randn(4, 2000, 4, 8) * 0.5).astype(np.float32)
    mask = np.ones((4, 2000, 4), bool)
    bn = MaskedBatchNorm(dtype=jnp.bfloat16)
    xb = jnp.asarray(x, jnp.bfloat16)
    variables = bn.init(jax.random.PRNGKey(0), xb, jnp.asarray(mask), train=True)
    _, updated = bn.apply(variables, xb, jnp.asarray(mask), train=True,
                          mutable=["batch_stats"])
    rm = np.asarray(updated["batch_stats"]["mean"])
    # momentum 0.99 -> running mean moved 1% toward the batch mean
    np.testing.assert_allclose(rm, 0.01 * x.reshape(-1, 8).mean(0),
                               atol=5e-4)
