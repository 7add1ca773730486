"""Eval-mode Bottleneck-chain scan == per-block module application.

The scan path (ResNet._scan_bottlenecks) exists to compile each stage body
once (TPU executable size); it must be numerically identical to running the
real Bottleneck modules block by block with the same variables.
"""

import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.models.backbones.resnet import Bottleneck, ResNet


def test_r50_scan_matches_per_block():
    model = ResNet(depth=50)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = model.init(rng, x, train=False)
    # perturb running stats away from init (mean 0 / var 1) so the BN eval
    # math is actually exercised
    _, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}

    outs = model.apply(variables, x, train=False)  # scan path for stages

    # reference: stem + every block applied as its own module
    p, bs = variables["params"], variables["batch_stats"]
    h = jnp.asarray(x)
    import flax.linen as nn

    h = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                name="conv1").apply({"params": p["conv1"]}, h)
    h = nn.BatchNorm(momentum=0.9, name="bn1").apply(
        {"params": p["bn1"], "batch_stats": bs["bn1"]}, h,
        use_running_average=True)
    h = nn.relu(h)
    h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    widths = (64, 128, 256, 512)
    layers = (3, 4, 6, 3)
    expected = []
    for stage, (w, n) in enumerate(zip(widths, layers)):
        for i in range(n):
            strides = 2 if (stage > 0 and i == 0) else 1
            name = f"layer{stage + 1}_{i}"
            blk = Bottleneck(w, strides=strides)
            h = blk.apply({"params": p[name], "batch_stats": bs[name]},
                          h, train=False)
        expected.append(h)

    for got, want in zip(outs, expected):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


def test_r18_forward_unchanged_shapes():
    model = ResNet(depth=18, dcn_stages=(False, True, True, True))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    assert tuple(o.shape[-1] for o in outs) == (64, 128, 256, 512)
    assert tuple(o.shape[1] for o in outs) == (16, 8, 4, 2)
