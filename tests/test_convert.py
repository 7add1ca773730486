"""Checkpoint conversion: torch -> flax numeric parity on real modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from minddet_tpu.utils.convert import (
    apply_converted,
    convert_resnet_backbone,
    convert_state_dict,
    report_mismatches,
)


def test_conv_bn_linear_parity():
    """A torch conv->bn->relu->linear pipeline must produce identical outputs
    after conversion into an equivalent flax module."""
    import flax.linen as nn
    import torch.nn as tnn

    tmodel = tnn.Sequential()
    tmodel.add_module("conv", tnn.Conv2d(3, 8, 3, padding=1))
    tmodel.add_module("bn", tnn.BatchNorm2d(8))
    tmodel.eval()
    with torch.no_grad():
        tmodel.bn.running_mean.uniform_(-1, 1)
        tmodel.bn.running_var.uniform_(0.5, 2)
        tmodel.bn.weight.uniform_(0.5, 1.5)
        tmodel.bn.bias.uniform_(-0.5, 0.5)
    head = tnn.Linear(8, 4)

    class FlaxNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding=1, name="conv")(x)
            x = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                             name="bn")(x)
            x = x.mean(axis=(1, 2))
            return nn.Dense(4, name="head")(x)

    sd = {**{f"{k}": v for k, v in tmodel.state_dict().items()},
          **{f"head.{k}": v for k, v in head.state_dict().items()}}
    converted = convert_state_dict(sd, rename_rules=[])

    fmodel = FlaxNet()
    x = np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    rep = report_mismatches(converted["params"], variables["params"])
    assert not rep["missing"] and not rep["shape_mismatch"], rep
    loaded = apply_converted(variables, converted, strict=True)

    got = np.asarray(fmodel.apply(loaded, jnp.asarray(x)))
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ty = tmodel(tx).mean(dim=(2, 3))
        expect = head(ty).numpy()
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_resnet18_backbone_conversion_runs():
    """torchvision-style resnet18 state_dict loads into our ResNet (no DCN)."""
    import torch.nn as tnn

    from minddet_tpu.models.backbones.resnet import ResNet

    # build a torch resnet18-shaped state dict without torchvision
    def conv(cout, cin, k):
        return torch.randn(cout, cin, k, k) * 0.05

    sd = {"conv1.weight": conv(64, 3, 7)}
    for leaf in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{leaf}"] = torch.rand(64)
    widths = [64, 128, 256, 512]
    cin = 64
    for li, w in enumerate(widths, start=1):
        for bi in range(2):
            stride_in = cin if bi == 0 else w
            sd[f"layer{li}.{bi}.conv1.weight"] = conv(w, stride_in, 3)
            sd[f"layer{li}.{bi}.conv2.weight"] = conv(w, w, 3)
            for bn in ("bn1", "bn2"):
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"layer{li}.{bi}.{bn}.{leaf}"] = torch.rand(w)
            if bi == 0 and li > 1:
                sd[f"layer{li}.0.downsample.0.weight"] = conv(w, cin, 1)
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"layer{li}.0.downsample.1.{leaf}"] = torch.rand(w)
        cin = w

    converted = convert_resnet_backbone(sd)
    model = ResNet(depth=18)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rep = report_mismatches(converted["params"], variables["params"])
    assert not rep["missing"], rep["missing"][:5]
    assert not rep["shape_mismatch"], rep["shape_mismatch"][:5]
    loaded = apply_converted(variables, converted)
    out = model.apply(loaded, jnp.zeros((1, 64, 64, 3)))
    assert out[-1].shape == (1, 2, 2, 512)
