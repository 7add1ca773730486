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


def test_centernet_rename_rules():
    from minddet_tpu.utils.convert import CENTERNET_RULES
    import re

    def apply(path):
        for pat, repl in CENTERNET_RULES:
            path = re.sub(pat, repl, path)
        return path

    cases = {
        "conv1": "backbone.conv1",
        "backbone.layer2.0.conv2": "backbone.layer2_0.conv2",
        "layer3.1.downsample.0": "backbone.layer3_1.downsample_conv",
        "deconv_layers.0.conv_offset_mask": "neck.deconv0.dcn.conv_offset",
        "deconv_layers.0": "neck.deconv0.dcn",
        "deconv_layers.9": "neck.deconv1.up",
        "deconv_layers.13": "neck.deconv2.BatchNorm_0",
        "hm.2": "head.hm.out",
        "reg.0": "head.reg.conv",
    }
    for src, want in cases.items():
        assert apply(src) == want, (src, apply(src), want)


def test_centernet_rule_coverage_against_model():
    """Every param scope of our CenterNet must be REACHABLE from some torch
    name under the rules (checks rule table completeness structurally)."""
    import re

    import jax
    import jax.numpy as jnp

    from minddet_tpu.models.detectors.centernet import CenterNet
    from minddet_tpu.utils.convert import CENTERNET_RULES, tree_paths

    model = CenterNet(num_classes=4, depth=18, dcn=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    scopes = {p.rsplit("/", 1)[0].replace("/", ".") for p in tree_paths(variables["params"])}

    # generate the torch-side module names our rules are meant to cover
    torch_names = ["conv1", "bn1"]
    blocks = {1: 2, 2: 2, 3: 2, 4: 2}
    for li, n in blocks.items():
        for bi in range(n):
            torch_names += [f"layer{li}.{bi}.conv1", f"layer{li}.{bi}.bn1",
                            f"layer{li}.{bi}.conv2", f"layer{li}.{bi}.bn2"]
            if bi == 0 and li > 1:
                torch_names += [f"layer{li}.0.downsample.0", f"layer{li}.0.downsample.1"]
            if li > 1:  # dcn stages have conv_offset too
                torch_names += [f"layer{li}.{bi}.conv2.conv_offset_mask"]
    for g in range(3):
        b = g * 6
        torch_names += [f"deconv_layers.{b}", f"deconv_layers.{b}.conv_offset_mask",
                        f"deconv_layers.{b+1}", f"deconv_layers.{b+3}", f"deconv_layers.{b+4}"]
    for h in ("hm", "wh", "reg"):
        torch_names += [f"{h}.0", f"{h}.2"]

    def apply(path):
        for pat, repl in CENTERNET_RULES:
            path = re.sub(pat, repl, path)
        return path

    mapped = {apply(n) for n in torch_names}
    uncovered = scopes - mapped
    assert not uncovered, sorted(uncovered)[:8]


def test_dcn_offset_permutation():
    from minddet_tpu.utils.convert import permute_dcn_offset_channels

    k = 9
    # label channels: y-block 0..8, x-block 100..108, mask 200..208
    src = np.concatenate([np.arange(9), 100 + np.arange(9), 200 + np.arange(9)])
    out = permute_dcn_offset_channels(src.astype(np.float32))
    # interleaved (y_t, x_t) pairs then masks
    assert list(out[:6]) == [0, 100, 1, 101, 2, 102]
    assert list(out[-3:]) == [206, 207, 208]
    w = np.zeros((3, 3, 4, 27), np.float32) + src  # HWIO broadcast on O
    wo = permute_dcn_offset_channels(w)
    assert wo.shape == w.shape and wo[0, 0, 0, 1] == 100


def test_ema_optimizer():
    import jax
    import jax.numpy as jnp

    from minddet_tpu.core.optim import adamw, get_ema_params, with_ema

    tx = with_ema(adamw(0.1), decay=0.5)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4,))}
    for _ in range(5):
        updates, state = tx.update(grads, state, params)
        import optax

        params = optax.apply_updates(params, updates)
    ema = get_ema_params(state)
    assert ema is not None
    # EMA must lag the raw update trajectory
    assert float(jnp.abs(ema["w"] - params["w"]).max()) > 1e-6
