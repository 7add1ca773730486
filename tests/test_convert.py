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


# ---------------------------------------------------------------------------
# PointPillars / CenterPoint rename tables: numeric parity against torch
# mirrors built with the SOURCE repos' module naming (second.pytorch / det3d)
# ---------------------------------------------------------------------------

def _torch_second_rpn(in_ch, layer_nums, strides, filters, up_strides,
                      up_filters, seed=0):
    """torch mirror of second.pytorch's RPN Sequential layout
    (pointpillars/src/pointpillars.py:367-470): blocks =
    [ZeroPad2d, Conv2d(stride), BN, ReLU, (Conv2d, BN, ReLU)*n],
    deblocks = [ConvTranspose2d(k=s), BN, ReLU]."""
    import torch.nn as tnn

    torch.manual_seed(seed)
    blocks, deblocks = [], []
    cin = in_ch
    for n, s, f, us, uf in zip(layer_nums, strides, filters, up_strides,
                               up_filters):
        mods = [tnn.ZeroPad2d(1), tnn.Conv2d(cin, f, 3, stride=s, bias=False),
                tnn.BatchNorm2d(f, eps=1e-3), tnn.ReLU()]
        for _ in range(n):
            mods += [tnn.Conv2d(f, f, 3, padding=1, bias=False),
                     tnn.BatchNorm2d(f, eps=1e-3), tnn.ReLU()]
        blocks.append(tnn.Sequential(*mods))
        deblocks.append(tnn.Sequential(
            tnn.ConvTranspose2d(f, uf, us, stride=us, bias=False),
            tnn.BatchNorm2d(uf, eps=1e-3), tnn.ReLU()))
        cin = f

    class RPN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.blocks = tnn.ModuleList(blocks)
            self.deblocks = tnn.ModuleList(deblocks)

        def forward(self, x):
            ups = []
            for b, d in zip(self.blocks, self.deblocks):
                x = b(x)
                ups.append(d(x))
            return torch.cat(ups, dim=1)

    rpn = RPN().eval()
    with torch.no_grad():  # randomize BN stats to catch mean/var routing
        for m in rpn.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
    return rpn


def test_pointpillars_rpn_conversion_parity():
    """POINTPILLARS_RULES reproduce torch numerics bit-close through the full
    SECOND RPN (incl. the flipped transposed-conv kernels)."""
    from minddet_tpu.models.necks.second_rpn import SECONDRPN
    from minddet_tpu.utils.convert import convert_pointpillars

    cfg = dict(layer_nums=(2, 2), strides=(2, 2), filters=(16, 32),
               up_strides=(1, 2), up_filters=(16, 16))
    trpn = _torch_second_rpn(8, **cfg)
    sd = {f"rpn.{k}": v for k, v in trpn.state_dict().items()}
    converted = convert_pointpillars(sd)

    frpn = SECONDRPN(layer_nums=cfg["layer_nums"], layer_strides=cfg["strides"],
                     num_filters=cfg["filters"],
                     upsample_strides=cfg["up_strides"],
                     num_upsample_filters=cfg["up_filters"])
    x = np.random.RandomState(1).randn(2, 16, 16, 8).astype(np.float32)
    variables = frpn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    rep = report_mismatches(converted["params"]["rpn"], variables["params"])
    assert not rep["missing"] and not rep["shape_mismatch"], rep
    loaded = apply_converted(
        variables,
        {"params": converted["params"]["rpn"],
         "batch_stats": converted["batch_stats"]["rpn"]},
        strict=True,
    )
    got = np.asarray(frpn.apply(loaded, jnp.asarray(x)))
    with torch.no_grad():
        expect = trpn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        got, expect.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


def test_centerpoint_head_conversion_parity():
    """CENTERPOINT_RULES map det3d's shared_conv + per-task SepHead naming
    onto our CenterHead with numeric parity."""
    import torch.nn as tnn

    from minddet_tpu.models.heads.center_head import CenterHead
    from minddet_tpu.utils.convert import convert_centerpoint

    torch.manual_seed(3)
    branches = ("reg", "height", "dim", "rot", "vel", "hm")
    out_ch = {"reg": 2, "height": 1, "dim": 3, "rot": 2, "vel": 2}

    class Task(tnn.Module):
        def __init__(self, ncls):
            super().__init__()
            for b in branches:
                oc = out_ch.get(b, ncls)
                setattr(self, b, tnn.Sequential(
                    tnn.Conv2d(64, 64, 3, padding=1), tnn.BatchNorm2d(64),
                    tnn.ReLU(), tnn.Conv2d(64, oc, 3, padding=1)))

        def forward(self, x):
            return {b: getattr(self, b)(x) for b in branches}

    class Head(tnn.Module):
        def __init__(self, task_classes):
            super().__init__()
            self.shared_conv = tnn.Sequential(
                tnn.Conv2d(24, 64, 3, padding=1), tnn.BatchNorm2d(64),
                tnn.ReLU())
            self.tasks = tnn.ModuleList([Task(n) for n in task_classes])

        def forward(self, x):
            x = self.shared_conv(x)
            return [t(x) for t in self.tasks]

    th = Head((1, 2)).eval()
    with torch.no_grad():
        for m in th.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    sd = {f"bbox_head.{k}": v for k, v in th.state_dict().items()}
    converted = convert_centerpoint(sd)

    fhead = CenterHead(task_num_classes=(1, 2))
    x = np.random.RandomState(2).randn(1, 8, 8, 24).astype(np.float32)
    variables = fhead.init(jax.random.PRNGKey(0), jnp.asarray(x))
    rep = report_mismatches(converted["params"]["head"], variables["params"])
    assert not rep["missing"] and not rep["shape_mismatch"], rep
    loaded = apply_converted(
        variables,
        {"params": converted["params"]["head"],
         "batch_stats": converted["batch_stats"]["head"]},
        strict=True,
    )
    got = fhead.apply(loaded, jnp.asarray(x))
    with torch.no_grad():
        expect = th(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for t in range(2):
        for b in branches:
            np.testing.assert_allclose(
                np.asarray(got[t][b]),
                expect[t][b].numpy().transpose(0, 2, 3, 1),
                rtol=1e-4, atol=1e-4, err_msg=f"task{t}/{b}",
            )


def _fake_bn(sd, name, c):
    for leaf, val in (("weight", np.random.rand(c)),
                      ("bias", np.random.rand(c)),
                      ("running_mean", np.random.rand(c)),
                      ("running_var", np.random.rand(c) + 0.5)):
        sd[f"{name}.{leaf}"] = val.astype(np.float32)


def test_pointpillars_rule_coverage_against_model():
    """Every parameter scope of the real PointPillars model is reachable from
    a second.pytorch-style name (VERDICT r1 Missing #5)."""
    from minddet_tpu.models.detectors.pointpillars import PointPillars
    from minddet_tpu.utils.convert import convert_pointpillars

    sd = {}
    sd["voxel_feature_extractor.pfn_layers.0.linear.weight"] = \
        np.random.randn(64, 9).astype(np.float32)
    _fake_bn(sd, "voxel_feature_extractor.pfn_layers.0.norm", 64)
    cin = 64
    for bi, (n, f) in enumerate(zip((3, 5, 5), (64, 128, 256))):
        sd[f"rpn.blocks.{bi}.1.weight"] = \
            np.random.randn(f, cin, 3, 3).astype(np.float32)
        _fake_bn(sd, f"rpn.blocks.{bi}.2", f)
        for j in range(n):
            sd[f"rpn.blocks.{bi}.{4 + 3 * j}.weight"] = \
                np.random.randn(f, f, 3, 3).astype(np.float32)
            _fake_bn(sd, f"rpn.blocks.{bi}.{5 + 3 * j}", f)
        cin = f
    for bi, (us, f) in enumerate(zip((1, 2, 4), (64, 128, 256))):
        sd[f"rpn.deblocks.{bi}.0.weight"] = \
            np.random.randn(f, 128, us, us).astype(np.float32)
        _fake_bn(sd, f"rpn.deblocks.{bi}.1", 128)
    for head, c in (("conv_cls", 2), ("conv_box", 14), ("conv_dir_cls", 4)):
        sd[f"rpn.{head}.weight"] = np.random.randn(c, 384, 1, 1).astype(np.float32)
        sd[f"rpn.{head}.bias"] = np.random.randn(c).astype(np.float32)

    converted = convert_pointpillars(sd)
    model = PointPillars(num_classes=1)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 4, 4)),
        jnp.ones((1, 64), jnp.int32), jnp.zeros((1, 64, 3), jnp.int32),
    )
    for col in ("params", "batch_stats"):
        rep = report_mismatches(converted[col], variables[col])
        assert not rep["missing"], (col, rep["missing"][:8])
        assert not rep["unexpected"], (col, rep["unexpected"][:8])
        assert not rep["shape_mismatch"], (col, rep["shape_mismatch"][:8])


def test_centerpoint_rule_coverage_against_model():
    """Every parameter scope of the real CenterPoint model (6-task nuScenes
    config incl. the fractional up0 down-conv) is reachable from a det3d-style
    name (reference point_pillars.py:137-168 map)."""
    from minddet_tpu.models.detectors.centerpoint import CenterPoint
    from minddet_tpu.utils.convert import convert_centerpoint

    sd = {}
    # two-PFN reader: the non-final layer halves its units and concats the
    # max (det3d PFNLayer last_layer=False -> 64//2=32 units); in = 10
    # features (5 raw + 3 cluster + 2 center)
    for i, (cin, cout) in enumerate(((10, 32), (64, 64))):
        sd[f"reader.pfn_layers.{i}.linear.weight"] = \
            np.random.randn(cout, cin).astype(np.float32)
        _fake_bn(sd, f"reader.pfn_layers.{i}.norm", cout)
    cin = 64
    for bi, (n, f) in enumerate(zip((3, 5, 5), (64, 128, 256))):
        sd[f"neck.blocks.{bi}.1.weight"] = \
            np.random.randn(f, cin, 3, 3).astype(np.float32)
        _fake_bn(sd, f"neck.blocks.{bi}.2", f)
        for j in range(n):
            sd[f"neck.blocks.{bi}.{4 + 3 * j}.weight"] = \
                np.random.randn(f, f, 3, 3).astype(np.float32)
            _fake_bn(sd, f"neck.blocks.{bi}.{5 + 3 * j}", f)
        cin = f
    # deblock 0: fractional 0.5 stride -> Conv2d(64, 128, 2, stride=2)
    sd["neck.deblocks.0.0.weight"] = np.random.randn(128, 64, 2, 2).astype(np.float32)
    _fake_bn(sd, "neck.deblocks.0.1", 128)
    # upsample strides (0.5, 1, 2): deblocks 1 and 2 are deconvs k=s=1 and 2
    for bi, (us, f) in enumerate(zip((1, 2), (128, 256)), start=1):
        sd[f"neck.deblocks.{bi}.0.weight"] = \
            np.random.randn(f, 128, us, us).astype(np.float32)
        _fake_bn(sd, f"neck.deblocks.{bi}.1", 128)
    sd["bbox_head.shared_conv.0.weight"] = \
        np.random.randn(64, 384, 3, 3).astype(np.float32)
    sd["bbox_head.shared_conv.0.bias"] = np.random.randn(64).astype(np.float32)
    _fake_bn(sd, "bbox_head.shared_conv.1", 64)
    out_ch = {"reg": 2, "height": 1, "dim": 3, "rot": 2, "vel": 2}
    for t, ncls in enumerate((1, 2, 2, 1, 2, 2)):
        for b in ("reg", "height", "dim", "rot", "vel", "hm"):
            oc = out_ch.get(b, ncls)
            sd[f"bbox_head.tasks.{t}.{b}.0.weight"] = \
                np.random.randn(64, 64, 3, 3).astype(np.float32)
            sd[f"bbox_head.tasks.{t}.{b}.0.bias"] = \
                np.random.randn(64).astype(np.float32)
            _fake_bn(sd, f"bbox_head.tasks.{t}.{b}.1", 64)
            sd[f"bbox_head.tasks.{t}.{b}.3.weight"] = \
                np.random.randn(oc, 64, 3, 3).astype(np.float32)
            sd[f"bbox_head.tasks.{t}.{b}.3.bias"] = \
                np.random.randn(oc).astype(np.float32)

    converted = convert_centerpoint(sd)
    model = CenterPoint()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 4, 5)),
        jnp.ones((1, 64), jnp.int32), jnp.zeros((1, 64, 3), jnp.int32),
    )
    for col in ("params", "batch_stats"):
        rep = report_mismatches(converted[col], variables[col])
        assert not rep["missing"], (col, rep["missing"][:8])
        assert not rep["unexpected"], (col, rep["unexpected"][:8])
        assert not rep["shape_mismatch"], (col, rep["shape_mismatch"][:8])
