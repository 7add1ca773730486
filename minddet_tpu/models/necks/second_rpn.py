"""SECOND-style RPN: N down-blocks + N transposed-conv up-blocks, concat.

Shared by PointPillars (``pointpillars/src/pointpillars.py:367-654``: blocks
[3,5,5] convs at strides [2,2,2], upsample strides [1,2,4]) and CenterPoint
(``det3d_ms/models/necks/rpn.py:10-163``). NHWC Flax with eps=1e-3 BN to
match SECOND's convention.

TPU executable-size note: the n same-shape inner conv+BN+ReLU layers of each
block run as ONE ``lax.scan`` over stacked per-layer parameters, so XLA
compiles the block body once instead of n times. At KITTI scale this cuts the
serialized PointPillars train-step executable (whose tunnel load costs
~10 s/MB, docs/STATUS.md) without touching the parameter tree: params/BN
stats keep their per-layer ``block{i}_{j}_conv`` / ``block{i}_{j}_bn`` names
(the checkpoint-converter contract, ``utils/convert.py``) — the stacking
happens at trace time from the unchanged per-layer variables, mirroring the
fused-head trick in ``detectors/pointpillars.py:_preds_from_canvas``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from minddet_tpu.core.registry import NECKS

_BN_MOMENTUM = 0.99
_BN_EPS = 1e-3


def _stacked_lecun(key, shape, dtype=jnp.float32):
    """Per-layer lecun_normal over the leading stack axis: (n, kh, kw, c, f)
    draws each layer from the SAME distribution an unstacked ``nn.Conv``
    would (fan-in from the per-layer shape, not the stacked one)."""
    init = nn.initializers.lecun_normal()
    keys = jax.random.split(key, shape[0])
    return jnp.stack([init(k, shape[1:], dtype) for k in keys])


def _scans(scan_inner: bool, n: int, scan_min_layers: int) -> bool:
    return scan_inner and n >= max(2, scan_min_layers)


def stack_inner_variables(rpn_vars, layer_nums, scan_inner: bool = True,
                          scan_min_layers: int = 2):
    """Per-layer RPN variables -> the ``stacked_inner=True`` layout.

    ``block{i}_{j}_conv/kernel`` and ``block{i}_{j}_bn`` scale/bias/mean/var
    become ``block{i}_inner_{kernel,scale,bias,mean,var}`` stacked on a
    leading layer axis, for every block the scan predicate covers. The
    checkpoint-converter contract stays per-layer (``utils/convert.py``
    emits ``block{i}_{j}_*``); apply this to the converted ``rpn`` subtree
    when loading into a ``stacked_inner`` model. Inverse:
    :func:`unstack_inner_variables`.
    """
    params = dict(rpn_vars["params"])
    stats = dict(rpn_vars.get("batch_stats", {}))
    for bi, n in enumerate(layer_nums):
        if not _scans(scan_inner, n, scan_min_layers):
            continue
        params[f"block{bi}_inner_kernel"] = jnp.stack(
            [params.pop(f"block{bi}_{j}_conv")["kernel"] for j in range(n)])
        bns = [params.pop(f"block{bi}_{j}_bn") for j in range(n)]
        params[f"block{bi}_inner_scale"] = jnp.stack(
            [b["scale"] for b in bns])
        params[f"block{bi}_inner_bias"] = jnp.stack([b["bias"] for b in bns])
        sbns = [stats.pop(f"block{bi}_{j}_bn") for j in range(n)]
        stats[f"block{bi}_inner_mean"] = jnp.stack([b["mean"] for b in sbns])
        stats[f"block{bi}_inner_var"] = jnp.stack([b["var"] for b in sbns])
    out = dict(rpn_vars)
    out["params"] = params
    if stats or "batch_stats" in rpn_vars:
        out["batch_stats"] = stats
    return out


def unstack_inner_variables(rpn_vars, layer_nums, scan_inner: bool = True,
                            scan_min_layers: int = 2):
    """Inverse of :func:`stack_inner_variables` (stacked -> per-layer)."""
    params = dict(rpn_vars["params"])
    stats = dict(rpn_vars.get("batch_stats", {}))
    for bi, n in enumerate(layer_nums):
        if not _scans(scan_inner, n, scan_min_layers):
            continue
        ks = params.pop(f"block{bi}_inner_kernel")
        sc = params.pop(f"block{bi}_inner_scale")
        bi_ = params.pop(f"block{bi}_inner_bias")
        mu = stats.pop(f"block{bi}_inner_mean")
        va = stats.pop(f"block{bi}_inner_var")
        for j in range(n):
            params[f"block{bi}_{j}_conv"] = {"kernel": ks[j]}
            params[f"block{bi}_{j}_bn"] = {"scale": sc[j], "bias": bi_[j]}
            stats[f"block{bi}_{j}_bn"] = {"mean": mu[j], "var": va[j]}
    out = dict(rpn_vars)
    out["params"] = params
    if stats or "batch_stats" in rpn_vars:
        out["batch_stats"] = stats
    return out


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); sub-pixel (a, b) is channel block
    a*2+b (the layout ``SECONDRPN(input_space_to_depth=True)`` consumes)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h2 * 2, w2 * 2, c)


def _s2d_kernel(w: jnp.ndarray, sub_channels: Optional[int] = None
                ) -> jnp.ndarray:
    """3x3 stride-2 pad-1 conv kernel -> the equivalent 2x2 stride-1 kernel
    over a space-to-depth input.

    y[i,j] = sum_{u,v in 3x3} w[u,v] * x[2i+u-1, 2j+v-1]: row 2i+u-1 lives in
    s2d block i-1+ki at sub-offset a with u+1 = 2ki+a, so a 2x2 kernel over
    blocks (i-1+ki, j-1+kj) with padding [(1,0),(1,0)] reproduces the conv
    exactly; the 7 of 16 (ki,kj,a,b) slots with no 3x3 tap stay zero. This is
    the classic TPU space-to-depth conv transformation (usually applied to
    conv0 of image nets), built at trace time from the UNCHANGED 3x3
    parameters so checkpoints are unaffected.

    ``sub_channels`` > C zero-extends each sub-pixel block's input rows: the
    stream voxelizers scatter a throwaway 65th channel with the features
    (docs/STATUS.md), and consuming the raw 65-wide canvas here (extra rows
    multiply by zero) is much cheaper than the lane-strided 64-of-65 slice
    the detector otherwise pays (r4 trace: ~1.5 ms/step at PP bs=8).
    """
    kh, kw, c, f = w.shape
    assert (kh, kw) == (3, 3)
    sc = c if sub_channels is None else sub_channels
    assert sc >= c
    w2 = jnp.zeros((2, 2, 4, sc, f), w.dtype)
    for u in range(3):
        ki, a = divmod(u + 1, 2)
        for v in range(3):
            kj, b = divmod(v + 1, 2)
            w2 = w2.at[ki, kj, a * 2 + b, :c, :].set(w[u, v])
    return w2.reshape(2, 2, 4 * sc, f)


@jax.custom_vjp
def _batch_stats_f32(y: jnp.ndarray):
    """flax-BatchNorm batch statistics (f32 mean, biased f32 variance over
    all but the channel axis) with a custom VJP so the f32 cast of ``y`` is
    RECOMPUTED in backward instead of saved. Inside the scanned RPN body,
    autodiff would otherwise stack a full f32 copy of every layer's
    activation as a residual across the scan boundary (r4 trace:
    f32[3,8,256,256,64] stacks, ~5 ms/step at CenterPoint bs=8); here the
    residual is the bf16 ``y`` the scan already saves for the conv backward.
    """
    yf = y.astype(jnp.float32)
    bm = jnp.mean(yf, axis=tuple(range(y.ndim - 1)))
    bv = jnp.mean(jnp.square(yf), axis=tuple(range(y.ndim - 1)))
    return bm, bv - jnp.square(bm)


def _batch_stats_f32_fwd(y):
    bm, bv = _batch_stats_f32(y)
    return (bm, bv), (y, bm)


def _batch_stats_f32_bwd(res, g):
    y, bm = res
    gm, gv = g
    n = y.size // y.shape[-1]
    yf = y.astype(jnp.float32)
    gy = (gm + 2.0 * gv * (yf - bm)) / n
    return (gy.astype(y.dtype),)


_batch_stats_f32.defvjp(_batch_stats_f32_fwd, _batch_stats_f32_bwd)


@NECKS.register_module()
class SECONDRPN(nn.Module):
    """``input_space_to_depth``: the input arrives as space_to_depth(canvas)
    (B, ny/2, nx/2, 4C) and block0's stride-2 down conv runs as the
    equivalent 2x2 stride-1 conv (``_s2d_kernel``) — the canvas producer can
    then scatter straight into the halved-resolution layout and the first
    (largest-activation) conv reads lane-dense 4C channels. Parameters are
    identical either way."""

    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    num_filters: Sequence[int] = (64, 128, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    num_upsample_filters: Sequence[int] = (128, 128, 128)
    input_space_to_depth: bool = False
    scan_inner: bool = True
    # blocks with fewer inner layers than this unroll even when scanning:
    # the scan's carry forces layout agreement at block boundaries, and for
    # large-activation shallow blocks those boundary copies can cost more
    # than the executable-size saving buys (r4 A/B lever, PP_SCAN_MIN)
    scan_min_layers: int = 2
    # store scanned blocks' parameters PRE-STACKED on a leading layer axis
    # (block{i}_inner_* instead of n x block{i}_{j}_*): the scan consumes
    # them with no per-step restack and kernel grads arrive stacked with no
    # unstack — the r4 CenterPoint trace attributes ~5 ms/step to those
    # dynamic-update-slice/slice chains on UNCHANGED parameters. Checkpoint
    # layout changes; convert with stack_inner_variables /
    # unstack_inner_variables.
    stacked_inner: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        def bn(name):
            return nn.BatchNorm(momentum=_BN_MOMENTUM, epsilon=_BN_EPS,
                                dtype=self.dtype, name=name)

        down_convs, down_bns, inner, up_convs, up_bns = [], [], [], [], []
        for bi, (n, s, f, us, uf) in enumerate(
            zip(self.layer_nums, self.layer_strides, self.num_filters,
                self.upsample_strides, self.num_upsample_filters)
        ):
            down_convs.append(nn.Conv(
                f, (3, 3), (s, s), padding=1, use_bias=False,
                dtype=self.dtype, name=f"block{bi}_down_conv"))
            down_bns.append(bn(f"block{bi}_down_bn"))
            if self.stacked_inner and _scans(self.scan_inner, n,
                                             self.scan_min_layers):
                inner.append((
                    self.param(f"block{bi}_inner_kernel", _stacked_lecun,
                               (n, 3, 3, f, f)),
                    self.param(f"block{bi}_inner_scale",
                               nn.initializers.ones, (n, f)),
                    self.param(f"block{bi}_inner_bias",
                               nn.initializers.zeros, (n, f)),
                    self.variable("batch_stats", f"block{bi}_inner_mean",
                                  jnp.zeros, (n, f)),
                    self.variable("batch_stats", f"block{bi}_inner_var",
                                  jnp.ones, (n, f)),
                ))
            else:
                inner.append(tuple(
                    (nn.Conv(f, (3, 3), (1, 1), padding=1, use_bias=False,
                             dtype=self.dtype, name=f"block{bi}_{li}_conv"),
                     bn(f"block{bi}_{li}_bn"))
                    for li in range(n)
                ))
            if us >= 1:
                us_i = int(us)
                up_convs.append(nn.ConvTranspose(
                    uf, (us_i, us_i), strides=(us_i, us_i), use_bias=False,
                    dtype=self.dtype, name=f"up{bi}_deconv"))
            else:
                # fractional "upsample" stride (CenterPoint's us=0.5,
                # det3d_ms/models/necks/rpn.py:_make_layer) = stride-2 conv
                ds = int(round(1.0 / us))
                up_convs.append(nn.Conv(
                    uf, (ds, ds), (ds, ds), use_bias=False,
                    dtype=self.dtype, name=f"up{bi}_downconv"))
            up_bns.append(bn(f"up{bi}_bn"))
        self.down_convs = down_convs
        self.down_bns = down_bns
        self.inner = inner
        self.up_convs = up_convs
        self.up_bns = up_bns

    def _inner_block(self, x, layers, train: bool):
        """n x (3x3 conv s1 + BN + ReLU) via ONE scanned body.

        Per-layer storage: init (and n == 1) runs the real submodules so the
        parameter tree materializes under the standard per-layer names; the
        scan path stacks them at trace time. ``stacked_inner`` storage: the
        parameters already live stacked (no per-step restack, grads arrive
        stacked). Both scan paths reproduce flax BatchNorm's numerics (f32
        batch statistics, biased variance, normalization in ``dtype``) and
        write running-stat updates back into ``batch_stats``.
        """
        stacked = self.stacked_inner and len(layers) == 5 and not isinstance(
            layers[0], tuple)
        if stacked:
            kernel_p, scale, bias, mean_v, var_v = layers
            kernels = kernel_p.astype(self.dtype)
            r_mean, r_var = mean_v.value, var_v.value
        elif (self.is_initializing() or not self.scan_inner
                or len(layers) < max(2, self.scan_min_layers)):
            for conv, bnm in layers:
                x = nn.relu(bnm(conv(x), use_running_average=not train))
            return x
        else:
            kernels = jnp.stack(
                [c.variables["params"]["kernel"] for c, _ in layers]
            ).astype(self.dtype)
            scale = jnp.stack(
                [b.variables["params"]["scale"] for _, b in layers])
            bias = jnp.stack(
                [b.variables["params"]["bias"] for _, b in layers])
            r_mean = jnp.stack(
                [b.variables["batch_stats"]["mean"] for _, b in layers])
            r_var = jnp.stack(
                [b.variables["batch_stats"]["var"] for _, b in layers])

        def body(h, layer):
            k, sc, bi, mu, va = layer
            y = jax.lax.conv_general_dilated(
                h, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if train:
                bm, bv = _batch_stats_f32(y)
                stats = (bm, bv)
            else:
                bm, bv = mu, va
                stats = (mu, va)
            m = bm.astype(self.dtype)
            v = bv.astype(self.dtype)
            yn = (y - m) * jax.lax.rsqrt(v + jnp.asarray(_BN_EPS, v.dtype))
            yn = yn * sc.astype(self.dtype) + bi.astype(self.dtype)
            return nn.relu(yn), stats

        x, (batch_means, batch_vars) = jax.lax.scan(
            body, x, (kernels, scale, bias, r_mean, r_var))
        if train:
            new_mean = _BN_MOMENTUM * r_mean + (1 - _BN_MOMENTUM) * batch_means
            new_var = _BN_MOMENTUM * r_var + (1 - _BN_MOMENTUM) * batch_vars
            if stacked:
                if not self.is_initializing():
                    mean_v.value = new_mean
                    var_v.value = new_var
            else:
                for li, (_, bnm) in enumerate(layers):
                    bnm.put_variable("batch_stats", "mean", new_mean[li])
                    bnm.put_variable("batch_stats", "var", new_var[li])
        return x

    def __call__(self, x, train: bool = False):
        s2d = self.input_space_to_depth
        if s2d:
            assert self.layer_strides[0] == 2, "s2d needs a stride-2 block0"
            if self.is_initializing():
                # materialize block0's conv with its canonical (3,3,C,F)
                # kernel: run the normal path on the reconstructed canvas
                x = depth_to_space(x)
                s2d = False
        ups = []
        for bi in range(len(self.layer_nums)):
            if bi == 0 and s2d:
                k2 = _s2d_kernel(
                    self.down_convs[0].variables["params"]["kernel"],
                    sub_channels=x.shape[-1] // 4,
                ).astype(self.dtype)
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), k2, (1, 1), [(1, 0), (1, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            elif bi == 0 and not self.is_initializing() and x.shape[-1] > (
                self.down_convs[0].variables["params"]["kernel"].shape[2]
            ):
                # raw stream canvas with trailing throwaway channels (the
                # 65-wide scatter, docs/STATUS.md): zero-extend block0's
                # kernel input rows instead of paying the lane-strided
                # C-of-C+1 slice on the canvas
                k = self.down_convs[0].variables["params"]["kernel"]
                kp = jnp.pad(
                    k, ((0, 0), (0, 0), (0, x.shape[-1] - k.shape[2]), (0, 0))
                ).astype(self.dtype)
                s = self.layer_strides[0]
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), kp, (s, s), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            else:
                x = self.down_convs[bi](x)
            x = nn.relu(self.down_bns[bi](x, use_running_average=not train))
            x = self._inner_block(x, self.inner[bi], train)
            u = self.up_convs[bi](x)
            u = nn.relu(self.up_bns[bi](u, use_running_average=not train))
            ups.append(u)
        return jnp.concatenate(ups, axis=-1)
