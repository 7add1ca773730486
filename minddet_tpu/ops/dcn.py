"""Modulated deformable convolution (DCNv2), TPU-native.

The reference leans on Ascend's fused ``ops.deformable_conv2d`` primitive
(``centernet/src/resnet.py:75-106``), building offsets with a zero-initialized
regular conv. On TPU we decompose it as:

1. **Sampling** — all K taps' bilinear samples *and* the modulation multiply
   in one call to the fused Pallas hat-sampler
   (`minddet_tpu.ops.hat_sample.hat_sample_2d`): separable hat weights are
   built on the fly in VMEM over a per-tile row window and contracted on the
   MXU. (XLA's native gather measured ~60 ms for one 64x64x128 layer.)
2. **Contraction** — samples (B, P, K*Cin) x weights (K*Cin, Cout) as one
   large MXU matmul.

Layouts (all NHWC): x (B, H, W, Cin); offsets (B, Ho, Wo, K, 2) as (dy, dx);
mask (B, Ho, Wo, K) already sigmoid-ed; weights (kh, kw, Cin, Cout).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from minddet_tpu.ops.hat_sample import hat_sample_2d, hat_sample_2d_taps


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    weights: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    implementation: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Modulated deformable conv. Returns (B, Ho, Wo, Cout).

    ``offsets``/``mask`` come from a plain conv over x (zero-initialized so the
    op starts as a regular conv with 0.5 modulation, exactly like the
    reference's ``conv_offset`` with weight_init="Zero", resnet.py:58-68).
    """
    b, h, w, cin = x.shape
    kh, kw, wcin, cout = weights.shape
    assert wcin == cin, f"weight Cin {wcin} != input Cin {cin}"
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1
    k = kh * kw
    p = ho * wo

    # sample coordinates, position-major layout (B, P, K): base output grid
    # * stride - pad + tap offset + learned offset
    oy = (jnp.arange(ho, dtype=jnp.float32) * stride - padding)[:, None]
    ox = (jnp.arange(wo, dtype=jnp.float32) * stride - padding)[None, :]
    tap_dy = (jnp.arange(k, dtype=jnp.float32) // kw).reshape(1, 1, k)
    tap_dx = (jnp.arange(k, dtype=jnp.float32) % kw).reshape(1, 1, k)
    base_y = jnp.broadcast_to(oy, (ho, wo)).reshape(1, p, 1) + tap_dy  # (1,P,K)
    base_x = jnp.broadcast_to(ox, (ho, wo)).reshape(1, p, 1) + tap_dx

    offs = offsets.reshape(b, p, k, 2)
    wmat = weights.reshape(k * cin, cout)

    if cin % 128 == 0 or interpret:
        # tap-grouped sampler: coords (B, K, P), samples emitted directly in
        # the (B, P, K*Cin) layout the weight matmul consumes — no relayout
        # between the kernel and the contraction, fwd or bwd (the flat
        # sampler's (B, P*K, Cin) -> (B, P, K*Cin) reshapes were ~5 ms/step
        # of the CenterNet bs16 train step)
        ys = jnp.swapaxes(base_y + offs[..., 0], 1, 2)  # (B, K, P)
        xs = jnp.swapaxes(base_x + offs[..., 1], 1, 2)
        scale = jnp.swapaxes(mask.reshape(b, p, k), 1, 2) \
            if mask is not None else None
        samp = hat_sample_2d_taps(x, ys, xs, scale, implementation,
                                  interpret=interpret)  # (B, P, K*Cin)
    else:
        # fused sample*modulate in one kernel (hat_sample.py) — the unfused
        # (B, P, K, Cin) mask multiply was one of the largest HBM costs in
        # the CenterNet train step before folding it in
        ys = (base_y + offs[..., 0]).reshape(b, p * k)
        xs = (base_x + offs[..., 1]).reshape(b, p * k)
        scale = mask.reshape(b, p * k) if mask is not None else None
        samp = hat_sample_2d(x, ys, xs, scale, implementation,
                             interpret=interpret)  # (B, P*K, Cin)
        samp = samp.reshape(b, p, k * cin)

    # dtype follows the caller (the model passes bf16 weights/activations)
    out = jnp.dot(
        samp.astype(weights.dtype),
        wmat,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out.reshape(b, ho, wo, cout).astype(x.dtype)


def dcn_sampling_grid_shapes(
    h: int, w: int, kernel: int = 3, stride: int = 1, padding: int = 1
) -> Tuple[int, int, int]:
    """(Ho, Wo, K) helper for offset/mask head sizing."""
    ho = (h + 2 * padding - kernel) // stride + 1
    wo = (w + 2 * padding - kernel) // stride + 1
    return ho, wo, kernel * kernel
