"""Detection losses, shared across the zoo.

Unifies the reference's three loss libraries: CenterNet focal/gather-L1
(``centernet/src/utils.py:160-245``), PointPillars' weighted sigmoid-focal /
smooth-L1 / softmax (``pointpillars/src/core/losses.py``), and CenterPoint's
FastFocal/RegLoss (``det3d_ms/models/losses/centernet_loss.py``). All take
explicit masks, never dynamic shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from minddet_tpu.core.registry import LOSSES
from minddet_tpu.ops.decode import gather_feature


def sigmoid_clip(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Sigmoid clamped away from {0, 1} so log() is safe.

    Reference: ``utils.py:Sigmoid.construct`` (clip to [1e-4, 1 - 1e-4]).
    """
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


@LOSSES.register_module()
def centernet_focal_loss(
    pred: jnp.ndarray, target: jnp.ndarray, alpha: float = 2.0, beta: float = 4.0
) -> jnp.ndarray:
    """Penalty-reduced pixelwise focal loss on an already-sigmoided heatmap.

    Positives are pixels where target == 1; all others are negatives weighted
    by (1-target)^beta. Normalized by the positive count (min 1). Exact
    semantics of ``utils.py:FocalLoss:160-208``.
    """
    pos = (target == 1.0).astype(jnp.float32)
    neg = (target < 1.0).astype(jnp.float32)
    neg_weights = jnp.power(1.0 - target, beta)
    pred = pred.astype(jnp.float32)
    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, alpha) * pos
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, alpha) * neg_weights * neg
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return -(jnp.sum(pos_loss) + jnp.sum(neg_loss)) / num_pos


@LOSSES.register_module()
def gather_reg_loss(
    output: jnp.ndarray,
    mask: jnp.ndarray,
    ind: jnp.ndarray,
    target: jnp.ndarray,
    mode: str = "l1",
) -> jnp.ndarray:
    """Masked regression loss at gathered object centers.

    output: (B, H, W, C) dense head; ind: (B, O) flat H*W indices;
    mask: (B, O) validity; target: (B, O, C). Sum-L1 divided by
    2 * num_valid, matching ``utils.py:RegLoss:210-245`` (including its
    "num = sum(mask) * 2" quirk).
    """
    pred = gather_feature(output, ind).astype(jnp.float32)  # (B, O, C)
    mask = mask.astype(jnp.float32)
    num = jnp.sum(mask) * 2.0
    m = mask[..., None]
    diff = (pred - target.astype(jnp.float32)) * m
    if mode == "l1":
        loss = jnp.sum(jnp.abs(diff))
    elif mode == "sl1":
        absd = jnp.abs(diff)
        loss = jnp.sum(jnp.where(absd < 1.0, 0.5 * diff * diff, absd - 0.5))
    else:
        raise ValueError(f"mode must be l1/sl1, got {mode}")
    return loss / (num + 1e-4)


@LOSSES.register_module()
def fast_focal_loss(
    pred_hm: jnp.ndarray,
    target_hm: jnp.ndarray,
    ind: jnp.ndarray,
    mask: jnp.ndarray,
    cat: jnp.ndarray,
) -> jnp.ndarray:
    """CenterPoint's gather-based focal loss: positives only at object centers.

    pred_hm: (B, H, W, C) sigmoided; ind: (B, O) flat positions; cat: (B, O)
    class ids; mask: (B, O). Reference:
    ``det3d_ms/models/losses/centernet_loss.py:FastFocalLoss:48``.
    """
    pred_hm = pred_hm.astype(jnp.float32)
    neg_loss = jnp.log(1.0 - pred_hm) * jnp.power(pred_hm, 2.0) * jnp.power(
        1.0 - target_hm, 4.0
    )
    neg_loss = jnp.sum(neg_loss)

    pos_pred_all = gather_feature(pred_hm, ind)  # (B, O, C)
    pos_pred = jnp.take_along_axis(pos_pred_all, cat[..., None], axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    pos_loss = jnp.sum(jnp.log(pos_pred) * jnp.power(1.0 - pos_pred, 2.0) * m)
    num_pos = jnp.maximum(jnp.sum(m), 1.0)
    return -(pos_loss + neg_loss) / num_pos


@LOSSES.register_module()
def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Per-anchor sigmoid focal loss (RetinaNet form) with one-hot targets.

    logits/targets: (..., C); weights broadcast over the class dim.
    Reference: ``pointpillars/src/core/losses.py:SigmoidFocalClassificationLoss:59``.
    """
    per_entry = optax_sigmoid_ce(logits, targets)
    prob = jax.nn.sigmoid(logits)
    p_t = targets * prob + (1 - targets) * (1 - prob)
    modulator = jnp.power(1.0 - p_t, gamma)
    if alpha >= 0:
        alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    else:
        alpha_w = 1.0
    loss = modulator * alpha_w * per_entry
    if weights is not None:
        loss = loss * weights[..., None] if weights.ndim == loss.ndim - 1 else loss * weights
    return loss


def optax_sigmoid_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable sigmoid cross entropy."""
    zeros = jnp.zeros_like(logits)
    cond = logits >= zeros
    relu_logits = jnp.where(cond, logits, zeros)
    neg_abs = jnp.where(cond, -logits, logits)
    return relu_logits - logits * labels + jnp.log1p(jnp.exp(neg_abs))


@LOSSES.register_module()
def weighted_smooth_l1(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    sigma: float = 3.0,
    code_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """SECOND-style smooth-L1 with per-code weights.

    Reference: ``losses.py:WeightedSmoothL1LocalizationLoss:102`` (sigma=3).
    Returns per-anchor loss (..., C) — caller reduces.
    """
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights)
    abs_diff = jnp.abs(diff)
    s2 = sigma * sigma
    loss = jnp.where(
        abs_diff < 1.0 / s2, 0.5 * s2 * diff * diff, abs_diff - 0.5 / s2
    )
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


@LOSSES.register_module()
def weighted_softmax_ce(
    logits: jnp.ndarray, targets: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Softmax CE over one-hot targets with per-anchor weights (direction loss).

    Reference: ``losses.py:WeightedSoftmaxClassificationLoss:157``.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = -jnp.sum(targets * logp, axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss


@LOSSES.register_module()
def gather_reg_loss_per_channel(
    output: jnp.ndarray,
    mask: jnp.ndarray,
    ind: jnp.ndarray,
    target: jnp.ndarray,
) -> jnp.ndarray:
    """Per-channel masked L1 at gathered centers -> (C,) vector.

    CenterPoint's ``RegLoss`` (det3d_ms/models/losses/centernet_loss.py:22):
    sums over batch and objects per regression channel, normalized by the
    positive count, so per-channel code weights can be applied by the caller.
    """
    pred = gather_feature(output, ind).astype(jnp.float32)  # (B, O, C)
    m = mask.astype(jnp.float32)[..., None]
    num = jnp.sum(m) + 1e-4
    return jnp.sum(jnp.abs(pred - target.astype(jnp.float32)) * m, axis=(0, 1)) / num
