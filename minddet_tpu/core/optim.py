"""Optimizer factory: one optax chain replacing the reference's 1,562 LoC of
hand-rolled MindSpore optimizers (``tools_ms/optim_zy.py`` AdamW,
``optim_lyl.py``, ``det3d_ms/solver/custom_adam.py`` Adam +
``clip_grad_norm_:590``, ``AdamWeightDecay:679``, ``AdamOffload:888``).

On TPU with bf16 compute there is no loss-scale/overflow machinery to port
(the reference's ``CenterNetWithLossScaleCell`` + allreduced overflow flag,
``centernet_det.py:301-371``); an optional NaN-guard skips bad steps instead.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp
import optax

from minddet_tpu.core.registry import OPTIMIZERS

ScalarOrSchedule = Union[float, Callable]


def _decay_mask(params) -> Any:
    """Weight decay on matrices/convs only — never on biases or norm scales.

    Matches the reference's decay filter lambda exclusion of gamma/beta/bias
    (``centernet/default_config.yaml:120``, applied config.py:133-137).
    """

    def mask_fn(p):
        return jax.tree_util.tree_map(lambda x: x.ndim > 1, p)

    return mask_fn(params)


@OPTIMIZERS.register_module()
def adam(
    learning_rate: ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    clip_global_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    txs = []
    if clip_global_norm:
        txs.append(optax.clip_by_global_norm(clip_global_norm))
    if weight_decay:
        txs.append(
            optax.adamw(
                learning_rate, b1=b1, b2=b2, eps=eps,
                weight_decay=weight_decay, mask=_decay_mask,
            )
        )
    else:
        txs.append(optax.adam(learning_rate, b1=b1, b2=b2, eps=eps))
    return optax.chain(*txs)


@OPTIMIZERS.register_module()
def adamw(
    learning_rate: ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    clip_global_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    return adam(
        learning_rate, b1=b1, b2=b2, eps=eps,
        weight_decay=weight_decay, clip_global_norm=clip_global_norm,
    )


@OPTIMIZERS.register_module()
def sgd(
    learning_rate: ScalarOrSchedule,
    momentum: float = 0.9,
    nesterov: bool = False,
    weight_decay: float = 0.0,
    clip_global_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    txs = []
    if clip_global_norm:
        txs.append(optax.clip_by_global_norm(clip_global_norm))
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay, mask=_decay_mask))
    txs.append(optax.sgd(learning_rate, momentum=momentum, nesterov=nesterov))
    return optax.chain(*txs)


def skip_nonfinite_updates(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """Wrap an optimizer to no-op on non-finite gradients (NaN-guard).

    The bf16 replacement for the reference's fp16 loss-scale overflow skip
    (``centernet/src/centernet_det.py:357-368``, ``LossCallBack`` NaN warning
    ``utils.py:343-351``).
    """
    return optax.apply_if_finite(tx, max_consecutive_errors=10000)


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def build_optimizer(cfg, learning_rate: ScalarOrSchedule) -> optax.GradientTransformation:
    cfg = dict(cfg)
    cfg["learning_rate"] = learning_rate
    nan_guard = cfg.pop("nan_guard", True)
    tx = OPTIMIZERS.build(cfg)
    return skip_nonfinite_updates(tx) if nan_guard else tx


def with_ema(
    tx: optax.GradientTransformation, decay: float = 0.9998
) -> optax.GradientTransformation:
    """Track an exponential moving average of the parameters (YOLO recipes).

    The EMA weights live in the optimizer state; fetch them for eval with
    :func:`get_ema_params`.
    """
    return optax.chain(tx, optax.ema(decay=decay, debias=True))


def get_ema_params(opt_state):
    """Extract EMA parameters from a `with_ema` optimizer state (or None)."""
    for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, optax.EmaState)
    ):
        if isinstance(s, optax.EmaState):
            return s.ema
    return None
