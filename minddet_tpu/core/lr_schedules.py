"""Learning-rate schedules (optax-style step -> lr functions).

Covers every schedule the reference ships: CenterNet's polynomial decay /
multi-epoch decay / multi-step+linear / linear-warmup
(``centernet/src/utils.py:412-660``), PointPillars' exponential decay
(``pointpillars/train.py``), and CenterPoint's warmup-cosine + fastai
one-cycle (``tools_ms/train.py:222-231``,
``det3d_ms/solver/learning_schedules_fastai.py:6-120``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import optax

from minddet_tpu.core.registry import LR_SCHEDULES

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


@LR_SCHEDULES.register_module()
def polynomial_decay(
    learning_rate: float,
    end_learning_rate: float,
    decay_steps: int,
    power: float = 1.0,
    warmup_steps: int = 0,
) -> Schedule:
    """Reference: ``CenterNetPolynomialDecayLR`` (utils.py:412-455)."""
    poly = optax.polynomial_schedule(
        init_value=learning_rate,
        end_value=end_learning_rate,
        power=power,
        transition_steps=max(decay_steps - warmup_steps, 1),
    )
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, learning_rate, warmup_steps)
        return optax.join_schedules([warm, poly], [warmup_steps])
    return poly


@LR_SCHEDULES.register_module()
def multi_epochs_decay(
    learning_rate: float,
    milestones: Sequence[int],
    steps_per_epoch: int,
    factor: float = 10.0,
    warmup_steps: int = 0,
) -> Schedule:
    """Divide lr by ``factor`` at each milestone epoch.

    Reference: ``CenterNetMultiEpochsDecayLR``/``MultiEpochsDecayLR``
    (utils.py:457-540); CenterNet uses milestones [90, 120], factor 10.
    """
    boundaries = {int(m) * steps_per_epoch: 1.0 / factor for m in milestones}
    sched = optax.piecewise_constant_schedule(learning_rate, boundaries)
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, learning_rate, warmup_steps)
        return optax.join_schedules([warm, sched], [warmup_steps])
    return sched


@LR_SCHEDULES.register_module()
def exponential_decay(
    learning_rate: float,
    decay_steps: int,
    decay_rate: float = 0.8,
    staircase: bool = True,
) -> Schedule:
    """PointPillars' per-epoch exponential decay (train.py optimizer setup)."""
    return optax.exponential_decay(
        learning_rate, decay_steps, decay_rate, staircase=staircase
    )


@LR_SCHEDULES.register_module()
def warmup_cosine(
    learning_rate: float,
    total_steps: int,
    warmup_steps: int = 0,
    end_factor: float = 0.0,
) -> Schedule:
    """CenterPoint's ``warmup_cosine_annealing_lr`` (tools_ms/train.py:222-231)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=total_steps,
        end_value=learning_rate * end_factor,
    )


@LR_SCHEDULES.register_module()
def one_cycle(
    lr_max: float,
    total_steps: int,
    moms: Sequence[float] = (0.95, 0.85),
    div_factor: float = 10.0,
    pct_start: float = 0.4,
) -> Schedule:
    """fastai one-cycle: cos-anneal lr up then down (momentum mirrored).

    Reference: ``learning_schedules_fastai.py:OneCycle:85`` (the momentum leg
    is exposed via :func:`one_cycle_momentum`).
    """
    up_steps = int(total_steps * pct_start)
    down_steps = total_steps - up_steps
    low = lr_max / div_factor

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        up_frac = jnp.clip(step / jnp.maximum(up_steps, 1), 0.0, 1.0)
        lr_up = low + (lr_max - low) * 0.5 * (1 - jnp.cos(jnp.pi * up_frac))
        down_frac = jnp.clip((step - up_steps) / jnp.maximum(down_steps, 1), 0.0, 1.0)
        lr_down = lr_max * 0.5 * (1 + jnp.cos(jnp.pi * down_frac))
        # fastai anneals down to ~0 (lr_max/div_factor/1e4)
        lr_down = jnp.maximum(lr_down, lr_max / div_factor / 1e4)
        return jnp.where(step < up_steps, lr_up, lr_down)

    return sched


def one_cycle_momentum(
    total_steps: int, moms: Sequence[float] = (0.95, 0.85), pct_start: float = 0.4
) -> Schedule:
    """Momentum leg of one-cycle: high -> low -> high (mirror of the lr)."""
    up_steps = int(total_steps * pct_start)
    down_steps = total_steps - up_steps
    hi, lo = moms

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        up_frac = jnp.clip(step / jnp.maximum(up_steps, 1), 0.0, 1.0)
        m_up = hi + (lo - hi) * 0.5 * (1 - jnp.cos(jnp.pi * up_frac))
        down_frac = jnp.clip((step - up_steps) / jnp.maximum(down_steps, 1), 0.0, 1.0)
        m_down = lo + (hi - lo) * 0.5 * (1 - jnp.cos(jnp.pi * down_frac))
        return jnp.where(step < up_steps, m_up, m_down)

    return sched


@LR_SCHEDULES.register_module()
def linear_warmup(
    learning_rate: float, warmup_steps: int, total_steps: int, end_factor: float = 0.0
) -> Schedule:
    """Reference: ``LinearWithWarmUpLR`` (utils.py:612-660)."""
    warm = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
    decay = optax.linear_schedule(
        learning_rate, learning_rate * end_factor, max(total_steps - warmup_steps, 1)
    )
    return optax.join_schedules([warm, decay], [warmup_steps])


def build_schedule(cfg) -> Schedule:
    """Config -> schedule via the LR_SCHEDULES registry."""
    return LR_SCHEDULES.build(dict(cfg))
