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


def _phase_namespace():
    """Names available inside multi_phase lambda strings (the reference
    eval's them verbatim, `learning_schedules_fastai.py:21-22`; the usual
    body is `annealing_cos`)."""
    import jax.numpy as jnp

    def annealing_cos(start, end, pct):
        return end + (start - end) / 2 * (jnp.cos(jnp.pi * pct) + 1)

    return {"annealing_cos": annealing_cos, "math": math, "np": jnp,
            "jnp": jnp, "__builtins__": {}}


def _compile_phases(phase_items, total_steps):
    """[(start_frac, lambda_str)] → step→value schedule with the reference's
    last-matching-phase-wins semantics (`LRSchedulerStep.step`)."""
    import jax.numpy as jnp
    ns = _phase_namespace()
    spans = []
    for i, (start, fn_str) in enumerate(phase_items):
        s = int(start * total_steps)
        e = (int(phase_items[i + 1][0] * total_steps)
             if i < len(phase_items) - 1 else total_steps)
        spans.append((s, max(e, s + 1), eval(fn_str, ns)))
    assert spans[0][0] == 0, "first multi_phase phase must start at 0"

    def sched(step):
        s0, e0, f0 = spans[0]
        val = f0(step / (e0 - s0))
        for s, e, f in spans[1:]:
            val = jnp.where(step >= s, f((step - s) / (e - s)), val)
        return val
    return sched


def multi_phase_schedules(cfg: schema.LearningRateConfig, total_steps: int
                          ) -> Tuple[Callable, Callable | None]:
    """The reference's MultiPhase schedule (`optimizer.proto` LearningRatePhase
    {start, lambda_func, momentum_lambda_func}; `lr_scheduler_builder` →
    `LRSchedulerStep`, `learning_schedules_fastai.py:8-46`)."""
    lr_items = [(float(p.get("start", 0.0)), p["lambda_func"])
                for p in cfg.phases]
    lr_sched = _compile_phases(lr_items, total_steps)
    mom_items = [(float(p.get("start", 0.0)), p["momentum_lambda_func"])
                 for p in cfg.phases if p.get("momentum_lambda_func")]
    mom_sched = (_compile_phases(mom_items, total_steps)
                 if mom_items else None)
    return lr_sched, mom_sched


def exponential_decay_schedule(base_lr, decay_steps, decay_factor,
                               staircase=True, burnin_learning_rate=0.0,
                               burnin_steps=0):
    """The legacy TF-style ExponentialDecay[WithBurnin]
    (`torchplus/train/learning_schedules.py:90-142`)."""
    import jax.numpy as jnp

    def sched(step):
        exp = (step // decay_steps) if staircase else (step / decay_steps)
        lr = base_lr * jnp.power(decay_factor, exp)
        if burnin_steps > 0:
            burn = burnin_learning_rate or base_lr
            lr = jnp.where(step < burnin_steps, burn, lr)
        return lr
    return sched


def cosine_decay_with_warmup_schedule(base_lr, total_steps,
                                      warmup_learning_rate=0.0,
                                      warmup_steps=0):
    """Legacy CosineDecayWithWarmup (`learning_schedules.py:145-178`)."""
    import jax.numpy as jnp

    def sched(step):
        lr = 0.5 * base_lr * (1 + jnp.cos(
            jnp.pi * (step - warmup_steps) /
            max(total_steps - warmup_steps, 1)))
        if warmup_steps > 0:
            slope = (base_lr - warmup_learning_rate) / warmup_steps
            lr = jnp.where(step < warmup_steps,
                           slope * step + warmup_learning_rate, lr)
        return lr
    return sched


def build_lr_schedules(cfg: schema.LearningRateConfig, total_steps: int
                       ) -> Tuple[Callable, Callable | None]:
    """Returns (lr_schedule, momentum_schedule_or_None)."""
    if cfg.kind == "one_cycle":
        return one_cycle_schedules(cfg, total_steps)
    if cfg.kind == "manual_stepping":
        return manual_stepping_schedule(cfg, total_steps), None
    if cfg.kind == "multi_phase":
        return multi_phase_schedules(cfg, total_steps)
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
