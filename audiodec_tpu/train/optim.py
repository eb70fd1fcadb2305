"""Optimizer/scheduler factories mirroring the reference's torch.optim usage
(ref: codecTrain.py:150-187, config optimizer sections).

torch.optim.Adam semantics (L2 weight decay added to the gradient *before*
the moment updates) and StepLR/MultiStepLR schedules, built on optax.
"""

from __future__ import annotations

from typing import Optional, Sequence

import optax


def step_lr(base_lr: float, step_size: int, gamma: float = 1.0):
    """torch StepLR: lr * gamma^(floor(count / step_size))."""
    def schedule(count):
        return base_lr * (gamma ** (count // step_size))
    return schedule


def multi_step_lr(base_lr: float, milestones: Sequence[int],
                  gamma: float = 0.5):
    """torch MultiStepLR: lr * gamma^(#milestones <= count)."""
    import jax.numpy as jnp
    ms_arr = jnp.asarray(sorted(milestones)) if milestones else None

    def schedule(count):
        if ms_arr is None:
            return base_lr
        n = jnp.sum(count >= ms_arr)
        return base_lr * (gamma ** n)
    return schedule


def torch_adam(lr_schedule, betas=(0.9, 0.999), eps: float = 1e-8,
               weight_decay: float = 0.0,
               grad_clip_norm: float = -1.0) -> optax.GradientTransformation:
    """torch.optim.Adam equivalent with optional global-norm grad clipping
    (ref: trainer/trainerGAN.py:271-294 clip_grad_norm_)."""
    chain = []
    if grad_clip_norm and grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*chain)


def torch_adamw(lr_schedule, betas=(0.9, 0.999), eps: float = 1e-8,
                weight_decay: float = 1e-2,
                grad_clip_norm: float = -1.0) -> optax.GradientTransformation:
    """torch.optim.AdamW equivalent: DECOUPLED weight decay (param -=
    lr*wd*param, applied outside the moment updates — add_decayed_weights
    after scale_by_adam), with the same eps placement and optional
    clip_grad_norm_ as torch_adam (ref: trainer/trainerGAN.py:271-294)."""
    chain = []
    if grad_clip_norm and grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*chain)


def make_optimizer(config: dict, role: str) -> optax.GradientTransformation:
    """Build optimizer+scheduler for 'generator' or 'discriminator' from a
    reference-style config dict."""
    opt_type = config.get(f"{role}_optimizer_type", "Adam")
    opt_params = dict(config.get(f"{role}_optimizer_params", {}))
    sched_type = config.get(f"{role}_scheduler_type", "StepLR")
    sched_params = dict(config.get(f"{role}_scheduler_params", {}))
    base_lr = opt_params.get("lr", 1e-3)

    if sched_type == "StepLR":
        schedule = step_lr(base_lr, sched_params.get("step_size", 10 ** 9),
                           sched_params.get("gamma", 1.0))
    elif sched_type == "MultiStepLR":
        schedule = multi_step_lr(base_lr, sched_params.get("milestones", []),
                                 sched_params.get("gamma", 0.5))
    elif sched_type == "ExponentialLR":
        g = sched_params.get("gamma", 1.0)
        schedule = lambda count: base_lr * (g ** count)  # noqa: E731
    else:
        raise NotImplementedError(f"Scheduler {sched_type} not supported")

    if opt_type not in ("Adam", "AdamW"):
        raise NotImplementedError(f"Optimizer {opt_type} not supported")
    make = torch_adamw if opt_type == "AdamW" else torch_adam
    return make(
        schedule,
        betas=tuple(opt_params.get("betas", (0.9, 0.999))),
        eps=opt_params.get("eps", 1e-8),
        weight_decay=opt_params.get(
            "weight_decay", 1e-2 if opt_type == "AdamW" else 0.0),
        grad_clip_norm=config.get(f"{role}_grad_norm", -1),
    )
