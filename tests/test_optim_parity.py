"""Optimizer/scheduler parity vs torch.optim on synthetic gradients.

Pins the exact semantics the reference trainer relies on (ref:
codecTrain.py:150-187, trainer/trainerGAN.py:271-294): torch Adam's eps
placement (outside the sqrt), L2 weight decay added to the gradient before
the moment updates, scheduler.step() after optimizer.step() (so the first
step uses the base lr), StepLR's floor(count/step_size) and MultiStepLR's
milestone counting.  Synthetic gradients make this exact — no cross-
framework autodiff noise."""

import numpy as np

import jax.numpy as jnp
import torch

from audiodec_tpu.train.optim import make_optimizer


def _run_pair(config, role, steps, shapes, seed=0, atol=1e-7):
    rng = np.random.default_rng(seed)
    params0 = [rng.standard_normal(s).astype(np.float32) for s in shapes]
    grads = [[rng.standard_normal(s).astype(np.float32) for s in shapes]
             for _ in range(steps)]

    # torch side: exactly what codecTrain.py builds
    tparams = [torch.nn.Parameter(torch.tensor(p.copy())) for p in params0]
    opt_params = dict(config[f"{role}_optimizer_params"])
    lr = opt_params.pop("lr")
    tcls = getattr(torch.optim, config.get(f"{role}_optimizer_type", "Adam"))
    topt = tcls(tparams, lr=lr, **opt_params)
    sp = config[f"{role}_scheduler_params"]
    sched_type = config[f"{role}_scheduler_type"]
    if sched_type == "StepLR":
        tsched = torch.optim.lr_scheduler.StepLR(topt, **sp)
    elif sched_type == "ExponentialLR":
        tsched = torch.optim.lr_scheduler.ExponentialLR(topt, **sp)
    else:
        tsched = torch.optim.lr_scheduler.MultiStepLR(topt, **sp)
    clip = config.get(f"{role}_grad_norm", -1)
    for g in grads:
        topt.zero_grad()
        for p, gi in zip(tparams, g):
            p.grad = torch.tensor(gi.copy())
        if clip and clip > 0:
            torch.nn.utils.clip_grad_norm_(tparams, clip)
        topt.step()
        tsched.step()
    torch_out = [p.detach().numpy() for p in tparams]

    # our side
    opt = make_optimizer(config, role)
    params = [jnp.asarray(p) for p in params0]
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update([jnp.asarray(x) for x in g], state,
                                    params)
        params = [p + u for p, u in zip(params, updates)]
    ours = [np.asarray(p) for p in params]

    for i, (a, b) in enumerate(zip(ours, torch_out)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=atol,
                                   err_msg=f"param {i} after {steps} steps")


SHAPES = [(7, 3), (16,), (4, 2, 5)]


def test_adam_steplr_parity():
    config = {
        "generator_optimizer_type": "Adam",
        "generator_optimizer_params": {"lr": 1e-2, "betas": [0.5, 0.9],
                                       "weight_decay": 0.0},
        "generator_scheduler_type": "StepLR",
        "generator_scheduler_params": {"step_size": 2, "gamma": 0.1},
        "generator_grad_norm": -1,
    }
    _run_pair(config, "generator", steps=5, shapes=SHAPES)


def test_adam_multisteplr_weight_decay_parity():
    config = {
        "discriminator_optimizer_type": "Adam",
        "discriminator_optimizer_params": {"lr": 2e-3, "betas": [0.5, 0.9],
                                           "weight_decay": 0.01},
        "discriminator_scheduler_type": "MultiStepLR",
        "discriminator_scheduler_params": {"milestones": [1, 3],
                                           "gamma": 0.5},
        "discriminator_grad_norm": -1,
    }
    _run_pair(config, "discriminator", steps=5, shapes=SHAPES, seed=1)


def test_adam_grad_clip_parity():
    config = {
        "generator_optimizer_type": "Adam",
        "generator_optimizer_params": {"lr": 1e-2, "betas": [0.9, 0.999],
                                       "weight_decay": 0.0},
        "generator_scheduler_type": "StepLR",
        "generator_scheduler_params": {"step_size": 10, "gamma": 1.0},
        "generator_grad_norm": 0.5,
    }
    _run_pair(config, "generator", steps=4, shapes=SHAPES, seed=2)


def test_adamw_decoupled_decay_clip_parity():
    """torch.optim.AdamW oracle: decoupled weight decay (not L2-on-grad),
    eps honored, grad clipping honored — the exact semantics the AdamW
    factory branch must reproduce (no reference config uses AdamW; this
    guards the config-driven path against silent drift)."""
    config = {
        "generator_optimizer_type": "AdamW",
        "generator_optimizer_params": {"lr": 3e-3, "betas": [0.8, 0.95],
                                       "weight_decay": 0.05, "eps": 1e-6},
        "generator_scheduler_type": "StepLR",
        "generator_scheduler_params": {"step_size": 2, "gamma": 0.5},
        "generator_grad_norm": 0.75,
    }
    _run_pair(config, "generator", steps=6, shapes=SHAPES, seed=5)


def test_adamw_default_decay_parity():
    """AdamW with no explicit weight_decay must match torch's 1e-2 default."""
    config = {
        "generator_optimizer_type": "AdamW",
        "generator_optimizer_params": {"lr": 1e-2, "betas": [0.9, 0.999]},
        "generator_scheduler_type": "StepLR",
        "generator_scheduler_params": {"step_size": 10, "gamma": 1.0},
        "generator_grad_norm": -1,
    }
    # torch applies decay as p *= (1 - lr*wd) before the Adam add; optax
    # sums the decay into the update — same math, one-rounding different.
    _run_pair(config, "generator", steps=4, shapes=SHAPES, seed=6, atol=5e-7)


def test_exponentiallr_parity():
    """torch ExponentialLR oracle: lr * gamma^count with scheduler.step()
    after optimizer.step() (first step at base lr).  No reference config
    uses ExponentialLR; this pins the config-driven branch
    (train/optim.py ExponentialLR) so it isn't oracle-free."""
    config = {
        "generator_optimizer_type": "Adam",
        "generator_optimizer_params": {"lr": 5e-3, "betas": [0.7, 0.95],
                                       "weight_decay": 0.0},
        "generator_scheduler_type": "ExponentialLR",
        "generator_scheduler_params": {"gamma": 0.8},
        "generator_grad_norm": -1,
    }
    _run_pair(config, "generator", steps=6, shapes=SHAPES, seed=7)


def test_reference_config_schedules_parity():
    """The shipped symAD optimizer/scheduler blocks exactly (with milestones
    scaled down so they engage within a few steps)."""
    config = {
        "generator_optimizer_type": "Adam",
        "generator_optimizer_params": {"lr": 1.0e-4, "betas": [0.5, 0.9],
                                       "weight_decay": 0.0},
        "generator_scheduler_type": "StepLR",
        "generator_scheduler_params": {"step_size": 200000, "gamma": 1.0},
        "generator_grad_norm": -1,
        "discriminator_optimizer_type": "Adam",
        "discriminator_optimizer_params": {"lr": 2.0e-4, "betas": [0.5, 0.9],
                                           "weight_decay": 0.0},
        "discriminator_scheduler_type": "MultiStepLR",
        "discriminator_scheduler_params": {"milestones": [2, 4, 6, 8],
                                           "gamma": 0.5},
        "discriminator_grad_norm": -1,
    }
    _run_pair(config, "generator", steps=3, shapes=SHAPES, seed=3)
    _run_pair(config, "discriminator", steps=9, shapes=SHAPES, seed=4)
