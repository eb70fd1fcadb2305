"""Full train-step parity vs the reference trainer.

tests/golden/train_step.npz was produced by driving the reference's own
Trainer (tools/dump_train_step_golden.py: codecTrain.TrainMain +
trainer/autoencoder.py:49-131) for 3 metric-phase steps and 2 adversarial-
phase steps from a seeded init on fixed batches.  This test replays the
same schedule through make_autoencoder_steps + make_optimizer from the
identical imported init and asserts the updated generator/discriminator
parameters track torch's — pinning Adam eps/weight-decay placement,
scheduler step off-by-ones (gen StepLR halves mid-run, disc MultiStepLR
halves between the adv steps), λ-weighted loss assembly, the efficient-
paradigm freeze, and the EMA codebook trajectory through real backprop."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import GeneratorConfig
from audiodec_tpu.models.discriminators import (
    HiFiGANDiscriminatorConfig,
    MultiPeriodConfig,
    MultiScaleConfig,
    PeriodDiscriminatorConfig,
    ScaleDiscriminatorConfig,
    hifigan_discriminator_apply,
)
from audiodec_tpu.ops.norms import resolve_params
from audiodec_tpu.train.criterion import build_criterion
from audiodec_tpu.train.optim import make_optimizer
from audiodec_tpu.train.steps import make_autoencoder_steps
from audiodec_tpu.utils.torch_import import (
    import_autoencoder,
    import_hifigan_discriminator,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

GEN_CFG = GeneratorConfig(encode_channels=4, decode_channels=4, code_dim=16,
                          codebook_num=4, codebook_size=32)
DISC_CFG = HiFiGANDiscriminatorConfig(
    msd=MultiScaleConfig(scales=2, follow_official_norm=False,
                         discriminator=ScaleDiscriminatorConfig(
                             channels=16, max_downsample_channels=32,
                             max_groups=4)),
    mpd=MultiPeriodConfig(periods=(2, 3),
                          discriminator=PeriodDiscriminatorConfig(
                              channels=4, max_downsample_channels=16)))

# mirrors tools/dump_train_step_golden.py CONFIG (reference-style keys)
CONFIG = {
    "sampling_rate": 48000,
    "use_mel_loss": True,
    "mel_loss_params": {"fs": 48000, "fft_sizes": [512], "hop_sizes": [150],
                        "win_lengths": [512], "num_mels": 16, "fmin": 0,
                        "fmax": 24000, "log_base": None},
    "use_stft_loss": False,
    "use_shape_loss": False,
    "use_feat_match_loss": True,
    "feat_match_loss_params": {"average_by_discriminators": False,
                               "average_by_layers": False},
    "generator_adv_loss_params": {"average_by_discriminators": False},
    "discriminator_adv_loss_params": {"average_by_discriminators": False},
    "lambda_adv": 1.0, "lambda_feat_match": 2.0, "lambda_vq_loss": 1.0,
    "lambda_mel_loss": 45.0,
    "generator_optimizer_type": "Adam",
    "generator_optimizer_params": {"lr": 1.0e-4, "betas": [0.5, 0.9],
                                   "weight_decay": 0.0},
    "generator_scheduler_type": "StepLR",
    "generator_scheduler_params": {"step_size": 2, "gamma": 0.5},
    "generator_grad_norm": -1,
    "discriminator_optimizer_type": "Adam",
    "discriminator_optimizer_params": {"lr": 2.0e-4, "betas": [0.5, 0.9],
                                       "weight_decay": 0.0},
    "discriminator_scheduler_type": "MultiStepLR",
    "discriminator_scheduler_params": {"milestones": [1], "gamma": 0.5},
    "discriminator_grad_norm": -1,
}


def _disc_apply(p, x):
    return hifigan_discriminator_apply(p, x, DISC_CFG)


def _sub(data, prefix):
    return {k[len(prefix):]: data[k] for k in data.files
            if k.startswith(prefix)}


def _tree_close(ours, ref, lr_budget, label, skip=()):
    """Assert the trajectories match: the 99.9% quantile of |ours - ref| per
    leaf must be at float-noise level (a wrong λ, eps placement, or schedule
    off-by-one shifts the WHOLE distribution), while isolated entries may
    diverge up to the lr budget — Adam's step-1 update is ±lr·sign(g), so a
    near-zero cross-framework gradient can legitimately flip one element's
    direction (measured: 1 element in 2.9M at 3 steps)."""
    flat_o = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_r = jax.tree_util.tree_leaves(ref)
    assert len(flat_o) == len(flat_r)
    for (path, a), b in zip(flat_o, flat_r):
        name = jax.tree_util.keystr(path)
        if any(s in name for s in skip):
            continue
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        q = float(np.quantile(d, 0.999))
        assert q <= 2e-6, (
            f"{label}{name}: q99.9|diff|={q:.3e} — systematic divergence")
        mx = float(d.max())
        assert mx <= 1.05 * lr_budget, (
            f"{label}{name}: max|diff|={mx:.3e} vs lr budget {lr_budget:.1e}")


@pytest.fixture(scope="module")
def golden():
    return np.load(os.path.join(GOLDEN, "train_step.npz"))


def test_train_step_parity_vs_reference_trainer(golden):
    data = golden
    n_metric, n_adv = int(data["n_metric"]), int(data["n_adv"])
    x_all = jnp.asarray(data["x_all"].transpose(0, 1, 3, 2))  # (N, B, T, C)

    gen = import_autoencoder(_sub(data, "sd0_gen__"), GEN_CFG)
    disc = import_hifigan_discriminator(_sub(data, "sd0_disc__"), DISC_CFG,
                                        fold=False)
    crit = build_criterion(CONFIG)
    gen_opt = make_optimizer(CONFIG, "generator")
    disc_opt = make_optimizer(CONFIG, "discriminator")
    steps = make_autoencoder_steps(GEN_CFG, _disc_apply, CONFIG, crit,
                                   gen_opt, disc_opt, jit=False)
    state = {"gen": gen, "disc": disc,
             "gen_opt": gen_opt.init(gen), "disc_opt": disc_opt.init(disc)}

    for i in range(n_metric):
        state, rec = steps["metric"](state, x_all[i])
        assert np.isfinite(rec["generator_loss"])

    # after the metric phase: generator must track torch's trajectory.
    # lr budget: 3 steps at lr<=1e-4 (Adam |update| <= ~lr per step)
    ref_m = import_autoencoder(_sub(data, "sdm_gen__"), GEN_CFG)
    _tree_close(state["gen"], ref_m, lr_budget=3 * 1e-4, label="metric:gen")

    for i in range(n_metric, n_metric + n_adv):
        state, rec = steps["adv"](state, x_all[i])
        assert np.isfinite(rec["generator_loss"])
        assert np.isfinite(rec["discriminator_loss"])

    ref_a = import_autoencoder(_sub(data, "sda_gen__"), GEN_CFG)
    ref_d = import_hifigan_discriminator(_sub(data, "sda_disc__"), DISC_CFG,
                                         fold=False)
    # frozen subtrees must match the metric-phase result EXACTLY on torch's
    # side too (efficient paradigm): compare ours bit-tight against torch
    for sub in ("encoder", "projector"):
        _tree_close({sub: state["gen"][sub]}, {sub: ref_a[sub]},
                    lr_budget=3 * 1e-4, label="adv:frozen:")
    # quantizer EMA stopped at the metric phase (codebook.eval())
    np.testing.assert_allclose(
        np.asarray(state["gen"]["quantizer"]["embed"]),
        np.asarray(ref_a["quantizer"]["embed"]), rtol=1e-4, atol=1e-5)
    # decoder trained 2 more steps at lr<=5e-5 (after StepLR halvings)
    _tree_close({"decoder": state["gen"]["decoder"]},
                {"decoder": ref_a["decoder"]},
                lr_budget=3 * 1e-4 + 2 * 5e-5, label="adv:gen:")
    # discriminator: 2 steps at lr 2e-4 then 1e-4 (MultiStepLR milestone 1)
    _tree_close(state["disc"], ref_d, lr_budget=2e-4 + 1e-4, label="adv:disc:")

    # the discriminator params must actually have moved
    d0 = import_hifigan_discriminator(_sub(data, "sd0_disc__"), DISC_CFG,
                                      fold=False)
    moved = np.max(np.abs(
        np.asarray(state["disc"]["msd"]["discriminators"][0]["layers"][0]["w"])
        - np.asarray(d0["msd"]["discriminators"][0]["layers"][0]["w"])))
    assert moved > 1e-6
