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
from audiodec_tpu.models.vocoder import VocoderConfig
from audiodec_tpu.ops.norms import resolve_params
from audiodec_tpu.train.criterion import build_criterion
from audiodec_tpu.train.optim import make_optimizer
from audiodec_tpu.train.steps import (
    make_autoencoder_steps,
    make_denoise_steps,
    make_vocoder_steps,
)
from audiodec_tpu.utils.torch_import import (
    import_autoencoder,
    import_hifigan_discriminator,
    import_vocoder,
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
    """Assert the trajectories match: the q99 of |ours - ref| per leaf must
    be at float-noise level (<=5e-6; a wrong λ, eps placement, or schedule
    off-by-one shifts the WHOLE distribution), the median at <=5e-7, while
    isolated entries may diverge up to the lr budget — Adam's step-1 update
    is ±lr·sign(g), so a near-zero cross-framework gradient can
    legitimately flip one element's direction (measured: 1 element in 2.9M
    at 3 steps).  q99 (not q99.9) is the gate so it stays meaningful on
    small leaves where a higher quantile would equal the max (which the lr
    budget already bounds below)."""
    flat_o = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_r = jax.tree_util.tree_leaves(ref)
    assert len(flat_o) == len(flat_r)
    for (path, a), b in zip(flat_o, flat_r):
        name = jax.tree_util.keystr(path)
        if any(s in name for s in skip):
            continue
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        # a systematic error (wrong λ, eps placement, schedule off-by-one)
        # moves the WHOLE distribution by ~lr (>=1e-5); cross-framework
        # float noise through Adam sits at ~1e-8 medians with a tail
        # (measured: vocoder adv worst-leaf median 6e-8, q99 3.1e-6)
        med = float(np.median(d))
        assert med <= 5e-7, (
            f"{label}{name}: median|diff|={med:.3e} — systematic divergence")
        q = float(np.quantile(d, 0.99))
        assert q <= 5e-6, (
            f"{label}{name}: q99|diff|={q:.3e} — tail beyond float noise")
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


# ---------------------------------------------------------------------------
# vocoder trainer (ref: trainer/vocoder.py:48-111)
# golden: tools/dump_voc_denoise_step_goldens.py — schedule
# [no-op (strict `>` gating at steps=0), metric, adv, adv]
# ---------------------------------------------------------------------------

VOC_CFG = VocoderConfig(in_channels=16, out_channels=1, channels=32,
                        kernel_size=7,
                        upsample_scales=(5, 5, 4, 3),
                        upsample_kernel_sizes=(10, 10, 8, 6),
                        resblock_kernel_sizes=(3,),
                        resblock_dilations=((1, 3),),
                        groups=2, stats=True)

VOC_CONFIG = dict(CONFIG)
VOC_CONFIG["generator_scheduler_params"] = {"step_size": 1, "gamma": 0.5}


def test_vocoder_train_step_parity_vs_reference_trainer():
    data = np.load(os.path.join(GOLDEN, "voc_train_step.npz"))
    x_all = jnp.asarray(data["x_all"].transpose(0, 1, 3, 2))  # (N, B, T, C)

    analyzer = import_autoencoder(_sub(data, "sd_analyzer__"), GEN_CFG)
    voc = import_vocoder(_sub(data, "sd0_gen__"), VOC_CFG, fold=False)
    disc = import_hifigan_discriminator(_sub(data, "sd0_disc__"), DISC_CFG,
                                        fold=False)
    assert "v" in voc["input_conv"] and "g" in voc["input_conv"]
    assert "mean" in voc and "scale" in voc

    crit = build_criterion(VOC_CONFIG)
    gen_opt = make_optimizer(VOC_CONFIG, "generator")
    disc_opt = make_optimizer(VOC_CONFIG, "discriminator")
    steps = make_vocoder_steps(VOC_CFG, GEN_CFG, _disc_apply, VOC_CONFIG,
                               crit, gen_opt, disc_opt, jit=False)
    state = {"gen": voc, "disc": disc, "analyzer": analyzer,
             "gen_opt": gen_opt.init(voc), "disc_opt": disc_opt.init(disc)}

    an0 = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(), analyzer)
    stats0 = (np.asarray(voc["mean"]).copy(), np.asarray(voc["scale"]).copy())

    # torch call 0 was a no-op (steps=0 fails the strict `>` gate); replay
    # only the real updates: metric on batch 1, adv on batches 2 and 3
    state, rec = steps["metric"](state, x_all[1])
    assert np.isfinite(rec["generator_loss"])

    # budget 2x sum-lr: a near-zero cross-framework gradient flips the
    # +-lr*sign(g) step-1 update, so an isolated element may differ 2*lr
    ref_m = import_vocoder(_sub(data, "sdm_gen__"), VOC_CFG, fold=False)
    _tree_close(state["gen"], ref_m, lr_budget=2 * 1e-4, label="voc:metric:")

    for i in (2, 3):
        state, rec = steps["adv"](state, x_all[i])
        assert np.isfinite(rec["generator_loss"])
        assert np.isfinite(rec["discriminator_loss"])

    # StepLR(step_size=1): gen updates at lr 1e-4, 5e-5, 2.5e-5
    ref_a = import_vocoder(_sub(data, "sda_gen__"), VOC_CFG, fold=False)
    _tree_close(state["gen"], ref_a, lr_budget=2 * (1e-4 + 5e-5 + 2.5e-5),
                label="voc:adv:gen:")
    # MultiStepLR(milestones=[1]): disc updates at lr 2e-4 then 1e-4
    ref_d = import_hifigan_discriminator(_sub(data, "sda_disc__"), DISC_CFG,
                                         fold=False)
    _tree_close(state["disc"], ref_d, lr_budget=2 * (2e-4 + 1e-4),
                label="voc:adv:disc:")

    # stats buffers are never optimizer-driven (torch buffers)
    np.testing.assert_array_equal(np.asarray(state["gen"]["mean"]), stats0[0])
    np.testing.assert_array_equal(np.asarray(state["gen"]["scale"]),
                                  stats0[1])
    # the frozen analyzer must not have moved at all
    for (pa, a), b in zip(
            jax.tree_util.tree_flatten_with_path(state["analyzer"])[0],
            jax.tree_util.tree_leaves(an0)):
        np.testing.assert_array_equal(np.asarray(a), b,
                                      err_msg=jax.tree_util.keystr(pa))
    # and the generator must actually have moved
    ref0 = import_vocoder(_sub(data, "sd0_gen__"), VOC_CFG, fold=False)
    assert np.max(np.abs(np.asarray(state["gen"]["input_conv"]["v"])
                         - np.asarray(ref0["input_conv"]["v"]))) > 1e-7


# ---------------------------------------------------------------------------
# denoise trainer (ref: trainer/denoise.py:52-84)
# ---------------------------------------------------------------------------

DEN_CONFIG = dict(CONFIG)
DEN_CONFIG["generator_scheduler_params"] = {"step_size": 2, "gamma": 0.5}


def test_denoise_train_step_parity_vs_reference_trainer():
    data = np.load(os.path.join(GOLDEN, "denoise_train_step.npz"))
    n_steps = int(data["n_steps"])
    x_n = jnp.asarray(data["x_noisy"].transpose(0, 1, 3, 2))
    x_c = jnp.asarray(data["x_clean"].transpose(0, 1, 3, 2))

    gen = import_autoencoder(_sub(data, "sd0_gen__"), GEN_CFG)
    crit = build_criterion(DEN_CONFIG)
    gen_opt = make_optimizer(DEN_CONFIG, "generator")
    steps = make_denoise_steps(GEN_CFG, DEN_CONFIG, crit, gen_opt, jit=False)
    state = {"gen": gen, "gen_opt": gen_opt.init(gen)}

    q0 = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(),
                                gen["quantizer"])
    d0 = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(),
                                gen["decoder"])

    for i in range(n_steps):
        state, rec = steps["train"](state, x_n[i], x_c[i])
        assert np.isfinite(rec["generator_loss"])

    ref = import_autoencoder(_sub(data, "sd1_gen__"), GEN_CFG)
    # StepLR(step_size=2): updates at lr 1e-4, 1e-4, 5e-5; 2x for the
    # step-1 sign-flip ambiguity on near-zero gradients
    budget = 2 * (2 * 1e-4 + 5e-5)
    _tree_close({"encoder": state["gen"]["encoder"],
                 "projector": state["gen"]["projector"]},
                {"encoder": ref["encoder"], "projector": ref["projector"]},
                lr_budget=budget, label="denoise:")

    # quantizer (incl. EMA buffers, codebook.eval()) and decoder are frozen:
    # exactly equal to init on OUR side, and torch's side agrees
    for name, ours0, sub in (("quantizer", q0, "quantizer"),
                             ("decoder", d0, "decoder")):
        for (pa, a), b in zip(
                jax.tree_util.tree_flatten_with_path(state["gen"][sub])[0],
                jax.tree_util.tree_leaves(ours0)):
            np.testing.assert_array_equal(
                np.asarray(a), b, err_msg=f"{name}{jax.tree_util.keystr(pa)}")
        for (pa, a), b in zip(
                jax.tree_util.tree_flatten_with_path(ref[sub])[0],
                jax.tree_util.tree_leaves(ours0)):
            np.testing.assert_allclose(
                np.asarray(a), b, rtol=0, atol=1e-7,
                err_msg=f"torch:{name}{jax.tree_util.keystr(pa)}")

    # encoder must actually have moved
    assert np.max(np.abs(np.asarray(state["gen"]["encoder"]["conv"]["w"])
                         - np.asarray(gen["encoder"]["conv"]["w"]))) > 1e-7
