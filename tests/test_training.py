"""Training stack: phase schedule, freezing semantics, EMA, optimizers,
checkpointing (behavior spec: ref trainer/{trainerGAN,autoencoder,vocoder,
denoise}.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import GeneratorConfig, generator_init
from audiodec_tpu.models.discriminators import (
    HiFiGANDiscriminatorConfig,
    MultiPeriodConfig,
    MultiScaleConfig,
    PeriodDiscriminatorConfig,
    ScaleDiscriminatorConfig,
    hifigan_discriminator_apply,
    hifigan_discriminator_init,
)
from audiodec_tpu.models.vocoder import VocoderConfig, vocoder_init
from audiodec_tpu.train.checkpoint import (
    load_checkpoint,
    load_only_params,
    save_checkpoint,
)
from audiodec_tpu.train.criterion import build_criterion
from audiodec_tpu.train.optim import make_optimizer, multi_step_lr, step_lr
from audiodec_tpu.train.steps import (
    make_autoencoder_steps,
    make_denoise_steps,
    make_vocoder_steps,
)

GEN_CFG = GeneratorConfig(encode_channels=2, decode_channels=2, code_dim=8,
                          codebook_num=2, codebook_size=16)
DISC_CFG = HiFiGANDiscriminatorConfig(
    msd=MultiScaleConfig(scales=2, follow_official_norm=False,
                         discriminator=ScaleDiscriminatorConfig(
                             channels=16, max_downsample_channels=32,
                             max_groups=4)),
    mpd=MultiPeriodConfig(periods=(2, 3),
                          discriminator=PeriodDiscriminatorConfig(
                              channels=4, max_downsample_channels=16)))

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
    "generator_optimizer_params": {"lr": 1e-3, "betas": [0.5, 0.9]},
    "discriminator_optimizer_params": {"lr": 2e-4, "betas": [0.5, 0.9]},
    "generator_scheduler_params": {"step_size": 200000, "gamma": 1.0},
    "discriminator_scheduler_params": {"gamma": 0.5,
                                       "milestones": [200000]},
    "generator_grad_norm": -1, "discriminator_grad_norm": -1,
}


def make_state(key=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    gen = generator_init(k1, GEN_CFG)
    disc = hifigan_discriminator_init(k2, DISC_CFG)
    gen_opt = make_optimizer(CONFIG, "generator")
    disc_opt = make_optimizer(CONFIG, "discriminator")
    state = {"gen": gen, "disc": disc,
             "gen_opt": gen_opt.init(gen), "disc_opt": disc_opt.init(disc)}
    return state, gen_opt, disc_opt


def disc_apply(p, x):
    return hifigan_discriminator_apply(p, x, DISC_CFG)


@pytest.fixture(scope="module")
def steps_and_state():
    state, gen_opt, disc_opt = make_state()
    crit = build_criterion(CONFIG)
    steps = make_autoencoder_steps(GEN_CFG, disc_apply, CONFIG, crit,
                                   gen_opt, disc_opt, jit=True)
    return steps, state


def test_schedules():
    s = step_lr(1e-4, 200000, gamma=1.0)
    assert float(s(0)) == pytest.approx(1e-4)
    assert float(s(500000)) == pytest.approx(1e-4)
    m = multi_step_lr(2e-4, [200000, 400000], 0.5)
    assert float(m(0)) == pytest.approx(2e-4)
    assert float(m(200000)) == pytest.approx(1e-4)
    assert float(m(400001)) == pytest.approx(5e-5)


def test_metric_phase_learns_and_updates_ema(steps_and_state):
    steps, state = steps_and_state
    x = jnp.asarray(0.1 * np.random.default_rng(0)
                    .standard_normal((2, 600, 1)).astype(np.float32))
    embed0 = np.asarray(state["gen"]["quantizer"]["embed"]).copy()
    enc0 = np.asarray(state["gen"]["encoder"]["conv"]["w"]).copy()

    losses = []
    for _ in range(5):
        state, metrics = steps["metric"](state, x)
        losses.append(float(metrics["generator_loss"]))
    assert all(np.isfinite(losses))
    # overfitting a fixed batch: loss should drop
    assert losses[-1] < losses[0]
    # EMA codebook moved, encoder weights moved
    assert not np.allclose(np.asarray(state["gen"]["quantizer"]["embed"]),
                           embed0)
    assert not np.allclose(np.asarray(state["gen"]["encoder"]["conv"]["w"]),
                           enc0)
    # stash for adv test
    steps_and_state_cache["state"] = state


steps_and_state_cache = {}


def test_adv_phase_freezes_encoder_and_codebook(steps_and_state):
    steps, _ = steps_and_state
    state = steps_and_state_cache["state"]
    x = jnp.asarray(0.1 * np.random.default_rng(1)
                    .standard_normal((2, 600, 1)).astype(np.float32))
    enc0 = np.asarray(state["gen"]["encoder"]["conv"]["w"]).copy()
    proj0 = np.asarray(state["gen"]["projector"]["conv"]["w"]).copy()
    embed0 = np.asarray(state["gen"]["quantizer"]["embed"]).copy()
    dec0 = np.asarray(state["gen"]["decoder"]["conv1"]["w"]).copy()
    disc0 = jax.tree_util.tree_leaves(state["disc"])[0].copy()

    for _ in range(3):
        state, metrics = steps["adv"](state, x)
    assert np.isfinite(float(metrics["generator_loss"]))
    assert np.isfinite(float(metrics["discriminator_loss"]))
    # frozen: encoder, projector, codebook (efficient paradigm)
    np.testing.assert_array_equal(
        np.asarray(state["gen"]["encoder"]["conv"]["w"]), enc0)
    np.testing.assert_array_equal(
        np.asarray(state["gen"]["projector"]["conv"]["w"]), proj0)
    np.testing.assert_array_equal(
        np.asarray(state["gen"]["quantizer"]["embed"]), embed0)
    # training: decoder + discriminator
    assert not np.allclose(np.asarray(state["gen"]["decoder"]["conv1"]["w"]),
                           dec0)
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state["disc"])[0]), disc0)
    steps_and_state_cache["state"] = state


def test_eval_step(steps_and_state):
    steps, _ = steps_and_state
    state = steps_and_state_cache["state"]
    x = jnp.asarray(0.1 * np.random.default_rng(2)
                    .standard_normal((2, 600, 1)).astype(np.float32))
    m = steps["eval"](state, x)
    assert np.isfinite(float(m["generator_loss"]))


def test_checkpoint_roundtrip(tmp_path, steps_and_state):
    state = steps_and_state_cache["state"]
    p = str(tmp_path / "ck.ckpt")
    save_checkpoint(p, state, steps=123, extra={"tag": "t"})
    restored, header = load_checkpoint(p, template=state)
    assert header["steps"] == 123 and header["tag"] == "t"
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params-only load
    gen_only, _ = load_only_params(p, "gen", template=state["gen"])
    np.testing.assert_array_equal(
        np.asarray(gen_only["quantizer"]["embed"]),
        np.asarray(state["gen"]["quantizer"]["embed"]))


def test_denoise_freezes_quantizer_and_decoder():
    state, gen_opt, _ = make_state(3)
    state = {"gen": state["gen"], "gen_opt": state["gen_opt"]}
    crit = build_criterion(CONFIG)
    steps = make_denoise_steps(GEN_CFG, CONFIG, crit, gen_opt, jit=True)
    rng = np.random.default_rng(4)
    x_n = jnp.asarray(0.1 * rng.standard_normal((2, 600, 1)).astype(
        np.float32))
    x_c = jnp.asarray(0.1 * rng.standard_normal((2, 600, 1)).astype(
        np.float32))
    dec0 = np.asarray(state["gen"]["decoder"]["conv1"]["w"]).copy()
    q0 = np.asarray(state["gen"]["quantizer"]["embed"]).copy()
    enc0 = np.asarray(state["gen"]["encoder"]["conv"]["w"]).copy()
    for _ in range(2):
        state, m = steps["train"](state, x_n, x_c)
    np.testing.assert_array_equal(
        np.asarray(state["gen"]["decoder"]["conv1"]["w"]), dec0)
    np.testing.assert_array_equal(
        np.asarray(state["gen"]["quantizer"]["embed"]), q0)
    assert not np.allclose(np.asarray(state["gen"]["encoder"]["conv"]["w"]),
                           enc0)
    assert np.isfinite(float(m["generator_loss"]))


def test_weight_normed_generator_training():
    """Weight-norm reparametrized generator (symAAD/vocoder-style): resolve
    is value-preserving at init, and a metric step trains g/v."""
    from audiodec_tpu.models.autoencoder import generator_forward
    from audiodec_tpu.ops.norms import apply_weight_norm_tree, resolve_params

    gen = generator_init(jax.random.PRNGKey(21), GEN_CFG)
    tp = tuple(f"decoder/blocks/{i}/conv"
               for i in range(len(GEN_CFG.dec_strides)))
    gen_wn = apply_weight_norm_tree(gen, transposed_paths=tp)
    assert "v" in gen_wn["encoder"]["conv"] and "g" in gen_wn["encoder"]["conv"]
    assert "embed" in gen_wn["quantizer"]  # untouched

    eff, _ = resolve_params(gen_wn)
    x = jnp.asarray(0.1 * np.random.default_rng(22)
                    .standard_normal((1, 600, 1)).astype(np.float32))
    y0, *_ = generator_forward(gen, x, GEN_CFG, train=False)
    y1, *_ = generator_forward(eff, x, GEN_CFG, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5,
                               atol=1e-6)

    gen_opt = make_optimizer(CONFIG, "generator")
    disc = hifigan_discriminator_init(jax.random.PRNGKey(23), DISC_CFG)
    disc_opt = make_optimizer(CONFIG, "discriminator")
    state = {"gen": gen_wn, "disc": disc, "gen_opt": gen_opt.init(gen_wn),
             "disc_opt": disc_opt.init(disc)}
    crit = build_criterion(CONFIG)
    steps = make_autoencoder_steps(GEN_CFG, disc_apply, CONFIG, crit,
                                   gen_opt, disc_opt, jit=False)
    g0 = np.asarray(state["gen"]["encoder"]["conv"]["g"]).copy()
    state, m = steps["metric"](state, x)
    assert np.isfinite(float(m["generator_loss"]))
    assert not np.allclose(np.asarray(state["gen"]["encoder"]["conv"]["g"]),
                           g0)


def test_weight_normed_checkpoint_loads_into_plain_template(tmp_path):
    """Checkpoints from weight-norm-reparametrized training must load into
    plain inference templates (norms folded at load)."""
    from audiodec_tpu.models.autoencoder import generator_forward
    from audiodec_tpu.ops.norms import apply_weight_norm_tree

    gen = generator_init(jax.random.PRNGKey(31), GEN_CFG)
    tp = tuple(f"decoder/blocks/{i}/conv"
               for i in range(len(GEN_CFG.dec_strides)))
    gen_wn = apply_weight_norm_tree(gen, transposed_paths=tp)
    p = str(tmp_path / "wn.ckpt")
    save_checkpoint(p, {"gen": gen_wn}, steps=1)

    template = generator_init(jax.random.PRNGKey(32), GEN_CFG)
    loaded, _ = load_only_params(p, "gen", template=template)
    x = jnp.asarray(0.1 * np.random.default_rng(33)
                    .standard_normal((1, 600, 1)).astype(np.float32))
    y_ref, *_ = generator_forward(gen, x, GEN_CFG, train=False)
    y, *_ = generator_forward(loaded, x, GEN_CFG, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5,
                               atol=1e-6)


def test_univnet_adv_step_runs():
    """Adversarial step with the UnivNet MRSD+MPD discriminator (STFT inside
    jit)."""
    from audiodec_tpu.models.discriminators import (
        MultiResolutionSpectralConfig,
        UnivNetDiscriminatorConfig,
        univnet_discriminator_apply,
        univnet_discriminator_init,
    )
    ucfg = UnivNetDiscriminatorConfig(
        mrsd=MultiResolutionSpectralConfig(
            fft_sizes=(256,), hop_sizes=(64,), win_lengths=(128,)),
        mpd=DISC_CFG.mpd)
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    gen = generator_init(k1, GEN_CFG)
    disc = univnet_discriminator_init(k2, ucfg)
    gen_opt = make_optimizer(CONFIG, "generator")
    disc_opt = make_optimizer(CONFIG, "discriminator")
    state = {"gen": gen, "disc": disc, "gen_opt": gen_opt.init(gen),
             "disc_opt": disc_opt.init(disc)}
    crit = build_criterion(CONFIG)
    steps = make_autoencoder_steps(
        GEN_CFG, lambda p, x: univnet_discriminator_apply(p, x, ucfg),
        CONFIG, crit, gen_opt, disc_opt, jit=True)
    x = jnp.asarray(0.1 * np.random.default_rng(12)
                    .standard_normal((2, 600, 1)).astype(np.float32))
    state, m = steps["adv"](state, x)
    assert np.isfinite(float(m["discriminator_loss"]))


def test_vocoder_steps_run():
    voc_cfg = VocoderConfig(in_channels=8, channels=16,
                            upsample_scales=(5, 5, 4, 3),
                            upsample_kernel_sizes=(10, 10, 8, 6),
                            resblock_kernel_sizes=(3,),
                            resblock_dilations=((1, 2),), groups=2)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    analyzer = generator_init(k1, GEN_CFG)
    voc = vocoder_init(k2, voc_cfg)
    disc = hifigan_discriminator_init(k3, DISC_CFG)
    gen_opt = make_optimizer(CONFIG, "generator")
    disc_opt = make_optimizer(CONFIG, "discriminator")
    state = {"gen": voc, "disc": disc, "analyzer": analyzer,
             "gen_opt": gen_opt.init(voc), "disc_opt": disc_opt.init(disc)}
    crit = build_criterion(CONFIG)
    steps = make_vocoder_steps(voc_cfg, GEN_CFG, disc_apply, CONFIG, crit,
                               gen_opt, disc_opt, jit=True)
    x = jnp.asarray(0.1 * np.random.default_rng(5)
                    .standard_normal((2, 600, 1)).astype(np.float32))
    an0 = np.asarray(analyzer["encoder"]["conv"]["w"]).copy()
    state, m1 = steps["metric"](state, x)
    state, m2 = steps["adv"](state, x)
    assert np.isfinite(float(m1["generator_loss"]))
    assert np.isfinite(float(m2["discriminator_loss"]))
    # analyzer is frozen
    np.testing.assert_array_equal(
        np.asarray(state["analyzer"]["encoder"]["conv"]["w"]), an0)
    m3 = steps["eval"](state, x)
    assert np.isfinite(float(m3["generator_loss"]))


def test_bn_projector_train_steps_update_running_stats():
    """conv1d_bn variant through metric + adv steps: BN running stats are
    buffer-driven (metric: 1 forward; adv: 2 forwards, ref
    autoencoder.py:117-126 re-forward under no_grad still updates torch BN
    buffers), and frozen in neither case optimizer-perturbed."""
    cfg_bn = GeneratorConfig(encode_channels=2, decode_channels=2, code_dim=8,
                             codebook_num=2, codebook_size=16,
                             projector="conv1d_bn")
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    gen = generator_init(k1, cfg_bn)
    disc = hifigan_discriminator_init(k2, DISC_CFG)
    crit = build_criterion(CONFIG)
    gen_opt = make_optimizer(CONFIG, "generator")
    disc_opt = make_optimizer(CONFIG, "discriminator")
    steps = make_autoencoder_steps(cfg_bn, disc_apply, CONFIG, crit,
                                   gen_opt, disc_opt, jit=False)
    state = {"gen": gen, "disc": disc,
             "gen_opt": gen_opt.init(gen), "disc_opt": disc_opt.init(disc)}
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 1200, 1)).astype(np.float32))

    state, rec = steps["metric"](state, x)
    bn = state["gen"]["projector"]["bn"]
    assert float(bn["count"]) == 1.0
    assert np.any(np.asarray(bn["mean"]) != 0.0)
    # running var moved toward the (small) batch var: 0.9*1 + 0.1*var_b < 1
    assert np.all(np.asarray(bn["var"]) < 1.0)

    state, rec = steps["adv"](state, x)
    bn2 = state["gen"]["projector"]["bn"]
    # two forwards in the adv step (gen loss + disc re-forward)
    assert float(bn2["count"]) == 3.0
    assert np.isfinite(rec["generator_loss"])
