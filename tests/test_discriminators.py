"""Discriminator parity vs golden vectors (ref: models/vocoder/modules/
discriminator.py, HiFiGAN.py:308-395) plus norm-reparametrization checks."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodec_tpu.models.discriminators import (
    HiFiGANDiscriminatorConfig,
    MultiPeriodConfig,
    MultiResolutionSpectralConfig,
    MultiScaleConfig,
    PeriodDiscriminatorConfig,
    ScaleDiscriminatorConfig,
    UnivNetDiscriminatorConfig,
    hifigan_discriminator_apply,
    hifigan_discriminator_init,
    univnet_discriminator_apply,
    univnet_discriminator_init,
)
from audiodec_tpu.ops.norms import resolve_params
from audiodec_tpu.utils.torch_import import import_hifigan_discriminator

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

DISC_CFG = HiFiGANDiscriminatorConfig(
    msd=MultiScaleConfig(
        follow_official_norm=False,
        discriminator=ScaleDiscriminatorConfig(
            channels=16, max_downsample_channels=64)),
    mpd=MultiPeriodConfig(
        discriminator=PeriodDiscriminatorConfig(
            channels=8, max_downsample_channels=64)),
)


def test_hifigan_discriminator_parity():
    data = np.load(os.path.join(GOLDEN, "disc_hifigan.npz"))
    sd = {k[len("sd__"):]: data[k] for k in data.files if k.startswith("sd__")}
    params = import_hifigan_discriminator(sd, DISC_CFG)
    x = jnp.asarray(data["x"].transpose(0, 2, 1))
    outs = hifigan_discriminator_apply(params, x, DISC_CFG)

    assert len(outs) == int(data["n_branches"])
    for i, branch in enumerate(outs):
        assert len(branch) == int(data[f"n_layers_{i}"])
        for j, t in enumerate(branch):
            ref = data[f"out_{i}_{j}"]
            mine = np.asarray(t)
            if mine.ndim == 3:       # (B, T, C) vs torch (B, C, T)
                mine = mine.transpose(0, 2, 1)
            elif mine.ndim == 4:     # (B, H, W, C) vs torch (B, C, H, W)
                mine = mine.transpose(0, 3, 1, 2)
            np.testing.assert_allclose(mine, ref, rtol=1e-3, atol=1e-4,
                                       err_msg=f"branch {i} layer {j}")


def test_fresh_discriminator_runs_and_resolves_norms():
    cfg = DISC_CFG
    params = hifigan_discriminator_init(jax.random.PRNGKey(0), cfg)
    eff, updated = resolve_params(params)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 960, 1)).astype(np.float32))
    outs = hifigan_discriminator_apply(eff, x, cfg)
    assert len(outs) == 3 + 5  # 3 scales + 5 periods
    # follow_official_norm=False => all weight norm, no u vectors
    leaves = jax.tree_util.tree_leaves(updated)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_msd_norms_are_reference_noops():
    """Reference quirk: HiFiGANScaleDiscriminator's apply_weight_norm /
    apply_spectral_norm test isinstance(m, nn.Conv2d) but the MSD is Conv1d,
    so no norm is ever applied — even under follow_official_norm (ref:
    discriminator.py:355-373).  Our MSD init must therefore produce PLAIN
    conv params so the training trajectory matches torch
    (tests/test_train_step_parity.py pins this through real backprop)."""
    cfg = HiFiGANDiscriminatorConfig(
        msd=MultiScaleConfig(
            follow_official_norm=True,
            discriminator=ScaleDiscriminatorConfig(
                channels=16, max_downsample_channels=64)),
        mpd=DISC_CFG.mpd)
    params = hifigan_discriminator_init(jax.random.PRNGKey(1), cfg)
    for disc in params["msd"]["discriminators"]:
        for layer in disc["layers"]:
            assert set(layer) <= {"w", "b"}, layer.keys()
    # MPD is Conv2d-based: its weight norm IS applied in the reference
    assert "v" in params["mpd"]["discriminators"][0]["layers"][0]


def test_spectral_norm_unit_sigma():
    """After resolution, spectral-normed weights have sigma ~= 1 (the
    machinery itself, used when a non-reference config requests it)."""
    from audiodec_tpu.ops.conv import conv1d_init
    from audiodec_tpu.ops.norms import spectral_norm_params

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    params = spectral_norm_params(k2, conv1d_init(k1, 15, 1, 16))
    for _ in range(50):
        eff, params = resolve_params(params)
    w = eff["w"]
    sigma = np.linalg.svd(np.asarray(w).reshape(-1, w.shape[-1]),
                          compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, rtol=1e-3)


def test_univnet_discriminator_runs():
    cfg = UnivNetDiscriminatorConfig(
        mrsd=MultiResolutionSpectralConfig(
            fft_sizes=(256, 512), hop_sizes=(64, 128),
            win_lengths=(128, 256)),
        mpd=DISC_CFG.mpd)
    params = univnet_discriminator_init(jax.random.PRNGKey(2), cfg)
    eff, _ = resolve_params(params)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((1, 960, 1)).astype(np.float32))
    outs = univnet_discriminator_apply(eff, x, cfg)
    assert len(outs) == 2 + 5
    assert all(np.isfinite(np.asarray(t)).all() for o in outs for t in o)


def test_univnet_mrsd_golden_parity():
    """MRSD vs the reference's own forward (golden dumped with a faithful
    torchaudio.functional.spectrogram substitute, ref discriminator.py:
    451-640)."""
    import dataclasses

    from audiodec_tpu.models.discriminators import (
        SpectralDiscriminatorConfig, mrsd_apply)
    from audiodec_tpu.utils.torch_import import import_univnet_mrsd

    data = np.load(os.path.join(GOLDEN, "disc_univnet.npz"))
    cfg = MultiResolutionSpectralConfig(
        discriminator=SpectralDiscriminatorConfig(channels=16))
    sd = {k[len("sd__"):]: data[k] for k in data.files if k.startswith("sd__")}
    params = import_univnet_mrsd(sd, cfg)
    x = jnp.asarray(data["x"].transpose(0, 2, 1))
    outs = mrsd_apply(params, x, cfg)

    assert len(outs) == int(data["n_branches"])
    for i, branch in enumerate(outs):
        assert len(branch) == int(data[f"n_layers_{i}"])
        for j, t in enumerate(branch):
            ref = data[f"out_{i}_{j}"]
            # ours: (B, T', F, C) NHWC; torch: (B, C, T', F)
            mine = np.asarray(t).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(mine, ref, rtol=1e-3, atol=1e-4,
                                       err_msg=f"resolution {i} layer {j}")


def test_batched_discriminator_equals_sequential():
    """The stacked one-conv-per-layer MSD/MPD variants == the sequential
    applies: every branch, every layer's feature map, exact shapes, values
    to f32-reassociation tolerance.  T chosen so periods 7 and 11 exercise
    the reflect-pad path."""
    cfg = HiFiGANDiscriminatorConfig()
    params = hifigan_discriminator_init(jax.random.PRNGKey(3), cfg)
    eff, _ = resolve_params(params)
    x = jnp.asarray(0.3 * np.random.default_rng(5)
                    .standard_normal((2, 96, 1)).astype(np.float32))

    seq = hifigan_discriminator_apply(eff, x, cfg)
    bat = hifigan_discriminator_apply(eff, x, cfg, batched=True)
    assert len(seq) == len(bat)
    for branch_s, branch_b in zip(seq, bat):
        assert len(branch_s) == len(branch_b)
        for a, b in zip(branch_s, branch_b):
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-5, atol=2e-6)


def test_batched_discriminator_gradients_match():
    """Gradients w.r.t. disc params through the batched path == sequential
    (the adv step trains through whichever variant ships)."""
    cfg = HiFiGANDiscriminatorConfig()
    params = hifigan_discriminator_init(jax.random.PRNGKey(4), cfg)
    x = jnp.asarray(0.3 * np.random.default_rng(6)
                    .standard_normal((1, 66, 1)).astype(np.float32))

    def loss(p, batched):
        eff, _ = resolve_params(p)
        outs = hifigan_discriminator_apply(eff, x, cfg, batched=batched)
        return sum(jnp.mean(jnp.square(o[-1] - 1.0)) for o in outs)

    g_seq = jax.grad(lambda p: loss(p, False))(params)
    g_bat = jax.grad(lambda p: loss(p, True))(params)
    # deep-backward accumulation reorders f32 sums; observed worst-case
    # deltas are ~5e-6 absolute on O(1e-2) grads (reassociation class)
    for a, b in zip(jax.tree_util.tree_leaves(g_seq),
                    jax.tree_util.tree_leaves(g_bat)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=2e-5)
