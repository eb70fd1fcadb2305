"""STFT/mel/loss parity vs torch oracles (spec: losses/*.py in the
reference)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from audiodec_tpu.losses import (
    MultiWindowShapeLoss,
    discriminator_adversarial_loss,
    feature_match_loss,
    generator_adversarial_loss,
)
from audiodec_tpu.ops.spectral import (
    hann_window,
    mel_filterbank,
    stft_magnitude,
)

RNG = np.random.default_rng(5)


def test_hann_window_matches_torch():
    for n in (240, 600, 1200):
        np.testing.assert_allclose(hann_window(n),
                                   torch.hann_window(n).numpy(), atol=1e-6)


@pytest.mark.parametrize("fft,hop,win", [(512, 50, 240), (1024, 120, 600),
                                         (2048, 300, 2048)])
def test_stft_magnitude_matches_torch(fft, hop, win):
    x = RNG.standard_normal((2, 4800)).astype(np.float32)
    ref = torch.stft(torch.tensor(x), fft, hop, win, torch.hann_window(win),
                     return_complex=True)
    ref_mag = ref.abs().numpy().transpose(0, 2, 1)  # (B, T', F)
    mag = stft_magnitude(jnp.asarray(x), fft, hop, win)
    assert mag.shape == ref_mag.shape
    np.testing.assert_allclose(np.asarray(mag), ref_mag, rtol=1e-3, atol=1e-4)


def test_stft_with_pad_matches_torchaudio_convention():
    """pad=win//2 then center-reflect, the UnivNet spectral-disc input
    (ref: discriminator.py:557-566)."""
    fft, hop, win = 512, 50, 240
    x = RNG.standard_normal((1, 2400)).astype(np.float32)
    xp = F.pad(torch.tensor(x), (win // 2, win // 2))
    ref = torch.stft(xp, fft, hop, win, torch.hann_window(win),
                     return_complex=True).abs().numpy().transpose(0, 2, 1)
    mag = stft_magnitude(jnp.asarray(x), fft, hop, win, pad=win // 2)
    np.testing.assert_allclose(np.asarray(mag), ref, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_properties():
    """Slaney filterbank invariants (librosa-equivalent construction)."""
    fb = mel_filterbank(48000, 2048, 80, 0.0, 24000.0)  # (F, n_mels)
    assert fb.shape == (1025, 80)
    assert np.all(fb >= 0)
    # each filter is a single triangle: unimodal with one argmax
    for m in range(80):
        col = fb[:, m]
        assert col.max() > 0
    # slaney normalization: filter area ~ 2 / bandwidth => peak heights
    # decrease with center frequency for log-spaced filters
    peaks = fb.max(axis=0)
    assert peaks[10] > peaks[70]
    # mel centers are increasing
    centers = fb.argmax(axis=0)
    assert np.all(np.diff(centers) >= 0)


def test_adversarial_losses_match_torch_oracle():
    outs = [[torch.tensor(RNG.standard_normal((2, 5)).astype(np.float32))
             for _ in range(3)] for _ in range(4)]
    outs_hat = [[torch.tensor(RNG.standard_normal((2, 5)).astype(np.float32))
                 for _ in range(3)] for _ in range(4)]

    # torch oracle (ref adversarial_loss.py)
    g_ref = float(np.mean([F.mse_loss(o[-1], torch.ones_like(o[-1])).item()
                           for o in outs_hat]))
    real_ref = float(np.mean([F.mse_loss(o[-1],
                                         torch.ones_like(o[-1])).item()
                              for o in outs]))
    fake_ref = float(np.mean([F.mse_loss(o[-1],
                                         torch.zeros_like(o[-1])).item()
                              for o in outs_hat]))

    j_outs = [[jnp.asarray(t.numpy()) for t in o] for o in outs]
    j_hat = [[jnp.asarray(t.numpy()) for t in o] for o in outs_hat]
    np.testing.assert_allclose(float(generator_adversarial_loss(j_hat)),
                               g_ref, rtol=1e-5)
    real, fake = discriminator_adversarial_loss(j_hat, j_outs)
    np.testing.assert_allclose(float(real), real_ref, rtol=1e-5)
    np.testing.assert_allclose(float(fake), fake_ref, rtol=1e-5)


def test_feature_match_loss_matches_torch_oracle():
    feats = [[torch.tensor(RNG.standard_normal((2, 6)).astype(np.float32))
              for _ in range(4)] for _ in range(3)]
    feats_hat = [[torch.tensor(RNG.standard_normal((2, 6)).astype(np.float32))
                  for _ in range(4)] for _ in range(3)]
    ref = 0.0
    for fh, f in zip(feats_hat, feats):
        inner = sum(F.l1_loss(a, b).item() for a, b in zip(fh[:-1], f[:-1]))
        ref += inner / 3
    ref /= 3

    j_f = [[jnp.asarray(t.numpy()) for t in o] for o in feats]
    j_fh = [[jnp.asarray(t.numpy()) for t in o] for o in feats_hat]
    np.testing.assert_allclose(float(feature_match_loss(j_fh, j_f)), ref,
                               rtol=1e-5)


def test_shape_loss_matches_torch_oracle():
    y = RNG.standard_normal((2, 1, 1200)).astype(np.float32)
    yh = RNG.standard_normal((2, 1, 1200)).astype(np.float32)
    ref = 0.0
    for wl in (300, 200, 100):
        mp = torch.nn.MaxPool1d(wl)
        ref += F.l1_loss(mp(torch.tensor(yh).abs()),
                         mp(torch.tensor(y).abs())).item()
    ref /= 3
    loss = MultiWindowShapeLoss()(jnp.asarray(yh.transpose(0, 2, 1)),
                                  jnp.asarray(y.transpose(0, 2, 1)))
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)
