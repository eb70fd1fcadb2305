"""Waveform quality metrics for codec evaluation (SNR / log-mel distance),
used to validate decoded output against the reference decoder's output
(BASELINE.json: decoded SNR >= reference)."""

from __future__ import annotations

import numpy as np


def snr_db(reference: np.ndarray, estimate: np.ndarray) -> float:
    """Signal-to-noise ratio of `estimate` against `reference` in dB."""
    reference = np.asarray(reference, np.float64).ravel()
    estimate = np.asarray(estimate, np.float64).ravel()
    n = min(len(reference), len(estimate))
    reference, estimate = reference[:n], estimate[:n]
    noise = reference - estimate
    p_sig = np.sum(reference ** 2)
    p_noise = np.sum(noise ** 2)
    if p_noise == 0:
        return float("inf")
    return float(10.0 * np.log10(p_sig / max(p_noise, 1e-30)))


def mel_distance(a: np.ndarray, b: np.ndarray, sr: int,
                 fft_size: int = 2048, hop: int = 300,
                 num_mels: int = 80) -> float:
    """Mean L1 log-mel distance between two mono waveforms."""
    import jax.numpy as jnp

    from audiodec_tpu.ops.spectral import mel_spectrogram

    n = min(len(a), len(b))
    ma = mel_spectrogram(jnp.asarray(a[:n], jnp.float32)[None],
                         fs=sr, fft_size=fft_size, hop_size=hop,
                         num_mels=num_mels, fmin=0, fmax=sr / 2,
                         log_base=None)
    mb = mel_spectrogram(jnp.asarray(b[:n], jnp.float32)[None],
                         fs=sr, fft_size=fft_size, hop_size=hop,
                         num_mels=num_mels, fmin=0, fmax=sr / 2,
                         log_base=None)
    return float(np.mean(np.abs(np.asarray(ma) - np.asarray(mb))))


def mcd_db(a: np.ndarray, b: np.ndarray, sr: int,
           fft_size: int = 2048, hop: int = 300,
           num_mels: int = 80, n_coef: int = 13) -> float:
    """Mel-cepstral distortion (dB) between two mono waveforms.

    The standard objective proxy for listening quality where MOS (the
    reference's own evidence, figs/mos.jpg) cannot be run.  MFCC-based
    variant: log-mel spectrogram (natural log, same front-end as
    mel_distance) -> orthonormal DCT-II over the mel axis -> cepstral
    coefficients 1..n_coef (c0/energy excluded), then
    MCD = (10*sqrt(2)/ln 10) * mean over frames of the L2 coefficient
    distance.  Lower is better; identical signals score 0.
    """
    import jax.numpy as jnp

    from audiodec_tpu.ops.spectral import mel_spectrogram

    n = min(len(a), len(b))

    def logmel(x):
        m = mel_spectrogram(jnp.asarray(x[:n], jnp.float32)[None],
                            fs=sr, fft_size=fft_size, hop_size=hop,
                            num_mels=num_mels, fmin=0, fmax=sr / 2,
                            log_base=None)
        return np.asarray(m, np.float64)[0]  # (T', M)

    ma, mb = logmel(a), logmel(b)
    # orthonormal DCT-II rows 1..n_coef over the mel axis
    m_idx = np.arange(num_mels)
    k_idx = np.arange(1, n_coef + 1)
    dct = np.cos(np.pi * k_idx[:, None] * (m_idx[None, :] + 0.5)
                 / num_mels) * np.sqrt(2.0 / num_mels)
    ca, cb = ma @ dct.T, mb @ dct.T  # (T', n_coef)
    dist = np.sqrt(np.sum((ca - cb) ** 2, axis=-1))
    return float(10.0 * np.sqrt(2.0) / np.log(10.0) * np.mean(dist))
