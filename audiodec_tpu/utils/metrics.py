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
