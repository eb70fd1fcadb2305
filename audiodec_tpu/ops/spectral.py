"""Spectral ops: torch.stft-compatible STFT and a slaney mel filterbank.

Semantics match what the reference's losses rely on (ref: losses/mel_loss.py,
losses/stft_loss.py, and the UnivNet spectral discriminator's
torchaudio.spectrogram call):

- torch.stft defaults: center=True, reflect padding of n_fft//2, hann window
  (periodic), window zero-padded to n_fft if win_length < n_fft, onesided.
- librosa.filters.mel defaults: slaney mel scale, slaney area normalization
  (ref: losses/mel_loss.py:54-61).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """torch.hann_window (periodic=True)."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return w.astype(dtype)


def _padded_window(win_length: int, fft_size: int) -> np.ndarray:
    w = hann_window(win_length)
    if win_length < fft_size:
        left = (fft_size - win_length) // 2
        w = np.pad(w, (left, fft_size - win_length - left))
    return w


def frame_signal(x: jnp.ndarray, fft_size: int, hop_size: int,
                 center: bool = True, pad: int = 0) -> jnp.ndarray:
    """x: (B, T) -> frames (B, n_frames, fft_size).

    center=True reflect-pads by fft_size//2 on both sides (torch.stft);
    `pad` adds extra constant zero padding first (torchaudio.spectrogram's
    `pad` argument)."""
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad)))
    if center:
        x = jnp.pad(x, ((0, 0), (fft_size // 2, fft_size // 2)),
                    mode="reflect")
    t = x.shape[1]
    n_frames = 1 + (t - fft_size) // hop_size
    idx = (np.arange(n_frames)[:, None] * hop_size
           + np.arange(fft_size)[None, :])
    return x[:, idx]


def stft_magnitude(x: jnp.ndarray, fft_size: int, hop_size: int,
                   win_length: int, *, center: bool = True, pad: int = 0,
                   eps: float = 0.0) -> jnp.ndarray:
    """|STFT| with torch.stft conventions.  x: (B, T) -> (B, n_frames, F).

    eps > 0 applies sqrt(clamp(power, min=eps)) like the reference losses."""
    window = jnp.asarray(_padded_window(win_length, fft_size))
    frames = frame_signal(x, fft_size, hop_size, center=center, pad=pad)
    spec = jnp.fft.rfft(frames * window, n=fft_size, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if eps > 0.0:
        return jnp.sqrt(jnp.clip(power, min=eps))
    return jnp.sqrt(power)


@lru_cache(maxsize=32)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float,
                   fmax: float) -> np.ndarray:
    """Slaney-scale, slaney-normalized mel filterbank, (1 + n_fft//2, n_mels).

    Numerically equivalent to librosa.filters.mel(htk=False, norm='slaney').T
    which the reference registers as `melmat` (ref: losses/mel_loss.py:54-61).
    """
    def hz_to_mel(f):
        f = np.asanyarray(f, dtype=np.float64)
        f_sp = 200.0 / 3
        mel = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(np.maximum(f, 1e-10)
                                             / min_log_hz) / logstep,
                        mel)

    def mel_to_hz(m):
        m = np.asanyarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        freqs)

    fftfreqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax),
                                  n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 + np.arange(n_mels)] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (F, n_mels)


def mel_spectrogram(x: jnp.ndarray, *, fs: int, fft_size: int, hop_size: int,
                    win_length: int | None = None, num_mels: int = 80,
                    fmin: float | None = 80, fmax: float | None = 7600,
                    eps: float = 1e-10, log_base: float | None = 10.0
                    ) -> jnp.ndarray:
    """Log-mel spectrogram matching the reference MelSpectrogram
    (ref: losses/mel_loss.py:74-94).  x: (B, T) -> (B, n_frames, n_mels)."""
    win_length = win_length or fft_size
    fmin = 0.0 if fmin is None else fmin
    fmax = fs / 2.0 if fmax is None else fmax
    amp = stft_magnitude(x, fft_size, hop_size, win_length, eps=eps)
    mel = jnp.matmul(amp, jnp.asarray(
        mel_filterbank(fs, fft_size, num_mels, fmin, fmax)))
    mel = jnp.clip(mel, min=eps)
    if log_base is None:
        return jnp.log(mel)
    if log_base == 2.0:
        return jnp.log2(mel)
    if log_base == 10.0:
        return jnp.log10(mel)
    raise ValueError(f"log_base: {log_base} is not supported.")
