"""Multi-resolution log-mel L1 loss (ref: losses/mel_loss.py:97-155)."""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from audiodec_tpu.ops.spectral import mel_spectrogram


@dataclasses.dataclass(frozen=True)
class MultiMelSpectrogramLoss:
    fs: int = 22050
    fft_sizes: Sequence[int] = (1024, 2048, 512)
    hop_sizes: Sequence[int] = (120, 240, 50)
    win_lengths: Sequence[int] = (600, 1200, 240)
    num_mels: int = 80
    fmin: float | None = 80
    fmax: float | None = 7600
    log_base: float | None = 10.0

    def __call__(self, y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """y_hat, y: (B, T, C) waveforms -> scalar L1 log-mel loss."""
        yh = y_hat.transpose(0, 2, 1).reshape(-1, y_hat.shape[1])
        yr = y.transpose(0, 2, 1).reshape(-1, y.shape[1])
        loss = 0.0
        for fft, hop, win in zip(self.fft_sizes, self.hop_sizes,
                                 self.win_lengths):
            mh = mel_spectrogram(yh, fs=self.fs, fft_size=fft, hop_size=hop,
                                 win_length=win, num_mels=self.num_mels,
                                 fmin=self.fmin, fmax=self.fmax,
                                 log_base=self.log_base)
            mr = mel_spectrogram(yr, fs=self.fs, fft_size=fft, hop_size=hop,
                                 win_length=win, num_mels=self.num_mels,
                                 fmin=self.fmin, fmax=self.fmax,
                                 log_base=self.log_base)
            loss = loss + jnp.mean(jnp.abs(mh - mr))
        return loss / len(self.fft_sizes)


def from_config(fs: int, params: dict) -> MultiMelSpectrogramLoss:
    """Build from the YAML mel_loss_params block
    (ref: config/autoencoder/symAD_vctk_48000_hop300.yaml:84-94)."""
    return MultiMelSpectrogramLoss(
        fs=params.get("fs", fs),
        fft_sizes=tuple(params.get("fft_sizes", (1024, 2048, 512))),
        hop_sizes=tuple(params.get("hop_sizes", (120, 240, 50))),
        win_lengths=tuple(params.get("win_lengths", (600, 1200, 240))),
        num_mels=params.get("num_mels", 80),
        fmin=params.get("fmin", 80),
        fmax=params.get("fmax", 7600),
        log_base=params.get("log_base", 10.0),
    )
