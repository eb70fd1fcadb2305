"""Multi-resolution STFT loss: spectral convergence + log-magnitude L1
(ref: losses/stft_loss.py:19-170)."""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp

from audiodec_tpu.ops.spectral import stft_magnitude


@dataclasses.dataclass(frozen=True)
class MultiResolutionSTFTLoss:
    fft_sizes: Sequence[int] = (1024, 2048, 512)
    hop_sizes: Sequence[int] = (120, 240, 50)
    win_lengths: Sequence[int] = (600, 1200, 240)

    def __call__(self, y_hat, y) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """y_hat, y: (B, T, C) -> (sc_loss, mag_loss)."""
        xh = y_hat.transpose(0, 2, 1).reshape(-1, y_hat.shape[1])
        xr = y.transpose(0, 2, 1).reshape(-1, y.shape[1])
        sc, mag = 0.0, 0.0
        for fft, hop, win in zip(self.fft_sizes, self.hop_sizes,
                                 self.win_lengths):
            mh = stft_magnitude(xh, fft, hop, win, eps=1e-7)
            mr = stft_magnitude(xr, fft, hop, win, eps=1e-7)
            sc = sc + (jnp.linalg.norm(mr - mh) / jnp.linalg.norm(mr))
            mag = mag + jnp.mean(jnp.abs(jnp.log(mr) - jnp.log(mh)))
        n = len(self.fft_sizes)
        return sc / n, mag / n
