"""Waveform envelope (shape) loss (ref: losses/waveform_loss.py:15-75)."""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp


def _maxpool1d(x: jnp.ndarray, winlen: int) -> jnp.ndarray:
    """torch MaxPool1d(winlen): kernel=stride=winlen, no padding.
    x: (B, T, C)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, winlen, 1), window_strides=(1, winlen, 1),
        padding="VALID")


@dataclasses.dataclass(frozen=True)
class MultiWindowShapeLoss:
    winlen: Sequence[int] = (300, 200, 100)

    def __call__(self, y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """y_hat, y: (B, T, C)."""
        loss = 0.0
        for wl in self.winlen:
            ys = _maxpool1d(jnp.abs(y), wl)
            ysh = _maxpool1d(jnp.abs(y_hat), wl)
            loss = loss + jnp.mean(jnp.abs(ysh - ys))
        return loss / len(self.winlen)
