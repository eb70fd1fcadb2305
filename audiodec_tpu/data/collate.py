"""Batch collaters: random fixed-length crops (ref: dataloader/collater.py).

Outputs are (B, T, C) float32 numpy arrays in our channels-last layout.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


class CollaterAudio:
    """Random crop to batch_length; clips shorter than batch_length are
    dropped (ref: dataloader/collater.py:18-60)."""

    def __init__(self, batch_length: int, seed: int = 0):
        self.batch_length = batch_length
        self.rng = np.random.default_rng(seed)

    def __call__(self, batch: List[np.ndarray]) -> np.ndarray:
        batch = [b for b in batch if len(b) > self.batch_length]
        if not batch:
            return np.zeros((0, self.batch_length, 1), np.float32)
        xs = []
        for b in batch:
            start = int(self.rng.integers(0, len(b) - self.batch_length))
            xs.append(b[start:start + self.batch_length])
        return np.stack(xs).astype(np.float32)  # (B, T, C)


class CollaterAudioPair:
    """Identical crop offsets applied to (noisy, clean) pairs
    (ref: dataloader/collater.py:63-87)."""

    def __init__(self, batch_length: int, seed: int = 0):
        self.batch_length = batch_length
        self.rng = np.random.default_rng(seed)

    def __call__(self, batch) -> Tuple[np.ndarray, np.ndarray]:
        batch = [b for b in batch
                 if (len(b[0]) > self.batch_length
                     and len(b[0]) == len(b[1]))]
        if not batch:
            z = np.zeros((0, self.batch_length, 1), np.float32)
            return z, z
        xs, ns = [], []
        for n, c in batch:  # (noisy, clean) ordering like the reference
            start = int(self.rng.integers(0, len(c) - self.batch_length))
            ns.append(n[start:start + self.batch_length])
            xs.append(c[start:start + self.batch_length])
        return (np.stack(ns).astype(np.float32),
                np.stack(xs).astype(np.float32))
