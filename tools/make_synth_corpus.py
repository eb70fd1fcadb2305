"""Generate a deterministic speech-like synthetic corpus (48 kHz mono).

Each utterance is a harmonic source with a wandering f0 (80-300 Hz),
formant-shaped harmonic amplitudes, syllable-rate voicing envelope, and a
breath-noise floor — structured enough for the codec to learn, unlike white
noise.  Used for hardware-validated training/quality runs when no licensed
speech corpus is available in the environment (the reference trains on
VCTK/LibriTTS, ref README.md).

Usage: python tools/make_synth_corpus.py --out data/synth \
           [--train 120 --valid 12 --test 12 --seed 0]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 48000


def synth_utterance(rng: np.random.Generator, seconds: float) -> np.ndarray:
    T = int(seconds * SR)
    t = np.arange(T) / SR

    # wandering f0: base pitch + slow vibrato + random walk
    base = rng.uniform(80.0, 300.0)
    walk = np.cumsum(rng.standard_normal(T)) / SR
    walk = base * 0.2 * walk / (np.abs(walk).max() + 1e-9)
    vib = base * 0.03 * np.sin(2 * np.pi * rng.uniform(4, 7) * t)
    f0 = np.clip(base + walk + vib, 60.0, 400.0)
    phase = 2 * np.pi * np.cumsum(f0) / SR

    # formant-shaped harmonic stack (up to 20 kHz)
    n_h = int(20000 // base)
    h = np.arange(1, n_h + 1)
    formants = rng.uniform(300, 3500, size=3)
    bw = rng.uniform(80, 300, size=3)
    freqs = h[:, None] * base
    shape = (1.0 / h)[:, None] * (
        1.0 + 4.0 * np.exp(-((freqs - formants[None, :]) ** 2)
                           / (2 * bw[None, :] ** 2)).sum(-1, keepdims=True))
    amps = shape[:, 0]
    voiced = (amps[:, None] * np.sin(h[:, None] * phase[None, :])).sum(0)

    # syllable-rate voicing envelope (2-5 Hz raised cosine gates)
    rate = rng.uniform(2.0, 5.0)
    env = 0.5 * (1 + np.sin(2 * np.pi * rate * t + rng.uniform(0, 2 * np.pi)))
    env = env ** rng.uniform(0.5, 2.0)

    # breath-noise floor, first-order lowpassed
    noise = rng.standard_normal(T)
    a = 0.98
    b = np.empty_like(noise)
    acc = 0.0
    # vectorized IIR via lfilter-free cumulative form is overkill; short files
    for i in range(T):
        acc = a * acc + (1 - a) * noise[i]
        b[i] = acc

    x = env * voiced + 0.02 * b
    x = 0.6 * x / (np.abs(x).max() + 1e-9)
    return x.astype(np.float32)[:, None]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="data/synth")
    parser.add_argument("--train", type=int, default=120)
    parser.add_argument("--valid", type=int, default=12)
    parser.add_argument("--test", type=int, default=12)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from audiodec_tpu.data import write_wav

    rng = np.random.default_rng(args.seed)
    for sub, n in (("train", args.train), ("valid", args.valid),
                   ("test", args.test)):
        d = os.path.join(args.out, sub)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            x = synth_utterance(rng, seconds=float(rng.uniform(2.0, 4.0)))
            write_wav(os.path.join(d, f"{sub}_{i:04d}.wav"), x, SR)
        print(f"{sub}: {n} utterances -> {d}")


if __name__ == "__main__":
    main()
