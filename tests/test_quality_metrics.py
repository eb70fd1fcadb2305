"""Decoded-waveform quality vs the reference implementation: SNR of our
decode against the reference decode on golden data (north-star: decoded SNR
>= reference; identical weights should agree to float precision)."""

import os

import numpy as np

import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    codec_state_init,
    decoder_apply,
)
from audiodec_tpu.ops.vq import rvq_lookup
from audiodec_tpu.utils.metrics import mel_distance, snr_db
from audiodec_tpu.utils.torch_import import import_autoencoder

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_decoded_snr_vs_reference():
    data = np.load(os.path.join(GOLDEN, "gen_symad.npz"))
    sd = {k[len("sd__"):]: data[k] for k in data.files if k.startswith("sd__")}
    cfg = GeneratorConfig()
    params = import_autoencoder(sd, cfg)

    idx = jnp.asarray(data["idx_stream"].T[None])  # (1, T', Q) flattened
    zq = rvq_lookup(idx, params["quantizer"], flattened=True)
    state = codec_state_init(1, cfg)
    y, _ = decoder_apply(params["decoder"], zq, cfg, state=state["decoder"])

    ref = data["y_stream"][0, 0]
    mine = np.asarray(y)[0, :, 0]
    s = snr_db(ref, mine)
    assert s > 60.0, f"decoded SNR vs reference only {s:.1f} dB"


def test_snr_and_mel_distance_sanity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(48000).astype(np.float32) * 0.3
    assert snr_db(x, x) == float("inf")
    noisy = x + 0.01 * rng.standard_normal(48000).astype(np.float32)
    s = snr_db(x, noisy)
    assert 25 < s < 35
    assert mel_distance(x, x, 48000) < 1e-6
    assert mel_distance(x, noisy, 48000) > 0


def test_mcd_identity_and_ordering():
    """MCD is 0 for identical signals and orders degradations: small
    noise < large noise (the property that makes it a quality proxy)."""
    from audiodec_tpu.utils.metrics import mcd_db

    rng = np.random.default_rng(3)
    sr = 48000
    t = np.arange(sr) / sr
    a = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    assert mcd_db(a, a, sr) == 0.0
    small = a + 0.001 * rng.standard_normal(len(a)).astype(np.float32)
    large = a + 0.05 * rng.standard_normal(len(a)).astype(np.float32)
    m_small, m_large = mcd_db(a, small, sr), mcd_db(a, large, sr)
    assert 0 < m_small < m_large


def test_mcd_matches_numpy_oracle():
    """The DCT/cepstral bookkeeping vs an independent numpy oracle built
    straight from the definition (orthonormal DCT-II of the log-mel,
    coefficients 1..13, (10*sqrt(2)/ln10) * mean L2)."""
    import jax.numpy as jnp

    from audiodec_tpu.ops.spectral import mel_spectrogram
    from audiodec_tpu.utils.metrics import mcd_db

    rng = np.random.default_rng(4)
    sr, n = 48000, 24000
    a = (0.3 * rng.standard_normal(n)).astype(np.float32)
    b = (a + 0.01 * rng.standard_normal(n)).astype(np.float32)

    def logmel(x):
        m = mel_spectrogram(jnp.asarray(x, jnp.float32)[None], fs=sr,
                            fft_size=2048, hop_size=300, num_mels=80,
                            fmin=0, fmax=sr / 2, log_base=None)
        return np.asarray(m, np.float64)[0]

    ma, mb = logmel(a), logmel(b)
    M, K = 80, 13
    want_frames = []
    for fa, fb in zip(ma, mb):
        ca = [np.sqrt(2.0 / M) * np.sum(
            (fa - fb) * np.cos(np.pi * k * (np.arange(M) + 0.5) / M))
            for k in range(1, K + 1)]
        want_frames.append(np.sqrt(np.sum(np.square(ca))))
    want = 10.0 * np.sqrt(2.0) / np.log(10.0) * np.mean(want_frames)
    got = mcd_db(a, b, sr)
    np.testing.assert_allclose(got, want, rtol=1e-9)
