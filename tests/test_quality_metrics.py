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
