"""Causal HiFiGAN vocoder parity vs golden vectors from the reference
(ref: models/vocoder/HiFiGAN.py; AD v0 MRF and v1/v2 grouped variants)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from audiodec_tpu.models.vocoder import (
    VocoderConfig,
    vocoder_apply,
    vocoder_state_init,
)
from audiodec_tpu.utils.torch_import import import_vocoder

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

CFGS = {
    "voc_mrf": VocoderConfig(
        in_channels=16, channels=32, upsample_scales=(5, 5, 4, 3),
        upsample_kernel_sizes=(10, 10, 8, 6)),
    "voc_group": VocoderConfig(
        in_channels=16, channels=32, upsample_scales=(5, 5, 4, 3),
        upsample_kernel_sizes=(10, 10, 8, 6), resblock_kernel_sizes=(11,),
        resblock_dilations=((1, 3, 5),), groups=3, stats=True),
    # TRAINED weights: v1-style vocoder (channels 128) trained for 250
    # adversarial steps by the reference's own trainer against the frozen
    # 3000-step analyzer (tools/ref_train.py + dump_trained_voc_golden.py);
    # weight-norm g/v and stats buffers are genuinely trained, and the
    # input zq comes from the trained analyzer on held-out audio.
    "voc_v1_small_trained": VocoderConfig(
        in_channels=64, channels=128, upsample_scales=(5, 5, 4, 3),
        upsample_kernel_sizes=(10, 10, 8, 6), resblock_kernel_sizes=(11,),
        resblock_dilations=((1, 3, 5),), groups=3, stats=True),
}


def load_case(name):
    data = np.load(os.path.join(GOLDEN, f"{name}.npz"))
    sd = {k[len("sd__"):]: data[k] for k in data.files if k.startswith("sd__")}
    cfg = CFGS[name]
    params = import_vocoder(sd, cfg)
    return data, cfg, params


def test_trained_vocoder_parity():
    """AD v1 pipeline on TRAINED weights: batch forward, whole-signal
    streaming, hop-by-hop; plus decode SNR vs the torch decode (the
    trained-weight-norm folding contract, ref HiFiGAN.py:193-203)."""
    data, cfg, params = load_case("voc_v1_small_trained")
    assert int(data["trained_steps"]) >= 250
    zq = jnp.asarray(data["zq"].transpose(0, 2, 1))

    y = vocoder_apply(params, zq, cfg)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), data["y"],
                               rtol=1e-3, atol=1e-5)

    st = vocoder_state_init(1, cfg, jnp.float32)
    ys, _ = vocoder_apply(params, zq, cfg, state=st)
    ref = data["y_stream"].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ys), ref, rtol=1e-3, atol=1e-5)
    err = np.asarray(ys) - ref
    snr = 10 * np.log10((ref ** 2).sum() / max((err ** 2).sum(), 1e-30))
    assert snr > 50.0, f"SNR vs torch decode too low: {snr:.1f} dB"

    st = vocoder_state_init(1, cfg, jnp.float32)
    outs = []
    for i in range(int(data["n_hops"])):
        yh, st = vocoder_apply(params, zq[:, i:i + 1], cfg, state=st)
        outs.append(np.asarray(yh))
    np.testing.assert_allclose(
        np.concatenate(outs, axis=1).transpose(0, 2, 1), data["y_hops"],
        rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("name", ["voc_mrf", "voc_group"])
def test_vocoder_forward_parity(name):
    data, cfg, params = load_case(name)
    assert cfg.grouped == (name == "voc_group")
    c = jnp.asarray(data["c"].transpose(0, 2, 1))
    y = vocoder_apply(params, c, cfg)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), data["y"],
                               rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("name", ["voc_mrf", "voc_group"])
def test_vocoder_streaming_parity(name):
    data, cfg, params = load_case(name)
    c = jnp.asarray(data["c"].transpose(0, 2, 1))
    state = vocoder_state_init(1, cfg)
    y, _ = vocoder_apply(params, c, cfg, state=state)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1),
                               data["y_stream"], rtol=1e-3, atol=1e-5)


def test_vocoder_hop_by_hop():
    data, cfg, params = load_case("voc_group")
    c = data["c"].transpose(0, 2, 1)
    state = vocoder_state_init(1, cfg)
    outs = []
    for i in range(c.shape[1]):
        y, state = vocoder_apply(params, jnp.asarray(c[:, i:i + 1]), cfg,
                                 state=state)
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(y.transpose(0, 2, 1), data["y_hops"],
                               rtol=1e-3, atol=1e-5)
