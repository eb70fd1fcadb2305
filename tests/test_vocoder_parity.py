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
}


def load_case(name):
    data = np.load(os.path.join(GOLDEN, f"{name}.npz"))
    sd = {k[len("sd__"):]: data[k] for k in data.files if k.startswith("sd__")}
    cfg = CFGS[name]
    params = import_vocoder(sd, cfg)
    return data, cfg, params


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
