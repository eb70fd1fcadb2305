"""Noncausal-mode generator parity (ref: Encoder/Decoder mode='noncausal',
symmetric padding paths)."""

import os

import numpy as np

import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    generator_forward,
)
from audiodec_tpu.utils.torch_import import import_autoencoder

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

CFG = GeneratorConfig(encode_channels=4, decode_channels=4, code_dim=16,
                      codebook_num=4, codebook_size=32, mode="noncausal")


def test_noncausal_forward_parity():
    data = np.load(os.path.join(GOLDEN, "gen_noncausal.npz"))
    sd = {k[len("sd__"):]: data[k] for k in data.files if k.startswith("sd__")}
    params = import_autoencoder(sd, CFG)
    x = jnp.asarray(data["x"].transpose(0, 2, 1))
    y, zq, z, vqloss, ppl, _ = generator_forward(params, x, CFG, train=False)
    np.testing.assert_allclose(np.asarray(z).transpose(0, 2, 1), data["z"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(zq).transpose(0, 2, 1), data["zq"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), data["y"],
                               rtol=1e-3, atol=1e-4)
