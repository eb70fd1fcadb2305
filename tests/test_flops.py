"""Analytic FLOP accounting (utils/flops.py) vs XLA's own cost model.

The analytic counts are the MFU denominator bench.py reports; they must
track what the compiler actually schedules.  Tolerance is loose (15%):
XLA trims edge taps of the causal left-pad and counts the RVQ's VPU
distance arithmetic that the analytic model deliberately ignores.
"""

import numpy as np

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    decoder_apply,
    encoder_apply,
    generator_init,
    projector_apply,
)
from audiodec_tpu.ops.vq import rvq_forward_index
from audiodec_tpu.utils import flops as F


def _xla_flops(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, list):  # older jax returns a one-element list
        ca = ca[0]
    return float(ca["flops"])


def test_flop_count_matches_xla_cost_analysis():
    cfg = GeneratorConfig()  # full-size symAD
    params = generator_init(jax.random.PRNGKey(0), cfg)
    T = 6000
    n = T // cfg.hop_length
    x = jnp.zeros((1, T, 1), jnp.float32)

    got = _xla_flops(lambda x: encoder_apply(params["encoder"], x, cfg), x)
    assert abs(got / F.encoder_flops(cfg, T) - 1) < 0.15

    h = encoder_apply(params["encoder"], x, cfg)
    got = _xla_flops(lambda h: projector_apply(params["projector"], h, cfg),
                     h)
    assert abs(got / F.projector_flops(cfg, n) - 1) < 0.15

    z = projector_apply(params["projector"], h, cfg)
    got = _xla_flops(lambda z: rvq_forward_index(z, params["quantizer"]), z)
    assert abs(got / F.rvq_flops(cfg, n) - 1) < 0.15

    zq, _ = rvq_forward_index(z, params["quantizer"])
    got = _xla_flops(lambda q: decoder_apply(params["decoder"], q, cfg), zq)
    assert abs(got / F.decoder_flops(cfg, n) - 1) < 0.15

    # the bench workload total
    total = F.transcode_flops(cfg, T)
    assert total["total"] == (total["encoder"] + total["projector"]
                              + total["rvq"] + total["decoder"])


def test_vocoder_flops_match_xla_cost_analysis():
    from audiodec_tpu.models.vocoder import (
        VocoderConfig,
        vocoder_apply,
        vocoder_init,
    )

    for voc_cfg in (
        # v1-style grouped (MultiGroupConv1d) and v0-style MRF
        VocoderConfig(in_channels=64, channels=128,
                      upsample_scales=(5, 5, 4, 3),
                      upsample_kernel_sizes=(10, 10, 8, 6),
                      resblock_kernel_sizes=(11,),
                      resblock_dilations=((1, 3, 5),), groups=3),
        VocoderConfig(in_channels=64, channels=128,
                      upsample_scales=(5, 5, 4, 3),
                      upsample_kernel_sizes=(10, 10, 8, 6),
                      resblock_kernel_sizes=(3, 7, 11),
                      resblock_dilations=((1, 3, 5),) * 3, groups=1),
    ):
        params = vocoder_init(jax.random.PRNGKey(0), voc_cfg)
        n = 16
        c = jnp.zeros((1, n, voc_cfg.in_channels), jnp.float32)
        got = _xla_flops(lambda c: vocoder_apply(params, c, voc_cfg), c)
        assert abs(got / F.vocoder_flops(voc_cfg, n) - 1) < 0.15
