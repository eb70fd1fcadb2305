"""The SHIPPING full-size symAD config through the sharded paths.

tests/test_parallel.py proves the halo/TP math on small models; this module
executes the canonical symAD_vctk_48000_hop300 architecture (encode
channels 32, code_dim 64, 8x1024 codebooks — ref
config/autoencoder/symAD_vctk_48000_hop300.yaml:28-44) and the full-size
AD-v1 vocoder (channels 512, ref
config/vocoder/AudioDec_v1_symAD_vctk_48000_hop300_clean.yaml:28-45)
through make_sharded_codec (data x seq chunk-halo) and make_tp_codec
(channel parallel) on the 8-virtual-device CPU mesh, asserting the sharded
graphs compile, execute, and reproduce the unsharded indices bit-exactly.

Slow (~minutes on CPU): the point is that the production-size sharded
graphs actually run somewhere, not just at toy widths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    decoder_apply,
    encoder_apply,
    generator_init,
    projector_apply,
)
from audiodec_tpu.models.vocoder import (
    VocoderConfig,
    vocoder_apply,
    vocoder_init,
)
from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup
from audiodec_tpu.parallel import (
    encoder_halo_samples,
    make_mesh,
    make_sharded_codec,
)

FULL = GeneratorConfig()  # canonical symAD full size
VOC_V1 = VocoderConfig(in_channels=64, channels=512,
                       upsample_scales=(5, 5, 4, 3),
                       upsample_kernel_sizes=(10, 10, 8, 6),
                       resblock_kernel_sizes=(11,),
                       resblock_dilations=((1, 3, 5),),
                       groups=3, stats=False)


@pytest.fixture(scope="module")
def setup():
    params = generator_init(jax.random.PRNGKey(0), FULL)
    hop = FULL.hop_length
    seq = 4
    # per-shard chunk must cover the full 7209-sample receptive field
    halo = encoder_halo_samples(FULL)
    chunk = ((halo // hop) + 4) * hop
    T = seq * chunk
    assert chunk >= halo
    x = jnp.asarray(0.3 * np.random.default_rng(1)
                    .standard_normal((2, T, 1)).astype(np.float32))
    return params, x


def _unsharded_idx(params, x):
    h = encoder_apply(params["encoder"], x, FULL)
    z = projector_apply(params["projector"], h, FULL)
    _, idx = rvq_forward_index(z, params["quantizer"])
    return idx


def test_fullsize_sharded_codec_bit_exact(setup):
    params, x = setup
    mesh = make_mesh(data=2, seq=4)
    encode, decode = make_sharded_codec(mesh, params, FULL)

    idx_ref = _unsharded_idx(params, x)
    idx = encode(x)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))

    zq_ref = rvq_lookup(idx_ref, params["quantizer"])
    y_ref = decoder_apply(params["decoder"], zq_ref, FULL)
    y = decode(idx)
    # with the shard-0 ReplicationPad head patch the sharded decode is
    # exact to f32 rounding (measured 1.2e-10 on this config)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-7)


def test_fullsize_sharded_vocoder_decode(setup):
    params, x = setup
    voc = vocoder_init(jax.random.PRNGKey(3), VOC_V1)
    mesh = make_mesh(data=2, seq=4)
    encode, decode = make_sharded_codec(mesh, params, FULL,
                                        vocoder=(voc, VOC_V1))
    idx = encode(x)
    zq = rvq_lookup(idx, params["quantizer"])
    y_ref = vocoder_apply(voc, zq, VOC_V1)
    y = decode(idx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_fullsize_tensor_parallel_codec(setup):
    from jax.sharding import PartitionSpec as P

    from audiodec_tpu.parallel import (
        generator_tp_specs,
        make_tp_codec,
        make_tp_mesh,
    )

    params, x = setup
    mesh = make_tp_mesh(data=2, model=4)
    specs = generator_tp_specs(params, FULL, 4)
    # the full-size plan must actually shard the residual stacks
    unit0 = specs["encoder"]["blocks"][0]["res"][0]
    assert unit0["conv1"]["w"] == P(None, None, "model")
    assert unit0["conv2"]["w"] == P(None, "model", None)

    encode, decode = make_tp_codec(mesh, params, FULL)
    idx_ref = _unsharded_idx(params, x)
    idx = encode(x)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))

    zq_ref = rvq_lookup(idx_ref, params["quantizer"])
    y_ref = decoder_apply(params["decoder"], zq_ref, FULL)
    y = decode(idx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
