"""Sharded chunk-halo codec == single-device batch codec, bit-exactly
(SURVEY.md §4 test strategy (d), BASELINE.json multi-host configs).

Runs on the 8-virtual-device CPU mesh from conftest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    decoder_apply,
    generator_init,
)
from audiodec_tpu.models.vocoder import VocoderConfig, vocoder_init, \
    vocoder_apply
from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup
from audiodec_tpu.models.autoencoder import encoder_apply, projector_apply
from audiodec_tpu.parallel import (
    decoder_halo_frames,
    encoder_halo_samples,
    make_mesh,
    make_sharded_codec,
)

CFG = GeneratorConfig(encode_channels=4, decode_channels=4, code_dim=16,
                      codebook_num=2, codebook_size=32)


@pytest.fixture(scope="module")
def setup():
    params = generator_init(jax.random.PRNGKey(0), CFG)
    hop = CFG.hop_length
    # 4-way seq sharding; each shard needs >= halo... any multiple of
    # seq*hop works; keep small for CPU test speed
    T = 4 * 20 * hop
    x = jnp.asarray(0.3 * np.random.default_rng(0)
                    .standard_normal((2, T, 1)).astype(np.float32))
    return params, x


def reference_encode(params, x):
    h = encoder_apply(params["encoder"], x, CFG)
    z = projector_apply(params["projector"], h, CFG)
    _, idx = rvq_forward_index(z, params["quantizer"])
    return idx


def test_halo_sizes():
    full = GeneratorConfig()
    assert encoder_halo_samples(full) % full.hop_length == 0
    assert encoder_halo_samples(full) >= full.receptive_field - 1
    assert decoder_halo_frames(full) > 0


@pytest.mark.parametrize("seq", [2, 4])
def test_sharded_encode_decode_bit_exact(setup, seq):
    params, x = setup
    mesh = make_mesh(data=2, seq=seq)
    encode, decode = make_sharded_codec(mesh, params, CFG)

    idx_ref = reference_encode(params, x)
    zq_ref = rvq_lookup(idx_ref, params["quantizer"])
    y_ref = decoder_apply(params["decoder"], zq_ref, CFG)

    idx = encode(x)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))

    y = decode(idx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5,
                               atol=1e-6)


def test_sharded_vocoder_decode(setup):
    params, x = setup
    voc_cfg = VocoderConfig(in_channels=CFG.code_dim, channels=16,
                            upsample_scales=(5, 5, 4, 3),
                            upsample_kernel_sizes=(10, 10, 8, 6),
                            resblock_kernel_sizes=(3,),
                            resblock_dilations=((1, 3),), groups=2)
    voc = vocoder_init(jax.random.PRNGKey(7), voc_cfg)
    mesh = make_mesh(data=2, seq=4)
    encode, decode = make_sharded_codec(mesh, params, CFG,
                                        vocoder=(voc, voc_cfg))
    idx = encode(x)
    zq = rvq_lookup(idx, params["quantizer"])
    y_ref = vocoder_apply(voc, zq, voc_cfg)
    y = decode(idx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("fold", [2, 4])
def test_sharded_codec_with_batchfold(setup, fold):
    """The round-4 batch-fold composes with the chunk-halo sharded codec
    (make_sharded_codec encode_fold/decode_fold): the fold is a
    shard-local reshape applied INSIDE each shard's halo'd chunk.  The
    encoder fold is semantically exact for the purely-causal encoder, so
    indices stay bit-identical to the unsharded DIRECT encoder; the
    decoder fold (with its direct head patch) matches the unsharded
    direct decode to f32 rounding."""
    params, x = setup
    mesh = make_mesh(data=2, seq=2)
    encode, decode = make_sharded_codec(mesh, params, CFG,
                                        encode_fold=fold, decode_fold=fold)

    idx_ref = reference_encode(params, x)
    idx = encode(x)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))

    zq = rvq_lookup(idx_ref, params["quantizer"])
    y_ref = decoder_apply(params["decoder"], zq, CFG)
    y = decode(idx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_vocoder_decode_batchfold(setup):
    """Vocoder-receiver variant of the shard-local batch-fold."""
    params, x = setup
    voc_cfg = VocoderConfig(in_channels=CFG.code_dim, channels=16,
                            upsample_scales=(5, 5, 4, 3),
                            upsample_kernel_sizes=(10, 10, 8, 6),
                            resblock_kernel_sizes=(3,),
                            resblock_dilations=((1, 3),), groups=2)
    voc = vocoder_init(jax.random.PRNGKey(7), voc_cfg)
    mesh = make_mesh(data=2, seq=2)
    encode, decode = make_sharded_codec(mesh, params, CFG,
                                        vocoder=(voc, voc_cfg),
                                        decode_fold=2)
    idx = encode(x)
    zq = rvq_lookup(idx, params["quantizer"])
    y_ref = vocoder_apply(voc, zq, voc_cfg)
    y = decode(idx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("tp", [2, 4])
def test_tensor_parallel_codec(setup, tp):
    """Channel-sharded (Megatron column/row) codec == single-device batch
    codec: indices bit-exact (channel splits never touch a conv's time
    reduction on the encode path), waveform to f32 rounding (row-parallel
    1x1 psums reassociate)."""
    from audiodec_tpu.parallel import (
        generator_tp_specs,
        make_tp_codec,
        make_tp_mesh,
    )
    from jax.sharding import PartitionSpec as P

    params, x = setup
    mesh = make_tp_mesh(data=2, model=tp)  # batch in the fixture is 2

    # the plan actually shards: every res-unit w in this config divides tp=4
    specs = generator_tp_specs(params, CFG, tp)
    unit0 = specs["encoder"]["blocks"][0]["res"][0]
    assert unit0["conv1"]["w"] == P(None, None, "model")
    assert unit0["conv2"]["w"] == P(None, "model", None)

    encode, decode = make_tp_codec(mesh, params, CFG)
    idx_ref = reference_encode(params, x)
    zq_ref = rvq_lookup(idx_ref, params["quantizer"])
    y_ref = decoder_apply(params["decoder"], zq_ref, CFG)

    idx = encode(x)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    y = decode(idx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5,
                               atol=1e-6)


def test_sharded_codec_dtype_modes(setup):
    """Sharded codec honors dtype/dec_dtype: mixed mode (f32 encoder, bf16
    decoder) yields indices bit-equal to the f32 sharded path (and to the
    single-device reference), with the waveform within bf16 tolerance."""
    import jax.numpy as jnp

    params, x = setup
    mesh = make_mesh(data=2, seq=2)
    enc_f32, dec_f32 = make_sharded_codec(mesh, params, CFG)
    enc_mix, dec_mix = make_sharded_codec(mesh, params, CFG,
                                          dec_dtype=jnp.bfloat16)

    idx_f32 = enc_f32(x)
    idx_mix = enc_mix(x)
    np.testing.assert_array_equal(np.asarray(idx_mix), np.asarray(idx_f32))
    np.testing.assert_array_equal(np.asarray(idx_mix),
                                  np.asarray(reference_encode(params, x)))

    y_f32 = np.asarray(dec_f32(idx_f32))
    y_mix = np.asarray(dec_mix(idx_mix))
    assert y_mix.dtype == np.float32
    np.testing.assert_allclose(y_mix, y_f32, rtol=0.05, atol=0.05)
