"""Fused fast-path encoder/decoder == reference XLA path (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    decoder_apply,
    encoder_apply,
    generator_init,
)
from audiodec_tpu.archive.fast_experiments import (
    decoder_apply_blocked,
    decoder_apply_fused,
    encoder_apply_blocked,
    encoder_apply_fused,
)

CFG = GeneratorConfig(encode_channels=2, decode_channels=2, code_dim=8,
                      codebook_num=2, codebook_size=16)


def test_fused_encoder_matches():
    params = generator_init(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(0.3 * np.random.default_rng(0)
                    .standard_normal((1, 4 * 300, 1)).astype(np.float32))
    ref = encoder_apply(params["encoder"], x, CFG)
    out = encoder_apply_fused(params["encoder"], x, CFG, tile_t=300,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_blocked_encoder_decoder_match():
    cfg = GeneratorConfig(encode_channels=32, decode_channels=32,
                          code_dim=64, codebook_num=2, codebook_size=16)
    params = generator_init(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(0.3 * np.random.default_rng(2)
                    .standard_normal((1, 2 * 300, 1)).astype(np.float32))
    ref_h = encoder_apply(params["encoder"], x, cfg)
    out_h = encoder_apply_blocked(params["encoder"], x, cfg)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h),
                               rtol=1e-4, atol=1e-4)
    z = jnp.asarray(0.3 * np.random.default_rng(3)
                    .standard_normal((1, 2, cfg.code_dim)).astype(np.float32))
    ref_y = decoder_apply(params["decoder"], z, cfg)
    out_y = decoder_apply_blocked(params["decoder"], z, cfg)
    np.testing.assert_allclose(np.asarray(out_y), np.asarray(ref_y),
                               rtol=1e-4, atol=1e-4)


def test_decode_batchfold_matches_direct():
    """decode_batchfold == direct rvq_lookup+decoder_apply to f32 rounding
    on every fold (interior chunks see real halo context; the head is
    patched with a direct decode), including a non-divisible frame count
    (tail padding) and the auto fold chooser."""
    from audiodec_tpu.models.fast import batchfold_auto, decode_batchfold
    from audiodec_tpu.ops.vq import rvq_lookup

    cfg = GeneratorConfig(encode_channels=4, decode_channels=4,
                          code_dim=8, codebook_num=2, codebook_size=16)
    params = generator_init(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    for n in (64, 61):  # divisible and padded tails
        idx = jnp.asarray(
            rng.integers(0, 16, size=(2, n, 2)).astype(np.int32))
        zq = rvq_lookup(idx, params["quantizer"])
        y_ref = decoder_apply(params["decoder"], zq, cfg)
        for fold in (2, 4):
            y = decode_batchfold(params["decoder"], params["quantizer"],
                                 idx, cfg, dec_dtype=jnp.float32, fold=fold)
            assert y.shape == y_ref.shape
            np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"n={n} fold={fold}")
    # fold=1 falls back to the direct path exactly
    y1 = decode_batchfold(params["decoder"], params["quantizer"], idx, cfg,
                          dec_dtype=jnp.float32, fold=1)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y_ref))
    # auto chooser: production length -> 8, short -> scales down to 1
    assert batchfold_auto(1600) == 8
    assert batchfold_auto(800) == 4
    assert batchfold_auto(300) == 1
    assert batchfold_auto(150) == 1


def test_encoder_batchfold_matches_direct():
    """encoder_apply_batchfold == direct encoder_apply to f32 rounding on
    every fold (inputs are hop multiples by CLI construction; the
    non-fold-divisible length exercises the tail padding).  The encoder
    is purely causal, so chunk 0's zero halo IS batch semantics —
    indices computed downstream must match exactly on CPU (true-f32
    convs)."""
    from audiodec_tpu.models.autoencoder import projector_apply
    from audiodec_tpu.models.fast import encoder_apply_batchfold
    from audiodec_tpu.ops.vq import rvq_forward_index

    cfg = GeneratorConfig(encode_channels=4, decode_channels=4,
                          code_dim=8, codebook_num=2, codebook_size=16)
    params = generator_init(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(7)
    hop = cfg.hop_length
    for n_hops in (24, 21):  # divisible by 4 / needs tail padding
        x = jnp.asarray(0.3 * rng.standard_normal(
            (2, n_hops * hop, 1)).astype(np.float32))
        h_ref = encoder_apply(params["encoder"], x, cfg)
        z_ref = projector_apply(params["projector"], h_ref, cfg)
        _, idx_ref = rvq_forward_index(z_ref, params["quantizer"])
        for fold in (2, 4):
            h_f = encoder_apply_batchfold(params["encoder"], x, cfg,
                                          fold=fold)
            assert h_f.shape == h_ref.shape
            np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ref),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"n_hops={n_hops} f={fold}")
            z_f = projector_apply(params["projector"], h_f, cfg)
            _, idx_f = rvq_forward_index(z_f, params["quantizer"])
            np.testing.assert_array_equal(np.asarray(idx_f),
                                          np.asarray(idx_ref))
    # fold=1 falls back to the direct path exactly
    h1 = encoder_apply_batchfold(params["encoder"], x, cfg, fold=1)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h_ref))


def test_vocoder_batchfold_matches_direct():
    """vocoder_apply_batchfold == direct vocoder_apply to f32 rounding
    (the AD v1/v2 receiver analogue of the decoder fold; head patched for
    the causal transposed-conv ReplicationPad)."""
    from audiodec_tpu.models.fast import vocoder_apply_batchfold
    from audiodec_tpu.models.vocoder import (
        VocoderConfig,
        vocoder_apply,
        vocoder_init,
    )

    voc_cfg = VocoderConfig(in_channels=8, channels=16,
                            upsample_scales=(5, 5, 4, 3),
                            upsample_kernel_sizes=(10, 10, 8, 6),
                            resblock_kernel_sizes=(3,),
                            resblock_dilations=((1, 3),),
                            groups=1, stats=False)
    voc = vocoder_init(jax.random.PRNGKey(9), voc_cfg)
    rng = np.random.default_rng(9)
    for n in (64, 61):
        zq = jnp.asarray(0.3 * rng.standard_normal(
            (2, n, 8)).astype(np.float32))
        y_ref = vocoder_apply(voc, zq, voc_cfg)
        for fold in (2, 4):
            y = vocoder_apply_batchfold(voc, zq, voc_cfg, fold=fold)
            assert y.shape == y_ref.shape
            np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"n={n} fold={fold}")


def test_blocked_path_bit_exact_vs_reference_golden():
    """Blocked encoder still produces bit-exact RVQ indices vs the reference
    torch implementation (golden symAD vectors)."""
    import os
    from audiodec_tpu.models.autoencoder import projector_apply
    from audiodec_tpu.ops.vq import rvq_forward_index
    from audiodec_tpu.utils.torch_import import import_autoencoder

    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "gen_symad.npz")
    data = np.load(golden)
    sd = {k[len("sd__"):]: data[k] for k in data.files
          if k.startswith("sd__")}
    cfg = GeneratorConfig()
    params = import_autoencoder(sd, cfg)
    x = jnp.asarray(data["x"].transpose(0, 2, 1))
    h = encoder_apply_blocked(params["encoder"], x, cfg)
    z = projector_apply(params["projector"], h, cfg)
    _, idx = rvq_forward_index(z, params["quantizer"], flatten=True)
    np.testing.assert_array_equal(np.asarray(idx[0]).T, data["idx_stream"])


def test_fused_decoder_matches():
    params = generator_init(jax.random.PRNGKey(1), CFG)
    z = jnp.asarray(0.3 * np.random.default_rng(1)
                    .standard_normal((1, 4, CFG.code_dim)).astype(np.float32))
    ref = decoder_apply(params["decoder"], z, CFG)
    out = decoder_apply_fused(params["decoder"], z, CFG, tile_t=512,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_mixed_dtype_transcode_indices_match_f32():
    """--dtype mixed (f32 encoder+RVQ, bf16 decoder) produces EXACTLY the
    indices of the full-f32 path — the decoder cannot influence them — and a
    decoded waveform within bf16 tolerance of the f32 decode."""
    from audiodec_tpu.bin.codec_test import BatchTranscoder

    params = generator_init(jax.random.PRNGKey(4), CFG)
    x = (0.3 * np.random.default_rng(4)
         .standard_normal((2, 4 * 300, 1))).astype(np.float32)

    full = BatchTranscoder(params, CFG, stack="xla")
    mixed = BatchTranscoder(params, CFG, stack="xla",
                            dec_dtype=jnp.bfloat16)
    idx_f, y_f = full(x)
    idx_m, y_m = mixed(x)
    np.testing.assert_array_equal(np.asarray(idx_m), np.asarray(idx_f))
    assert y_m.dtype == jnp.float32  # output is cast back for wav writes
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_f),
                               rtol=0.05, atol=0.05)


def test_exact_precision_transcode_indices_match_f32():
    """--precision exact ('high'-precision encoder + two-pass RVQ argmin,
    fast decoder; the CLI's round-3 configuration, 0/1280 hardware flips
    at 1.87x default cost per tools/flip_probe.py) produces exactly the
    default-path indices on CPU, where every precision is already true
    f32 — pinning that the mode changes nothing except hardware
    numerics.  Both encoder scopes are exercised."""
    from audiodec_tpu.bin.codec_test import BatchTranscoder

    params = generator_init(jax.random.PRNGKey(5), CFG)
    x = (0.3 * np.random.default_rng(5)
         .standard_normal((2, 4 * 300, 1))).astype(np.float32)

    full = BatchTranscoder(params, CFG, stack="xla")
    idx_f, y_f = full(x)
    for prec in ("high", "highest"):
        exact = BatchTranscoder(params, CFG, stack="xla",
                                dec_dtype=jnp.bfloat16, exact_k=16,
                                enc_precision=prec)
        idx_e, y_e = exact(x)
        np.testing.assert_array_equal(np.asarray(idx_e), np.asarray(idx_f))
        np.testing.assert_allclose(np.asarray(y_e), np.asarray(y_f),
                                   rtol=0.05, atol=0.05)


def test_partial_folds_match_direct():
    """Round-5 partial folds (encoder unfold_after / decoder fold_from) ==
    direct applies, bit-exact on CPU at EVERY split point including the
    'auto' policy (C>=128 boundary).  The shipped defaults are 'auto'."""
    import numpy as np
    from audiodec_tpu.models.autoencoder import (
        GeneratorConfig, decoder_apply, encoder_apply, generator_init)
    from audiodec_tpu.models.fast import (
        decoder_apply_batchfold, decoder_fold_from_auto,
        encoder_apply_batchfold, encoder_unfold_auto)

    cfg = GeneratorConfig()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    assert encoder_unfold_auto(cfg) == 2   # C=128 from block 2
    assert decoder_fold_from_auto(cfg) == 2  # C=64 from block 2

    x = jnp.asarray(0.3 * np.random.default_rng(0)
                    .standard_normal((2, 24000, 1)).astype(np.float32))
    h_ref = encoder_apply(params["encoder"], x, cfg)
    for u in (0, 1, "auto", 3, None):
        h = encoder_apply_batchfold(params["encoder"], x, cfg, fold=4,
                                    unfold_after=u)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                                   rtol=1e-5, atol=1e-6)

    n = 24000 // cfg.hop_length
    zq = jnp.asarray(0.5 * np.random.default_rng(1)
                     .standard_normal((2, n, cfg.code_dim))
                     .astype(np.float32))
    y_ref = decoder_apply(params["decoder"], zq, cfg)
    for ff in (0, 1, "auto", 3, None):
        y = decoder_apply_batchfold(params["decoder"], zq, cfg, fold=4,
                                    fold_from=ff)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)


def test_vocoder_partial_fold_matches_direct():
    """vocoder_apply_batchfold fold_from (round-5 late fold) == direct
    vocoder_apply, bit-exact on CPU at every split point incl. 'auto'
    (1.39x over the whole fold on hardware, BENCHMARKS round 5)."""
    import numpy as np
    from audiodec_tpu.models.vocoder import (
        VocoderConfig, vocoder_apply, vocoder_init)
    from audiodec_tpu.models.fast import (
        vocoder_apply_batchfold, vocoder_fold_from_auto)

    cfg = VocoderConfig(in_channels=64, channels=512,
                        upsample_scales=(5, 5, 4, 3),
                        upsample_kernel_sizes=(10, 10, 8, 6),
                        resblock_kernel_sizes=(11,),
                        resblock_dilations=((1, 3, 5),), groups=3,
                        stats=True)
    p = vocoder_init(jax.random.PRNGKey(0), cfg)
    assert vocoder_fold_from_auto(cfg) == 2  # stage channels 256,128,64,32
    zq = jnp.asarray(0.5 * np.random.default_rng(1)
                     .standard_normal((2, 96, 64)).astype(np.float32))
    y_ref = vocoder_apply(p, zq, cfg)
    for ff in (0, 1, "auto", 3, None):
        y = vocoder_apply_batchfold(p, zq, cfg, fold=4, fold_from=ff)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)
