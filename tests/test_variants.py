"""Architecture-variant robustness: alternative stride pyramids (the c16
config's (2,4,5,8) hop-320 layout and others) keep the streaming==batch
identity and transcode shape contracts without golden vectors."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    codec_state_init,
    decoder_apply,
    encoder_apply,
    generator_init,
    projector_apply,
)
from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup

VARIANTS = [
    # c16-style: hop 320, 16 codebooks (ref symAD_c16_vctk_48000_hop320)
    GeneratorConfig(encode_channels=2, decode_channels=2, code_dim=8,
                    codebook_num=4, codebook_size=16,
                    enc_strides=(2, 4, 5, 8), dec_strides=(8, 5, 4, 2)),
    # uneven pyramid
    GeneratorConfig(encode_channels=2, decode_channels=2, code_dim=8,
                    codebook_num=2, codebook_size=8,
                    enc_ratios=(2, 4, 8), dec_ratios=(8, 4, 2),
                    enc_strides=(4, 5, 6), dec_strides=(6, 5, 4)),
    # two-stage tiny
    GeneratorConfig(encode_channels=2, decode_channels=2, code_dim=8,
                    codebook_num=2, codebook_size=8,
                    enc_ratios=(2, 4), dec_ratios=(4, 2),
                    enc_strides=(3, 4), dec_strides=(4, 3)),
]


@pytest.mark.parametrize("cfg", VARIANTS, ids=["c16_hop320", "uneven",
                                               "two_stage"])
def test_variant_streaming_equals_batch_and_roundtrip(cfg):
    params = generator_init(jax.random.PRNGKey(0), cfg)
    hop = cfg.hop_length
    n = 5
    x = jnp.asarray(0.3 * np.random.default_rng(0)
                    .standard_normal((1, n * hop, 1)).astype(np.float32))

    # batch path
    h = encoder_apply(params["encoder"], x, cfg)
    z = projector_apply(params["projector"], h, cfg)
    assert z.shape[1] == n  # one frame per hop
    _, idx = rvq_forward_index(z, params["quantizer"])
    zq = rvq_lookup(idx, params["quantizer"])
    y = decoder_apply(params["decoder"], zq, cfg)
    assert y.shape == (1, n * hop, 1)

    # streaming chunked == batch for the encoder; decoder streaming runs
    state = codec_state_init(1, cfg)
    hs = []
    for i in range(n):
        hi, state["encoder"] = encoder_apply(
            params["encoder"], x[:, i * hop:(i + 1) * hop], cfg,
            state=state["encoder"])
        hs.append(np.asarray(hi))
    np.testing.assert_allclose(np.concatenate(hs, axis=1), np.asarray(h),
                               rtol=1e-4, atol=1e-5)

    ys = []
    for i in range(n):
        yi, state["decoder"] = decoder_apply(
            params["decoder"], zq[:, i:i + 1], cfg, state=state["decoder"])
        ys.append(np.asarray(yi))
    y_stream = np.concatenate(ys, axis=1)
    assert y_stream.shape == (1, n * hop, 1)


def test_welford_stats_match_naive():
    """codec_stats' RunningMoments == numpy mean/std over all frames
    (the reference uses sklearn StandardScaler.partial_fit,
    ref codecStatistic.py:92-112)."""
    from audiodec_tpu.bin.codec_stats import RunningMoments

    rng = np.random.default_rng(0)
    chunks = [rng.standard_normal((n, 6)) * (1 + i) + i
              for i, n in enumerate([10, 33, 7, 50])]
    mom = RunningMoments(6)
    for c in chunks:
        mom.update(c)
    mean, scale = mom.finalize()
    allf = np.concatenate(chunks)
    # finalize() casts to float32
    np.testing.assert_allclose(mean, allf.mean(0), rtol=1e-5)
    np.testing.assert_allclose(scale, allf.std(0), rtol=1e-5)


def test_channel_fold_matches_torch_reshape():
    """MIMO channel fold: multi-channel (B, T, C) input folds into the batch
    axis exactly like the reference's channels-first reshape
    (ref AudioDec.py:113-115 `x.reshape(-1, input_channels, length)` and
    HiFiGAN.py:390-392)."""
    import torch

    from audiodec_tpu.models.autoencoder import _channel_fold
    from audiodec_tpu.models.discriminators import _mono_fold

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 40, 4)).astype(np.float32)  # (B, T, C)

    # torch oracle: (B, C, T) -> reshape(-1, ic, T)
    xt = torch.from_numpy(x).transpose(1, 2)  # (B, C, T)
    for ic in (1, 2):
        ref = xt.reshape(-1, ic, xt.shape[-1]).transpose(1, 2).numpy()
        got = np.asarray(_channel_fold(jnp.asarray(x), ic))
        np.testing.assert_array_equal(got, ref)
    ref1 = xt.reshape(-1, 1, xt.shape[-1]).transpose(1, 2).numpy()
    np.testing.assert_array_equal(np.asarray(_mono_fold(jnp.asarray(x))),
                                  ref1)


def test_generator_forward_mimo_fold():
    """Stereo input through a mono codec == the two channels stacked in the
    batch axis (ref AudioDec.py:112-120 forward on folded input)."""
    from audiodec_tpu.models.autoencoder import generator_forward

    cfg = GeneratorConfig(encode_channels=2, decode_channels=2, code_dim=8,
                          codebook_num=2, codebook_size=16)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    hop = cfg.hop_length
    x = 0.2 * np.random.default_rng(1).standard_normal(
        (2, 2 * hop, 2)).astype(np.float32)  # (B=2, T, C=2), model ic=1
    y, zq, z, vqloss, ppl, _ = generator_forward(params, jnp.asarray(x), cfg)
    assert y.shape == (4, 2 * hop, 1)  # folded batch, like the reference
    # equals the explicitly stacked per-channel forward
    xs = np.stack([x[0, :, 0], x[0, :, 1], x[1, :, 0], x[1, :, 1]])[..., None]
    y2, *_ = generator_forward(params, jnp.asarray(xs), cfg)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-6,
                               atol=1e-6)


def test_extract_stats_batched_dp_equivalence(tmp_path):
    """Batched / data-parallel stats extraction == the serial per-window
    loop (Welford merge is exact under any grouping)."""
    from audiodec_tpu.bin.codec_stats import extract_stats
    from audiodec_tpu.data import write_wav, SingleDataset

    cfg = GeneratorConfig(encode_channels=2, decode_channels=2, code_dim=8,
                          codebook_num=2, codebook_size=16)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    hop = cfg.hop_length
    rng = np.random.default_rng(7)
    for i in range(5):
        t = (3 + 2 * i) * hop + (37 * i) % hop  # ragged lengths
        x = (0.3 * rng.standard_normal((t, 1))).clip(-1, 1).astype(np.float32)
        write_wav(str(tmp_path / f"u{i}.wav"), x, 48000)
    ds = SingleDataset(str(tmp_path))

    ref = extract_stats(params, cfg, ds, window_hops=2, batch_size=1)
    b4 = extract_stats(params, cfg, ds, window_hops=2, batch_size=4)
    dp = extract_stats(params, cfg, ds, window_hops=2, batch_size=4, dp=2)
    np.testing.assert_allclose(b4, ref, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(dp, ref, rtol=1e-6, atol=1e-7)


def test_extract_stats_windowed_equals_whole_utterance(tmp_path):
    """Windowed extraction == the reference's whole-utterance forward
    (ref codecStatistic.py:101-113): the receptive-field halo carried by
    _windows means causal context is never reset at window seams, so the
    zq population is the whole-utterance one to f32 rounding."""
    from audiodec_tpu.bin.codec_stats import RunningMoments, extract_stats
    from audiodec_tpu.data import write_wav, SingleDataset
    from audiodec_tpu.models.autoencoder import (
        encoder_apply,
        projector_apply,
    )
    from audiodec_tpu.ops.vq import rvq_forward_index

    cfg = GeneratorConfig(encode_channels=2, decode_channels=2, code_dim=8,
                          codebook_num=2, codebook_size=16)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    hop = cfg.hop_length
    rng = np.random.default_rng(11)
    xs = []
    for i in range(3):
        # multi-window utterances (window_hops=3 below => several seams),
        # ragged tails included
        t = (7 + 3 * i) * hop + (53 * i) % hop
        x = (0.3 * rng.standard_normal((t, 1))).clip(-1, 1).astype(np.float32)
        xs.append(x)
        write_wav(str(tmp_path / f"u{i}.wav"), x, 48000)
    ds = SingleDataset(str(tmp_path))

    # oracle: whole-utterance encode, exactly the reference's population
    mom = RunningMoments(cfg.code_dim)
    for i in range(len(ds)):
        x = ds[i]
        n = len(x) // hop
        h = encoder_apply(params["encoder"], jnp.asarray(x)[None], cfg)
        z = projector_apply(params["projector"], h, cfg)
        zq, _ = rvq_forward_index(z, params["quantizer"])
        mom.update(np.asarray(zq, np.float64)[0, :n])
    mean, scale = mom.finalize()
    whole = np.stack([mean, scale])

    windowed = extract_stats(params, cfg, ds, window_hops=3, batch_size=2)
    np.testing.assert_allclose(windowed, whole, rtol=1e-5, atol=1e-6)
