"""Single-file codec demo (capability twin of ref demoFile.py).

Streams one WAV through the stateful encode -> quantize -> lookup -> decode
path (the same buffered kernels as realtime streaming) and writes the result,
trimmed to the input length (ref demoFile.py:58-61).

Usage:
  python -m audiodec_tpu.bin.demo_file --model vctk_v1 -i in.wav -o out.wav
  python -m audiodec_tpu.bin.demo_file --encoder <ckpt> --decoder <ckpt> ...
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

import jax
import jax.numpy as jnp

from audiodec_tpu.data import read_wav, write_wav
from audiodec_tpu.models.registry import assign_model
from audiodec_tpu.streaming import StreamingCodec
from audiodec_tpu.train.checkpoint import load_only_params
from audiodec_tpu.utils.config import (
    generator_config,
    load_config_near_checkpoint,
)


def build_streaming_codec(encoder_ckpt: str, decoder_ckpt: str):
    from flax import serialization
    from audiodec_tpu.models.autoencoder import generator_init
    from audiodec_tpu.models.vocoder import vocoder_init

    enc_config = load_config_near_checkpoint(encoder_ckpt)
    cfg = generator_config(enc_config)
    template = generator_init(jax.random.PRNGKey(0), cfg)
    params, _ = load_only_params(encoder_ckpt, "gen", template=template)

    voc_cfg = None
    if decoder_ckpt != encoder_ckpt:
        dec_config = load_config_near_checkpoint(decoder_ckpt)
        if dec_config.get("model_type") in ("HiFiGAN", "UnivNet"):
            voc_cfg = generator_config(dec_config)
            voc_t = vocoder_init(jax.random.PRNGKey(0), voc_cfg)
            voc_params, _ = load_only_params(decoder_ckpt, "gen",
                                             template=voc_t)
            params = dict(params, vocoder=voc_params)
    return StreamingCodec(params, cfg, voc_cfg=voc_cfg), enc_config


def main(argv=None):
    from audiodec_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None,
                        help="registry name (e.g. vctk_v1)")
    parser.add_argument("--encoder", default=None)
    parser.add_argument("--decoder", default=None)
    parser.add_argument("-i", "--input", default=None)
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--codes-out", default=None,
                        help="also write the packed RVQ bitstream (.adtc)")
    parser.add_argument("--codes-in", default=None,
                        help="decode a packed RVQ bitstream (.adtc) to wav "
                             "instead of transcoding a wav")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.model:
        sr_expected, enc, dec = assign_model(args.model)
    else:
        assert args.encoder and args.decoder, \
            "need --model or --encoder/--decoder"
        enc, dec, sr_expected = args.encoder, args.decoder, None

    codec, config = build_streaming_codec(enc, dec)
    hop = codec.cfg.hop_length

    if args.codes_in:
        from audiodec_tpu.utils.bitstream import unpack_codes
        with open(args.codes_in, "rb") as f:
            raw, info = unpack_codes(f.read())
        assert info["num_q"] == codec.cfg.codebook_num, \
            f"bitstream has {info['num_q']} codebooks, codec " \
            f"{codec.cfg.codebook_num}"
        assert info["hop"] == hop, \
            f"bitstream hop {info['hop']} != codec hop {hop}"
        sr = info["sample_rate"]
        T = info["n_frames"] * hop
        idx = jnp.asarray(raw + np.arange(raw.shape[-1])
                          * codec.cfg.codebook_size)[None]
        logging.info("Decode %d frames from %s...", info["n_frames"],
                     args.codes_in)
        y = codec.decode(idx)
        write_wav(args.output, np.asarray(y)[0, :T], sr)
        logging.info("Output %s", args.output)
        return

    assert args.input, "need -i/--input (or --codes-in)"
    x, sr = read_wav(args.input)
    if sr_expected is not None:
        assert sr == sr_expected, \
            f"sample rate {sr} != expected {sr_expected} (demoFile.py:54)"

    T = len(x)
    pad = (-T) % hop
    if pad:
        x = np.concatenate([x, np.zeros((pad, x.shape[1]), np.float32)])

    logging.info("Encode/Decode...")
    idx = codec.encode(jnp.asarray(x[None]))
    if args.codes_out:
        from audiodec_tpu.utils.bitstream import pack_codes
        # streaming indices are flattened; remove the per-quantizer offsets
        flat = np.asarray(idx[0])
        size = codec.cfg.codebook_size
        raw = flat - np.arange(flat.shape[-1]) * size
        blob = pack_codes(raw, size, sr, hop)
        with open(args.codes_out, "wb") as f:
            f.write(blob)
        kbps = len(blob) * 8 / (T / sr) / 1000
        logging.info("Wrote %s (%.2f kbps incl. header)", args.codes_out,
                     kbps)
    y = codec.decode(idx)
    y = np.asarray(y)[0, :T]  # trim to input length
    write_wav(args.output, y, sr)
    logging.info("Output %s", args.output)


if __name__ == "__main__":
    main()
