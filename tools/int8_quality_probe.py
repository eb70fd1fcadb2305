"""int8-decode quality + in-process RTF study on trained weights.

Loads the reference-trained symAD checkpoint (tests/golden/
gen_symad_trained.npz, trained by the reference's own trainer) and
transcodes the held-out synthetic test set under three decoder modes:

  f32     — f32 encoder + f32 XLA decoder (quality reference)
  mixed   — f32 encoder + bf16 XLA decoder (production default)
  int8    — f32 encoder + int8-MXU-dot folded residual stacks

All three share identical RVQ indices (encoder stays f32).  Reports per
mode: in-process RTF, and SNR / single-res mel-L1 of its decode vs the f32
decode and vs the original waveform.

Usage: python tools/int8_quality_probe.py [--cpu] [--files N]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def time_fn(f, x0, iters=6):
    @jax.jit
    def loop(x0):
        def body(i, s):
            y = f(x0 + s.astype(x0.dtype))
            return jnp.float32(1e-20) * y.ravel()[0].astype(jnp.float32) \
                + 0.0 * s
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--rtf-secs", type=int, default=10)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from audiodec_tpu.data.wav import read_wav
    from audiodec_tpu.models.autoencoder import (
        GeneratorConfig, decoder_apply, encoder_apply, projector_apply)
    from audiodec_tpu.models.fast import decoder_apply_folded
    from audiodec_tpu.ops.spectral import mel_filterbank, stft_magnitude
    from audiodec_tpu.ops.vq import rvq_forward_index
    from audiodec_tpu.utils.torch_import import import_autoencoder

    data = np.load(os.path.join(REPO, "tests", "golden",
                                "gen_symad_trained.npz"))
    sd = {k[len("sd__"):]: data[k] for k in data.files
          if k.startswith("sd__")}
    cfg = GeneratorConfig()
    params = import_autoencoder(sd, cfg)
    dec_bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params["decoder"])

    interp = jax.default_backend() == "cpu"

    def encode(x):
        h = encoder_apply(params["encoder"], x, cfg)
        z = projector_apply(params["projector"], h, cfg)
        zq, idx = rvq_forward_index(z, params["quantizer"])
        return zq

    modes = {
        "f32": lambda zq: decoder_apply(params["decoder"], zq, cfg),
        "mixed": lambda zq: decoder_apply(
            dec_bf16, zq.astype(jnp.bfloat16), cfg).astype(jnp.float32),
        "int8": lambda zq: decoder_apply_folded(
            params["decoder"], zq, cfg, interpret=interp,
            int8=True),
    }

    # ---- quality over held-out files ----
    mel = jnp.asarray(mel_filterbank(48000, 2048, 80, 0.0, 24000.0))

    def logmel(y):
        m = stft_magnitude(y[:, :, 0], 2048, 300, 2048, eps=1e-12) @ mel
        return jnp.log(jnp.clip(m, 1e-5))

    files = sorted(glob.glob(os.path.join(REPO, "data", "synth_ref", "test",
                                          "*.wav")))[:args.files]
    assert files, "run tools/make_synth_corpus.py --out data/synth_ref first"
    hop = cfg.hop_length
    acc = {m: {"snr_vs_f32": [], "mel_l1_vs_f32": [], "snr_vs_x": []}
           for m in modes}
    enc_j = jax.jit(encode)
    dec_j = {m: jax.jit(f) for m, f in modes.items()}
    for fpath in files:
        wav, sr = read_wav(fpath)
        T = (wav.shape[0] // hop) * hop
        x = jnp.asarray(wav[None, :T, :1])
        zq = enc_j(x)
        ys = {m: np.asarray(dec_j[m](zq)) for m in modes}
        ref = ys["f32"]
        for m in modes:
            e = ys[m] - ref
            acc[m]["snr_vs_f32"].append(
                10 * np.log10((ref ** 2).sum()
                              / max((e ** 2).sum(), 1e-30)))
            ml = float(jnp.mean(jnp.abs(logmel(jnp.asarray(ys[m]))
                                        - logmel(jnp.asarray(ref)))))
            acc[m]["mel_l1_vs_f32"].append(ml)
            ex = ys[m] - np.asarray(x)
            acc[m]["snr_vs_x"].append(
                10 * np.log10((np.asarray(x) ** 2).sum()
                              / max((ex ** 2).sum(), 1e-30)))

    # ---- in-process RTF (full transcode per mode) ----
    B, T = 16, args.rtf_secs * 48000
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (B, T, 1),
                                 jnp.float32)
    for m in modes:
        def transcode(x, m=m):
            zq = encode(x)
            return modes[m](zq)

        dt = time_fn(transcode, x0)
        audio_s = B * T / 48000
        print(json.dumps({
            "mode": m,
            "rtf": round(audio_s / dt, 1),
            "snr_vs_f32_db": round(float(np.mean(acc[m]["snr_vs_f32"])), 2),
            "mel_l1_vs_f32": float(f"{np.mean(acc[m]['mel_l1_vs_f32']):.4g}"),
            "snr_vs_input_db": round(float(np.mean(acc[m]["snr_vs_x"])), 2),
            "files": len(files),
        }), flush=True)


if __name__ == "__main__":
    main()
