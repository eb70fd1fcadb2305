"""Per-stage cost map of the batch transcode path on the real chip.

Times every encoder/decoder sub-stage (input conv, each block's residual
stack, each strided/transposed conv, projector, RVQ) with an on-device
fori_loop carrying a data dependency, so tunnel RTT and dispatch stay out of
the numbers (see bench.py).  This is the ground truth for deciding which
stages deserve fused Pallas kernels.

--fold F probes every stage at the shape it runs at INSIDE the round-4
whole-encoder/decoder batch-fold (batch B*F, chunk length t/F + the halo
at that stage's rate) — the post-fold per-stage accounting VERDICT r4
weak-3 asked for.  --fold 1 (default) is the direct pipeline.

Usage: python tools/stage_probe.py [--dtype float32|bfloat16] [--iters N]
                                   [--fold F]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def time_stage(f, x0, iters: int) -> float:
    """Seconds per call of f, measured as one on-device loop with a data
    dependency between iterations."""

    @jax.jit
    def loop(x0):
        def body(i, s):
            y = f(x0 + s.astype(x0.dtype))
            return jnp.float32(1e-20) * y.ravel()[0].astype(jnp.float32) \
                + 0.0 * s
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(x0))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--secs", type=int, default=10)
    ap.add_argument("--fold", type=int, default=1,
                    help="probe stages at the fold-F chunk shapes "
                         "(models/fast.encoder/decoder_apply_batchfold)")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from audiodec_tpu.models.autoencoder import (
        GeneratorConfig,
        _res_unit_apply,
        generator_init,
        projector_apply,
    )
    from audiodec_tpu.ops.conv import (
        causal_conv1d,
        causal_conv_transpose1d,
    )
    from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup

    cfg = GeneratorConfig()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    if dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            params)

    B = args.batch
    T = args.secs * 48000
    key = jax.random.PRNGKey(0)
    act = cfg.act

    F = max(1, args.fold)
    from audiodec_tpu.parallel.codec import (
        decoder_halo_frames,
        encoder_halo_samples,
    )
    h_enc = encoder_halo_samples(cfg) if F > 1 else 0
    h_dec = decoder_halo_frames(cfg) if F > 1 else 0

    rows = []

    def probe(name, f, shape):
        x0 = 0.3 * jax.random.normal(key, shape, dtype)
        dt = time_stage(f, x0, args.iters)
        rows.append((name, dt * 1e3))
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3)}),
              flush=True)

    # ---- encoder ----
    # folded shapes: batch B*F, chunk = T/F + halo, halo shrinking with
    # the stride pyramid (exactly the shapes inside encoder_apply_batchfold)
    def enc_shape(t_full, h_samples_at_rate, ch):
        if F == 1:
            return (B, t_full, ch)
        return (B * F, t_full // F + h_samples_at_rate, ch)

    enc = params["encoder"]
    probe("enc.conv0 k7 1->32 T=%d" % T,
          lambda x: causal_conv1d(x, enc["conv"]), enc_shape(T, h_enc, 1))

    t = T
    h_rate = h_enc
    in_ch = cfg.encode_channels
    for i, stride in enumerate(cfg.enc_strides):
        bp = enc["blocks"][i]

        def res_stack(x, bp=bp):
            for j, d in enumerate(cfg.res_dilations):
                x = _res_unit_apply(bp["res"][j], x, dilation=d, act=act,
                                    mode="causal")
            return x

        probe(f"enc.b{i}.res3 C={in_ch} T={t}", res_stack,
              enc_shape(t, h_rate, in_ch))
        out_ch = cfg.encode_channels * cfg.enc_ratios[i]
        probe(f"enc.b{i}.strided k={2*stride} s={stride} {in_ch}->{out_ch}",
              lambda x, bp=bp, s=stride: causal_conv1d(x, bp["conv"],
                                                       stride=s),
              enc_shape(t, h_rate, in_ch))
        t //= stride
        h_rate //= stride
        in_ch = out_ch

    # the shipped pipeline unfolds the encoder output BEFORE the projector
    # (encoder_apply_batchfold returns (B, T/hop, C); projector/RVQ run
    # unfolded), so these stages keep their direct shapes in fold mode
    probe("projector 512->64",
          lambda x: projector_apply(params["projector"], x, cfg),
          (B, t, cfg.enc_out_channels))
    probe("rvq.index",
          lambda z: rvq_forward_index(z.astype(jnp.float32),
                                      params["quantizer"])[1].astype(
                                          jnp.float32),
          (B, t, cfg.code_dim))
    z0 = 0.3 * jax.random.normal(key, (B, t, cfg.code_dim), jnp.float32)
    _, idx0 = jax.jit(lambda z: rvq_forward_index(z, params["quantizer"]))(z0)

    def lookup_f(z):
        zq = rvq_lookup(idx0, params["quantizer"])
        return zq + 0.0 * z[0, 0, 0]

    probe("rvq.lookup", lookup_f, (B, t, cfg.code_dim))

    # ---- decoder ----
    dec = params["decoder"]
    def dec_shape(n_full, h_frames_at_rate, ch):
        if F == 1:
            return (B, n_full, ch)
        return (B * F, n_full // F + h_frames_at_rate, ch)

    h_rate_d = h_dec
    probe(f"dec.conv1 k7 64->512 T={t}",
          lambda z: causal_conv1d(z.astype(dtype), dec["conv1"]),
          dec_shape(t, h_rate_d, cfg.code_dim))
    in_ch = cfg.decode_channels * cfg.dec_ratios[0]
    for i, stride in enumerate(cfg.dec_strides):
        bp = dec["blocks"][i]
        if i < len(cfg.dec_ratios) - 1:
            out_ch = cfg.decode_channels * cfg.dec_ratios[i + 1]
        else:
            out_ch = cfg.decode_channels
        probe(f"dec.b{i}.convT k={2*stride} s={stride} {in_ch}->{out_ch}",
              lambda x, bp=bp, s=stride: causal_conv_transpose1d(
                  x, bp["conv"], stride=s),
              dec_shape(t, h_rate_d, in_ch))
        t *= stride
        h_rate_d *= stride

        def res_stack(x, bp=bp):
            for j, d in enumerate(cfg.res_dilations):
                x = _res_unit_apply(bp["res"][j], x, dilation=d, act=act,
                                    mode="causal")
            return x

        probe(f"dec.b{i}.res3 C={out_ch} T={t}", res_stack,
              dec_shape(t, h_rate_d, out_ch))
        in_ch = out_ch

    probe(f"dec.conv2 k7 {in_ch}->1 T={t}",
          lambda x: causal_conv1d(x, dec["conv2"]), dec_shape(t, h_rate_d,
                                                              in_ch))

    total = sum(ms for _, ms in rows)
    print(json.dumps({"dtype": args.dtype, "fold": F,
                      "total_ms": round(total, 1),
                      "audio_s": B * T / 48000,
                      "rtf_if_serial": round(B * T / 48000 / (total / 1e3),
                                             1)}))


if __name__ == "__main__":
    main()
