"""Mixed-precision transcode probe: f32 encoder+RVQ / bf16 decoder.

In-process A/B of the three dtype modes of codec_test (folded stacks,
B=16 x 10 s @ 48 kHz), so ratios are comparable despite session drift:
  float32  — parity mode (indices = f32 numeric class)
  mixed    — f32 encoder+projector+RVQ, bf16 decoder: SAME indices as
             float32 mode by construction, faster decode
  bfloat16 — fast mode (bf16 everywhere except VQ distances)

Usage: python tools/mixed_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from audiodec_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp


def time_fn(f, x0, iters=8):
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
    from audiodec_tpu.models.autoencoder import (
        GeneratorConfig,
        generator_init,
        projector_apply,
    )
    from audiodec_tpu.models.fast import (
        decoder_apply_folded,
        encoder_apply_folded,
    )
    from audiodec_tpu.ops.vq import rvq_forward_index

    cfg = GeneratorConfig()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    SR, B, secs = 48000, 16, 10
    T = secs * SR
    audio_s = B * T / SR

    def cast(tree, dt):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, tree)

    for name, enc_dt, dec_dt in (("float32", jnp.float32, jnp.float32),
                                 ("mixed", jnp.float32, jnp.bfloat16),
                                 ("bfloat16", jnp.bfloat16, jnp.bfloat16)):
        pe = cast({"encoder": params["encoder"],
                   "projector": params["projector"]}, enc_dt)
        pd = cast(params["decoder"], dec_dt)
        x0 = (0.3 * jax.random.normal(jax.random.PRNGKey(0), (B, T, 1),
                                      jnp.float32)).astype(enc_dt)

        def transcode(x, pe=pe, pd=pd, enc_dt=enc_dt, dec_dt=dec_dt):
            h = encoder_apply_folded(pe["encoder"], x.astype(enc_dt), cfg)
            z = projector_apply(pe["projector"], h, cfg)
            zq, idx = rvq_forward_index(z.astype(jnp.float32),
                                        params["quantizer"])
            y = decoder_apply_folded(pd, zq.astype(dec_dt), cfg)
            return y

        dt = time_fn(transcode, x0)
        print(json.dumps({"mode": name, "ms_per_iter": round(dt * 1e3, 2),
                          "rtf": round(audio_s / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
