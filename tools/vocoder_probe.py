"""On-device throughput of the HiFiGAN vocoder decode path (AD v0/v1/v2).

The paper's recommended configurations decode with the vocoder instead of
the symAD decoder (ref README.md:17-23); this measures its batch RTF on the
real chip, per variant, as ground truth for fast-path work.

Usage: python tools/vocoder_probe.py [--dtype float32|bfloat16] [--iters N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from audiodec_tpu.models.vocoder import (VocoderConfig, vocoder_apply,
                                         vocoder_init)

V1 = VocoderConfig(in_channels=64, channels=512,
                   upsample_scales=(5, 5, 4, 3),
                   upsample_kernel_sizes=(10, 10, 8, 6),
                   resblock_kernel_sizes=(11,),
                   resblock_dilations=((1, 3, 5),), groups=3)
V2 = VocoderConfig(in_channels=64, channels=512,
                   upsample_scales=(5, 5, 4, 3),
                   upsample_kernel_sizes=(10, 10, 8, 6),
                   resblock_kernel_sizes=(3,),
                   resblock_dilations=((1, 3, 5),), groups=3)
V0 = VocoderConfig(in_channels=64, channels=512,
                   upsample_scales=(5, 5, 4, 3),
                   upsample_kernel_sizes=(10, 10, 8, 6),
                   resblock_kernel_sizes=(3, 7, 11),
                   resblock_dilations=((1, 3, 5),) * 3, groups=1)


def bench(name, cfg, B, frames, dtype, iters, stack="xla"):
    params = vocoder_init(jax.random.PRNGKey(0), cfg)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, t)
    p = cast(params)
    if stack == "folded":
        from audiodec_tpu.models.fast import vocoder_apply_folded

        def decode(zq):
            return vocoder_apply_folded(p, zq.astype(dtype), cfg,
                                        interpret=False)
    else:
        def decode(zq):
            return vocoder_apply(p, zq.astype(dtype), cfg)

    @jax.jit
    def loop(z0):
        def body(i, carry):
            y = decode(carry)
            # fold output back to input shape to carry a data dependency
            f = y.shape[1] // z0.shape[1]
            return z0 + 1e-12 * jnp.reshape(
                y[..., 0], (z0.shape[0], z0.shape[1], f)).mean(
                    -1, keepdims=True).astype(z0.dtype)
        return jax.lax.fori_loop(0, iters, body, z0)

    z0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, frames, 64),
                                 jnp.float32)
    y = loop(z0)
    float(y[0, 0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = loop(z0)
        float(y[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    hop = cfg.hop_length
    rtf = B * frames * hop / 48000 / best
    print(f"{name} B={B} {jnp.dtype(dtype).name} {stack}: "
          f"{best*1000:.1f} ms/iter rtf={rtf:.0f}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=1600)  # 10 s @ hop 300
    ap.add_argument("--stack", default="xla", choices=["xla", "folded"])
    ap.add_argument("--only", default=None, choices=["v0", "v1", "v2"])
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    for name, cfg in (("v1", V1), ("v2", V2), ("v0", V0)):
        if args.only and name != args.only:
            continue
        bench(name, cfg, args.batch, args.frames, dt, args.iters,
              stack=args.stack)
