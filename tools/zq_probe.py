"""A/B probe: batch transcode RTF with vs without the redundant rvq_lookup.

The reference's batch transcode (ref: codecTest.py:78-95) passes zq straight
from quantizer.forward into the decoder; it never re-embeds indices.  Our
bench historically did idx -> rvq_lookup -> zq, which adds a (B,T,Q) gather
pass.  This probe times both variants on the real chip with the on-device
fori_loop methodology (see bench.py for why).

Usage: python tools/zq_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def main():
    from audiodec_tpu.models.autoencoder import (
        GeneratorConfig,
        decoder_apply,
        encoder_apply,
        generator_init,
        projector_apply,
    )
    from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup

    cfg = GeneratorConfig()
    params = generator_init(jax.random.PRNGKey(0), cfg)

    SR = 48000
    B, secs = 16, 10
    T = secs * SR
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (B, T, 1),
                                 jnp.float32)

    def transcode_lookup(params, x):
        h = encoder_apply(params["encoder"], x, cfg)
        z = projector_apply(params["projector"], h, cfg)
        _, idx = rvq_forward_index(z, params["quantizer"])
        zq = rvq_lookup(idx, params["quantizer"])
        return decoder_apply(params["decoder"], zq, cfg)

    def transcode_zq(params, x):
        h = encoder_apply(params["encoder"], x, cfg)
        z = projector_apply(params["projector"], h, cfg)
        zq, idx = rvq_forward_index(z, params["quantizer"])
        return decoder_apply(params["decoder"], zq, cfg)

    iters = 8

    def make_loop(fn):
        @jax.jit
        def loop(params, x):
            def body(i, carry):
                y = fn(params, carry)
                return y + 1e-12 * i
            return jax.lax.fori_loop(0, iters, body, x)
        return loop

    def sync(y):
        return float(y[0, 0, 0])

    audio_seconds = B * T / SR
    out = {}
    for name, fn in [("lookup", transcode_lookup), ("zq", transcode_zq)]:
        loop = make_loop(fn)
        sync(loop(params, x0))  # warmup/compile
        t0 = time.perf_counter()
        sync(loop(params, x0))
        dt = (time.perf_counter() - t0) / iters
        out[name] = {"ms_per_iter": round(dt * 1e3, 2),
                     "rtf": round(audio_seconds / dt, 1)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
