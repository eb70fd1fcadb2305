"""bf16 fast-mode RTF with the round-4 batch-folded paths.

bench.py reports the recommended mixed mode; this probes the opt-in bf16
fast mode (`codec_test --dtype bfloat16`) with encoder+decoder batch-folds
— the max-throughput configuration.  Same on-device fori_loop methodology
as bench.py, same B=16 x 10 s workload, in-process A/B vs the direct bf16
path.

Usage: python tools/bf16_fold_probe.py
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
    from audiodec_tpu.models.fast import (
        decoder_apply_batchfold,
        encoder_apply_batchfold,
    )
    from audiodec_tpu.ops.vq import rvq_forward_index

    cfg = GeneratorConfig()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)

    SR, B, secs = 48000, 16, 10
    T = secs * SR
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (B, T, 1),
                                 jnp.bfloat16)

    def transcode(x, folded):
        enc = encoder_apply_batchfold if folded else \
            (lambda p, xx, c: encoder_apply(p, xx, c))
        h = enc(bf16["encoder"], x, cfg)
        z = projector_apply(bf16["projector"], h, cfg)
        # VQ distances stay f32 (the bf16 mode contract)
        zq, idx = rvq_forward_index(z.astype(jnp.float32),
                                    params["quantizer"])
        zq = zq.astype(jnp.bfloat16)
        y = (decoder_apply_batchfold(bf16["decoder"], zq, cfg) if folded
             else decoder_apply(bf16["decoder"], zq, cfg))
        return idx, y

    iters = 32

    def loop_for(folded):
        @jax.jit
        def loop(x):
            def body(i, carry):
                idx, y = transcode(carry, folded)
                return y.astype(jnp.bfloat16) + jnp.bfloat16(1e-8) * i
            return jax.lax.fori_loop(0, iters, body, x)
        return loop

    audio_seconds = B * T / SR
    out = {}
    for name, folded in (("bf16_direct", False), ("bf16_folded", True)):
        loop = loop_for(folded)
        y = loop(x0)
        float(jnp.float32(y[0, 0, 0]))
        dt = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            y = loop(x0)
            float(jnp.float32(y[0, 0, 0]))
            dt = min(dt, (time.perf_counter() - t0) / iters)
        out[name] = {"ms_per_iter": round(dt * 1e3, 2),
                     "rtf": round(audio_seconds / dt, 1)}
        print(json.dumps({"path": name, **out[name]}), flush=True)
    print(json.dumps({
        "speedup_folded_vs_direct": round(
            out["bf16_direct"]["ms_per_iter"]
            / out["bf16_folded"]["ms_per_iter"], 2)}), flush=True)


if __name__ == "__main__":
    main()
