"""Headline benchmark: batch encode+decode real-time factor on one chip.

Workload (BASELINE.json north star): full symAD_vctk_48000_hop300
architecture, batch transcode (encode -> RVQ indices -> decode) of 48 kHz
audio.  Prints ONE JSON line:
  {"metric": "encode_decode_rtf", "value": N, "unit": "x_realtime",
   "vs_baseline": N}
vs_baseline is measured RTF / 1000 (the north-star target "RTF > 1000x on a
single chip"; the reference itself publishes no throughput numbers —
BASELINE.md).
"""

import json
import time

import numpy as np

import jax
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

    cfg = GeneratorConfig()  # symAD_vctk_48000_hop300
    params = generator_init(jax.random.PRNGKey(0), cfg)

    SR = 48000
    B, secs = 16, 10
    T = secs * SR  # divisible by hop 300
    x = jnp.asarray(0.3 * np.random.default_rng(0)
                    .standard_normal((B, T, 1)).astype(np.float32))

    @jax.jit
    def transcode(params, x):
        h = encoder_apply(params["encoder"], x, cfg)
        z = projector_apply(params["projector"], h, cfg)
        _, idx = rvq_forward_index(z, params["quantizer"])
        zq = rvq_lookup(idx, params["quantizer"])
        y = decoder_apply(params["decoder"], zq, cfg)
        return idx, y

    def sync(idx, y):
        # NOTE: block_until_ready can return before execution completes on
        # the tunneled axon backend; fetching a dependent scalar to the host
        # is a reliable completion barrier.
        return float(y[0, 0, 0]) + float(idx[0, 0, 0])

    # warmup / compile (twice: second warms the scalar-slice programs)
    for _ in range(2):
        idx, y = transcode(params, x)
        sync(idx, y)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        idx, y = transcode(params, x)
        sync(idx, y)
    dt = (time.perf_counter() - t0) / iters

    audio_seconds = B * T / SR
    rtf = audio_seconds / dt
    print(json.dumps({
        "metric": "encode_decode_rtf",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
